"""END-TO-END spark-submit --py-files proof (BASELINE.json north rule:
"ships as spark-submit --py-files ... on a multi-executor cluster").

Runs the EXACT README recipe — ``spark-submit --master local[4]
--py-files dist/swmaestro_crawler_spark.zip jobs/crawl_job.py`` — from a
scratch working directory where the package is NOT importable from cwd,
so the only way the driver can import ``swmaestro_crawler_spark`` is the
shipped zip. Asserts the job prints its per-round JSON lines, the
warehouse holds the spans table, and a re-submit with the same
--warehouse resumes as a no-op replay (rounds already committed)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "swmaestro_crawler_spark.zip")
JOB = os.path.join(REPO, "jobs", "crawl_job.py")


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def _run(args: list[str], cwd: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    return subprocess.run(
        args, cwd=cwd, env=env, capture_output=True, text=True, timeout=420
    )


def _json_lines(stdout: str) -> list[dict]:
    out = []
    for ln in stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            try:
                out.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    return out


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_runs_and_resumes(tmp_path):
    wh = str(tmp_path / "wh")
    scratch = tmp_path / "scratch"  # cwd WITHOUT the repo on sys.path
    scratch.mkdir()
    cmd = [
        _spark_submit(),
        "--master",
        "local[4]",
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--py-files",
        ZIP,
        JOB,
        "--warehouse",
        wh,
        "--seeds",
        "40",
        "--rounds",
        "2",
        "--n-hosts",
        "10",
        "--frontier-partitions",
        "8",
        "--bloom-bits",
        str(1 << 18),
    ]
    first = _run(cmd, cwd=str(scratch))
    assert first.returncode == 0, first.stderr[-4000:]
    lines = _json_lines(first.stdout)
    summary = [l for l in lines if "rounds_run" in l]
    rounds = [l for l in lines if "round" in l and "fetched_ok" in l]
    assert summary and summary[-1]["rounds_run"] == 2
    assert len(rounds) == 2 and all(r["fetched_ok"] > 0 for r in rounds)
    # the shipped job wrote real catalog tables (spans is a zero-copy
    # manifest over fetched's data files, so it has a manifest only)
    assert os.path.isdir(os.path.join(wh, "crawl_order", "data"))
    assert os.path.isdir(os.path.join(wh, "fetched", "data"))

    def _current(table: str) -> int:
        with open(os.path.join(wh, table, "_snapshots.json")) as f:
            return json.load(f)["current"]

    assert _current("spans") > 0
    snap_after_first = _current("crawl_order")

    # resume: same warehouse, same rounds — already committed, so the
    # job must replay to a no-op (no new crawl_order snapshots).
    second = _run(cmd, cwd=str(scratch))
    assert second.returncode == 0, second.stderr[-4000:]
    assert _current("crawl_order") == snap_after_first
