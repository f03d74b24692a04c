"""crawl_3round regression attribution (VERDICT r3 item 3).

BENCH_r02 recorded the flagship 3-round crawl at 30.66 s best-of; the
round-3 bench recorded 40.3 s and the round-4 refresh 76.4 s — but both
later numbers were measured in the SAME Spark session after the full
query suite (44 → 79 queries), which round 3 proved degrades
position-dependently. This tool settles how much of the regression is
real code cost vs. bench-session contamination:

- each measurement runs in a FRESH subprocess (own JVM, tmpfs shuffle
  dirs — the same isolation protocol as tools/bench_scaling.py);
- arm A = HEAD, arm B = the round-2 commit checked out into a git
  worktree (read-only; the worktree is created/removed by this tool);
- arms are INTERLEAVED (A B A B ...) so slow host phases hit both;
- per-stage walls from the round pipeline's _StepTimer are aggregated
  across rounds, giving a stage-level attribution table.

Usage:
    python tools/crawl_ab.py                 # full A/B, writes BENCH/crawl_ab.json
    python tools/crawl_ab.py --worker LABEL  # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2_COMMIT = os.environ.get("CRAWL_AB_BASE", "58d141f")
REPEATS = int(os.environ.get("CRAWL_AB_REPEATS", 3))
CORES = int(os.environ.get("CRAWL_AB_CORES", 32))


def worker(label: str) -> None:
    """One bench-scale flagship crawl (2000 seeds, 3 expanding rounds —
    identical to bench.py run_crawl) in a fresh session; prints one JSON
    line with the wall and per-stage walls summed across rounds."""
    sys.path.insert(0, os.getcwd())
    import dataclasses

    from swmaestro_crawler_spark.config import CrawlConfig, spark_builder
    from swmaestro_crawler_spark.plans.crawl import Crawl
    from swmaestro_crawler_spark.sources.synth_web import make_seeds

    shm = tempfile.mkdtemp(prefix=f"crawlab-{label}-", dir="/dev/shm")
    os.environ["SPARK_LOCAL_DIRS"] = os.path.join(shm, "local")
    spark = (
        spark_builder(f"crawl-ab-{label}", master=f"local[{CORES}]", shuffle_partitions=32)
        .config("spark.local.dir", os.path.join(shm, "local"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    want = dict(
        round_seconds=120.0,
        max_rounds=3,
        max_depth=4,
        per_host_cap=2000,
        frontier_partitions=32,
        seen_buckets=64,
        bloom_bits=1 << 24,
        synth_n_hosts=500,
        warehouse=os.path.join(shm, "wh"),
    )
    fields = {f.name for f in dataclasses.fields(CrawlConfig)}
    cfg = CrawlConfig(**{k: v for k, v in want.items() if k in fields})
    crawl = Crawl(spark, cfg)
    t0 = time.perf_counter()
    results = crawl.run(spark.createDataFrame(make_seeds(cfg, 2000)), rounds=3)
    wall = time.perf_counter() - t0
    stages: dict[str, float] = {}
    for r in results:
        for k, v in (r.timings or {}).items():
            stages[k] = round(stages.get(k, 0.0) + v, 3)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "label": label,
                "wall_s": round(wall, 3),
                "fetched_ok": sum(r.fetched_ok for r in results),
                "processed": sum(r.admitted + r.excluded + r.deferred for r in results),
                "stages": stages,
            }
        ),
        flush=True,
    )
    spark.stop()
    import shutil

    shutil.rmtree(shm, ignore_errors=True)


def _run(cwd: str, label: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", label],
        capture_output=True,
        text=True,
        cwd=cwd,
    )
    line = next((ln for ln in p.stdout.splitlines() if ln.startswith("WORKER_RESULT ")), None)
    if line is None:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise SystemExit(f"worker {label} failed")
    return json.loads(line[len("WORKER_RESULT "):])


def main() -> None:
    wt = tempfile.mkdtemp(prefix="crawl-ab-r2-")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, R2_COMMIT],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        runs: dict[str, list[dict]] = {"head": [], "r2": []}
        for i in range(REPEATS):
            for label, cwd in (("head", REPO), ("r2", wt)):
                print(f"== {label} run {i + 1}/{REPEATS} ==", flush=True)
                r = _run(cwd, label)
                print(json.dumps(r), flush=True)
                runs[label].append(r)
        best = {k: min(v, key=lambda r: r["wall_s"]) for k, v in runs.items()}
        stage_keys = sorted(set(best["head"]["stages"]) | set(best["r2"]["stages"]))
        out = {
            "base_commit": R2_COMMIT,
            "cores": CORES,
            "repeats": REPEATS,
            "head_wall_s": best["head"]["wall_s"],
            "r2_wall_s": best["r2"]["wall_s"],
            "ratio": round(best["head"]["wall_s"] / best["r2"]["wall_s"], 3),
            "all_walls": {k: [r["wall_s"] for r in v] for k, v in runs.items()},
            "head_fetched_ok": best["head"]["fetched_ok"],
            "r2_fetched_ok": best["r2"]["fetched_ok"],
            "stages": {
                k: {
                    "head_s": best["head"]["stages"].get(k),
                    "r2_s": best["r2"]["stages"].get(k),
                }
                for k in stage_keys
            },
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "crawl_ab.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO, capture_output=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
