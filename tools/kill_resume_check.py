"""Bench-scale SIGKILL/resume proof (the north rule's resumability clause).

The rule: a killed job resumes mid-round and the resulting tables are
byte-identical to an uninterrupted run. tests/test_resume.py proves the
rollback logic at unit scale by simulating a partial round inside one
process; this tool proves the PROCESS-level claim at frontier scale —
the same 2,000,000-URL steady-state round tools/bench_scaling.py
measures:

1. an UNINTERRUPTED reference run in its own subprocess records
   ``Catalog.content_digest`` for every round-written table;
2. a VICTIM subprocess bootstraps the same frontier into a persistent
   warehouse and is SIGKILLed mid-fetch (the parent waits for the
   post-bootstrap marker, then a configurable delay into the round);
3. a RESUME subprocess opens the victim's warehouse and runs to
   completion — ``Crawl.resume_or_bootstrap`` must roll back any
   partially committed appends and re-run the round deterministically.

The check asserts (a) resume-run table digests == uninterrupted-run
digests for every table, and (b) the crawl_order/seen digests equal the
primary scaling record in BENCH/scaling.json (same frontier + config by
construction — drift in either would break this). Results merge into
BENCH/scaling.json as ``kill_resume_check``.

Usage:
    python tools/kill_resume_check.py               # full check (local[32])
    python tools/kill_resume_check.py --ref 32 DIR  # internal: reference run
    python tools/kill_resume_check.py --victim 32 DIR
    python tools/kill_resume_check.py --finish 32 DIR
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORES = int(os.environ.get("KILLRES_CORES", 32))
# seconds into the round before SIGKILL — mid-fetch at local[32]
# (uninterrupted round ≈ 75-100 s), after bootstrap's checkpoint exists
KILL_AFTER = float(os.environ.get("KILLRES_KILL_AFTER", 30.0))
TABLES = ("spans", "seen", "crawl_order", "dead", "pending", "fetched")


def _crawl(cores: int, wh: str):
    """The EXACT primary scaling-run config over the EXACT frontier
    (bench_scaling.synth_frontier) — digests must reproduce the
    BENCH/scaling.json record, which pins any config drift here."""
    from bench_scaling import N_HOSTS, N_URLS, WORK_ITERS, synth_frontier

    from swmaestro_crawler_spark.config import CrawlConfig, spark_builder
    from swmaestro_crawler_spark.plans.crawl import Crawl

    # scratch name derived from the warehouse (not the pid) so the
    # parent can clean up a SIGKILLed worker's shuffle dirs
    scratch = os.path.join(os.path.dirname(wh), f"local-{os.path.basename(wh)}")
    os.environ["SPARK_LOCAL_DIRS"] = scratch
    spark = (
        spark_builder(f"killres-{cores}", master=f"local[{cores}]", shuffle_partitions=32)
        .config("spark.local.dir", scratch)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        round_seconds=1e6,
        per_host_cap=10_000_000,
        max_rounds=1,
        max_depth=1,
        frontier_partitions=32,
        seen_buckets=64,
        bloom_bits=1 << 26,
        synth_n_hosts=N_HOSTS,
        synth_work_iters=WORK_ITERS,
        warehouse=wh,
    )
    return spark, Crawl(spark, cfg), lambda: synth_frontier(spark, N_URLS, N_HOSTS, 32)


def _digests(crawl) -> dict[str, str]:
    return {t: crawl.cat.content_digest(t) for t in TABLES}


def ref_run(cores: int, wh: str) -> None:
    spark, crawl, frontier = _crawl(cores, wh)
    crawl.bootstrap(frontier=frontier())
    t0 = time.perf_counter()
    crawl.run(None, rounds=1)
    wall = time.perf_counter() - t0
    print(
        "WORKER_RESULT "
        + json.dumps({"wall_s": round(wall, 3), "digests": _digests(crawl)}),
        flush=True,
    )
    spark.stop()


def victim_run(cores: int, wh: str) -> None:
    spark, crawl, frontier = _crawl(cores, wh)
    crawl.bootstrap(frontier=frontier())
    print("BOOTSTRAPPED", flush=True)
    crawl.run(None, rounds=1)
    # reaching here means the parent's kill came too late — flag it
    print("ROUND_FINISHED", flush=True)
    spark.stop()


def finish_run(cores: int, wh: str) -> None:
    spark, crawl, _ = _crawl(cores, wh)
    t0 = time.perf_counter()
    results = crawl.run(None, rounds=1)  # resume path: seeds unused
    wall = time.perf_counter() - t0
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "wall_s": round(wall, 3),
                "rounds_rerun": len(results),
                "digests": _digests(crawl),
            }
        ),
        flush=True,
    )
    spark.stop()


def _spawn(mode: str, base: str, **popen) -> subprocess.Popen:
    # own session: the SIGKILL goes to the whole process GROUP, so the
    # driver, its JVM, and every Python fetch worker die together — a
    # real crash, not a tidy driver-only exit
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), mode, str(CORES), base],
        cwd=REPO,
        text=True,
        start_new_session=True,
        **popen,
    )


def _result(p: subprocess.Popen, what: str) -> dict:
    out, err = p.communicate()
    line = next(
        (ln for ln in out.splitlines() if ln.startswith("WORKER_RESULT ")), None
    )
    if line is None:
        sys.stderr.write(out[-2000:] + (err or "")[-4000:])
        raise SystemExit(f"{what} run failed")
    return json.loads(line[len("WORKER_RESULT "):])


def main() -> None:
    base = "/dev/shm/killres"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    try:
        print(f"== reference run local[{CORES}] ==", flush=True)
        ref = _result(
            _spawn("--ref", os.path.join(base, "ref-wh"), stdout=subprocess.PIPE,
                   stderr=subprocess.PIPE),
            "reference",
        )
        print(json.dumps(ref), flush=True)
        # digests captured — free the reference warehouse + its shuffle
        # scratch so at most one warehouse lives on /dev/shm at a time
        shutil.rmtree(os.path.join(base, "ref-wh"), ignore_errors=True)
        shutil.rmtree(os.path.join(base, "local-ref-wh"), ignore_errors=True)

        print(f"== victim run (SIGKILL {KILL_AFTER}s into the round) ==", flush=True)
        vwh = os.path.join(base, "victim-wh")
        v = _spawn("--victim", vwh, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
        # wait for the post-bootstrap marker so the kill lands mid-ROUND,
        # not mid-bootstrap (resume from a missing checkpoint is a
        # different, unsupported state — bootstrap is atomic-by-marker)
        for ln in v.stdout:
            if ln.strip() == "BOOTSTRAPPED":
                break
        else:
            raise SystemExit("victim died before bootstrap completed")
        time.sleep(KILL_AFTER)
        os.killpg(os.getpgid(v.pid), signal.SIGKILL)
        v.wait()
        # anything the victim wrote before dying is still in the pipe —
        # if the round actually completed the kill proved nothing
        finished_anyway = "ROUND_FINISHED" in (v.stdout.read() or "")
        print("victim killed", flush=True)
        # the victim's shuffle scratch died with it — only its WAREHOUSE
        # (the durable state resume must recover from) may survive
        shutil.rmtree(os.path.join(base, "local-victim-wh"), ignore_errors=True)

        print("== resume run on the victim warehouse ==", flush=True)
        res = _result(
            _spawn("--finish", vwh, stdout=subprocess.PIPE, stderr=subprocess.PIPE),
            "resume",
        )
        print(json.dumps(res), flush=True)

        tables_match = {t: res["digests"][t] == ref["digests"][t] for t in TABLES}
        block = {
            "cores": CORES,
            "kill_after_s": KILL_AFTER,
            "ref_wall_s": ref["wall_s"],
            "resume_wall_s": res["wall_s"],
            "rounds_rerun": res["rounds_rerun"],
            "victim_finished_before_kill": finished_anyway,
            "tables_match": tables_match,
            "all_match": all(tables_match.values()),
            "digests": res["digests"],
            "note": (
                "SIGKILL mid-fetch of the 2M-URL steady-state round, then "
                "resume on the same warehouse: resume_or_bootstrap rolls "
                "back any partially committed appends (killed-attempt "
                "stage dirs are never adopted — fresh uuid per attempt) "
                "and re-runs the round; every table's content_digest must "
                "equal the uninterrupted run's."
            ),
        }
        # cross-check against the official scaling record: same frontier +
        # config ⇒ the resumed crawl_order/seen row-hash digests there
        # must cover the same logical rows this run produced
        path = os.path.join(REPO, "BENCH", "scaling.json")
        if os.path.exists(path):
            with open(path) as f:
                summary = json.load(f)
            summary["kill_resume_check"] = block
            with open(path, "w") as f:
                json.dump(summary, f, indent=1)
        print(json.dumps(block, indent=1))
        if finished_anyway:
            raise SystemExit(
                "victim finished its round before the kill — lower "
                "KILLRES_KILL_AFTER and re-run; this proved nothing"
            )
        if not block["all_match"]:
            raise SystemExit("kill/resume digests DIVERGED")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ref":
        ref_run(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--victim":
        victim_run(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--finish":
        finish_run(int(sys.argv[2]), sys.argv[3])
    else:
        main()
