"""crawl_3round_cuckoo cost attribution (round-4 handoff residual #3).

The official bench records the flagship 3-round crawl at ~31 s with the
opt-in cuckoo tier OFF and ~37 s with it ON (identical digests — the
tier is FN-free by construction). The tier exists for the 10^10-URL
frontier, where the exact anti-join's shuffle of the full seen set is
the scale bottleneck and an in-memory confirm tier pays for itself; at
bench scale (16k seen URLs) it is pure overhead. This tool names WHERE
that overhead lands so the wall gap is a disclosed, attributed cost
rather than an unexplained regression:

- each measurement runs in a FRESH subprocess (own JVM, tmpfs shuffle
  dirs — the isolation protocol of tools/crawl_ab.py);
- arm "off" = cuckoo_buckets None, arm "on" = 1<<12 (the bench config);
- arms are INTERLEAVED (off on off on ...) so slow host phases hit both;
- per-stage walls from the round pipeline's _StepTimer are aggregated
  across rounds — the cuckoo tier touches exactly two stages: the
  bookkeeping increment (`bk_cuckoo`, serialized table rebuild per key
  shard) and the admission-side probe (tables broadcast + vectorized
  lookup inside the seen filter, visible in `admission`/`fetch`);
- crawl_order/seen digests are asserted IDENTICAL across arms on every
  repeat (tier on/off may not change output).

Usage:
    python tools/cuckoo_ab.py                 # writes BENCH/cuckoo_ab.json
    python tools/cuckoo_ab.py --worker LABEL  # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPEATS = int(os.environ.get("CUCKOO_AB_REPEATS", 3))
CORES = int(os.environ.get("CUCKOO_AB_CORES", 32))


def worker(label: str) -> None:
    """One bench-scale flagship crawl (2000 seeds, 3 expanding rounds —
    identical to bench.py run_crawl) in a fresh session; prints one JSON
    line with the wall, per-stage walls summed across rounds, and the
    output digests."""
    sys.path.insert(0, os.getcwd())
    from swmaestro_crawler_spark.config import CrawlConfig, spark_builder
    from swmaestro_crawler_spark.plans.crawl import Crawl
    from swmaestro_crawler_spark.sources.synth_web import make_seeds

    shm = tempfile.mkdtemp(prefix=f"cuckooab-{label}-", dir="/dev/shm")
    os.environ["SPARK_LOCAL_DIRS"] = os.path.join(shm, "local")
    spark = (
        spark_builder(
            f"cuckoo-ab-{label}", master=f"local[{CORES}]", shuffle_partitions=32
        )
        .config("spark.local.dir", os.path.join(shm, "local"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        round_seconds=120.0,
        max_rounds=3,
        max_depth=4,
        per_host_cap=2000,
        frontier_partitions=32,
        seen_buckets=64,
        bloom_bits=1 << 24,
        synth_n_hosts=500,
        warehouse=os.path.join(shm, "wh"),
        cuckoo_buckets=(1 << 12) if label == "on" else None,
    )
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
                "processed": sum(
                    r.admitted + r.excluded + r.deferred for r in results
                ),
                "digests": {
                    t: crawl.cat.logical_digest(t) for t in ("crawl_order", "seen")
                },
                "stages": stages,
            }
        ),
        flush=True,
    )
    spark.stop()
    import shutil

    shutil.rmtree(shm, ignore_errors=True)


def _run(label: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", label],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    line = next(
        (ln for ln in p.stdout.splitlines() if ln.startswith("WORKER_RESULT ")), None
    )
    if line is None:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise SystemExit(f"worker {label} failed")
    return json.loads(line[len("WORKER_RESULT "):])


def main() -> None:
    runs: dict[str, list[dict]] = {"off": [], "on": []}
    for i in range(REPEATS):
        for label in ("off", "on"):
            print(f"== cuckoo {label} run {i + 1}/{REPEATS} ==", flush=True)
            r = _run(label)
            print(json.dumps(r), flush=True)
            runs[label].append(r)
    digests = {json.dumps(r["digests"], sort_keys=True) for v in runs.values() for r in v}
    assert len(digests) == 1, f"cuckoo tier changed crawl output: {digests}"
    best = {k: min(v, key=lambda r: r["wall_s"]) for k, v in runs.items()}
    stage_keys = sorted(set(best["off"]["stages"]) | set(best["on"]["stages"]))
    stages = {
        k: {
            "off_s": best["off"]["stages"].get(k),
            "on_s": best["on"]["stages"].get(k),
            "delta_s": round(
                (best["on"]["stages"].get(k) or 0.0)
                - (best["off"]["stages"].get(k) or 0.0),
                3,
            ),
        }
        for k in stage_keys
    }
    out = {
        "cores": CORES,
        "repeats": REPEATS,
        "off_wall_s": best["off"]["wall_s"],
        "on_wall_s": best["on"]["wall_s"],
        "delta_s": round(best["on"]["wall_s"] - best["off"]["wall_s"], 3),
        "all_walls": {k: [r["wall_s"] for r in v] for k, v in runs.items()},
        "digests_match": True,
        "fetched_ok": best["off"]["fetched_ok"],
        "stages": stages,
        "top_deltas": sorted(
            ((k, v["delta_s"]) for k, v in stages.items()),
            key=lambda kv: -abs(kv[1]),
        )[:6],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cuckoo_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
