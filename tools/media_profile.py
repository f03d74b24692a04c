"""Throwaway profiler: run media_sweep on a prebuilt frontier-scale
warehouse at a given core count, printing per-stage walls.

Usage:
  python tools/media_profile.py build <wh_dir>          # crawl 1M URLs
  python tools/media_profile.py sweep <wh_dir> <cores>  # sweep a COPY
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    mode, wh = sys.argv[1], sys.argv[2]
    os.environ.setdefault("SCALING_URLS", "1000000")
    import bench_scaling as bs

    from swmaestro_crawler_spark.config import CrawlConfig, spark_builder
    from swmaestro_crawler_spark.plans.crawl import Crawl

    if mode == "build":
        cores = 8
        spark = spark_builder(
            "media-build", master=f"local[{cores}]", shuffle_partitions=32
        ).getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        cfg = CrawlConfig(
            round_seconds=1e6,
            per_host_cap=10_000_000,
            max_rounds=1,
            max_depth=1,
            frontier_partitions=32,
            seen_buckets=64,
            bloom_bits=1 << 26,
            synth_n_hosts=bs.N_HOSTS,
            synth_work_iters=bs.WORK_ITERS,
            warehouse=wh,
        )
        crawl = Crawl(spark, cfg)
        crawl.bootstrap(frontier=bs.synth_frontier(spark, bs.N_URLS, bs.N_HOSTS, 32))
        t0 = time.perf_counter()
        list(crawl.run(None, rounds=1))
        print(f"BUILD done in {time.perf_counter() - t0:.1f}s -> {wh}")
        return

    cores = int(sys.argv[3])
    scratch = f"/dev/shm/media-prof-{cores}"
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(wh, scratch)
    spark = spark_builder(
        f"media-sweep-{cores}", master=f"local[{cores}]", shuffle_partitions=32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from swmaestro_crawler_spark.catalog import Catalog
    from swmaestro_crawler_spark.plans.media import media_sweep

    warm = f"/dev/shm/media-prof-warm-{cores}"
    shutil.rmtree(warm, ignore_errors=True)
    shutil.copytree(wh, warm)
    media_sweep(spark, Catalog(spark, warm))  # JIT/worker warmup
    shutil.rmtree(warm, ignore_errors=True)

    cat = Catalog(spark, scratch)
    t0 = time.perf_counter()
    res = media_sweep(spark, cat)
    wall = time.perf_counter() - t0
    print(
        "SWEEP",
        json.dumps(
            {
                "cores": cores,
                "wall_s": round(wall, 3),
                "refs_new": res.refs_new,
                "blobs_new": res.blobs_new,
                "timings": res.timings,
            }
        ),
    )
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
