from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.seen import (
    _probe,
    bloom_add,
    build_bloom_distributed,
    empty_bloom,
    filter_unseen,
)

BITS = 1 << 18
K = 5


def test_no_false_negatives_and_sane_fp_rate():
    rng = np.random.default_rng(7)
    present = rng.integers(-(1 << 62), 1 << 62, size=5000, dtype=np.int64)
    absent = rng.integers(-(1 << 62), 1 << 62, size=5000, dtype=np.int64)
    bm = bloom_add(empty_bloom(BITS), present, K)
    assert _probe(bm, present, K).all()  # zero false negatives
    fp = _probe(bm, absent, K).mean()
    assert fp < 0.02, fp  # m/n ≈ 52 bits/key, k=5 -> fp ≈ 1e-4


def test_distributed_build_matches_driver_add(spark):
    vals = list(range(-500, 500))
    df = spark.createDataFrame([(v,) for v in vals], "url_hash long").repartition(7)
    bm_dist = build_bloom_distributed(df, BITS, K)
    bm_drv = bloom_add(empty_bloom(BITS), np.array(vals, dtype=np.int64), K)
    assert (bm_dist == bm_drv).all()


def test_filter_unseen_equals_plain_antijoin(spark):
    frontier = spark.range(0, 1000).select(F.col("id").alias("url_hash"))
    seen_vals = np.arange(0, 1000, 3, dtype=np.int64)
    seen = spark.createDataFrame([(int(v),) for v in seen_vals], "url_hash long")
    bm = bloom_add(empty_bloom(BITS), seen_vals, K)
    bc = spark.sparkContext.broadcast(bm.tobytes())
    got = {r.url_hash for r in filter_unseen(frontier, seen, bc, K).collect()}
    want = {i for i in range(1000) if i % 3 != 0}
    assert got == want
