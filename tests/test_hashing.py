"""Pure-Python hashes must match Spark's codegen'd natives bit-for-bit —
this is what lets the per-row oracle compare against the JVM hot path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from swmaestro_crawler_spark.functions.hashing import (
    bloom_positions_np,
    bloom_positions_py,
    murmur3_32_str,
    xxhash64_str,
)

CASES = [
    "",
    "a",
    "abc",
    "abcd",
    "abcdefgh",
    "http://host0001.example.com/p/deadbeef?x=1",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "w" * 100,
    "한글유니코드",
    "emoji🎉test",
]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(t,) for t in CASES], ["s"])
    for row in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert xxhash64_str(row.s) == row.h, row.s


def test_murmur3_matches_spark(spark):
    df = spark.createDataFrame([(t,) for t in CASES], ["s"])
    for row in df.select("s", F.hash("s").alias("h")).collect():
        assert murmur3_32_str(row.s) == row.h, row.s


def test_bloom_positions_py_np_agree():
    hs = np.array([xxhash64_str(c) for c in CASES], dtype=np.int64)
    got_np = bloom_positions_np(hs, 5, 1 << 18)
    for i, h in enumerate(hs):
        assert bloom_positions_py(int(h), 5, 1 << 18) == list(got_np[i])
