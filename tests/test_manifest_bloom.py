"""Manifest per-file blooms: zero false negatives, strong point-lookup
file pruning on a hash-interleaved log that min/max stats cannot prune,
graceful stats+bloom interplay, and the integer-column guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("payload", LongType(), False),
    ]
)

N = 4000
FILES_PER_APPEND = 2
APPENDS = 4


def _build(spark, tmp_path) -> Catalog:
    cat = Catalog(spark, str(tmp_path / "wh"))
    # keys are even numbers 0..2N interleaved across appends by residue:
    # every file's [min, max] spans nearly the whole key range
    df = spark.range(N).select(
        (F.col("id") * 2).alias("k"), F.col("id").alias("payload")
    )
    for i in range(APPENDS):
        cat.append(
            "t",
            df.filter(F.col("id" if False else "payload") % APPENDS == i)
            .repartition(FILES_PER_APPEND),
            stat_cols=["k"],
            bloom_cols=["k"],
        )
    return cat


def test_no_false_negatives_and_pruning(spark, tmp_path):
    cat = _build(spark, tmp_path)
    total = len(cat.data_files("t"))
    assert total == APPENDS * FILES_PER_APPEND

    probed = []
    for j, k in enumerate(range(0, 2 * N, 2 * N // 50)):  # 50 present keys
        files = cat.prune_files_point("t", "k", k)
        assert files, f"false negative for {k}"
        if j % 10 == 0:  # full Spark read for a sample; pruning for all
            rows = cat.read_point("t", SCHEMA, "k", k).collect()
            assert [r.k for r in rows] == [k]
            assert rows[0].payload == k // 2
        probed.append(len(files))
    # each key lives in exactly one file; blooms should pin ~1 on average
    assert sum(probed) / len(probed) < 2.0, probed


def test_missing_keys_prune_everything(spark, tmp_path):
    cat = _build(spark, tmp_path)
    matched = 0
    misses = list(range(1, 200, 4))  # odd keys never written
    for j, k in enumerate(misses):
        matched += len(cat.prune_files_point("t", "k", k))
        if j % 10 == 0:
            assert cat.read_point("t", SCHEMA, "k", k).count() == 0
    # ~0.8% fp rate per file -> nearly all misses open ZERO files
    assert matched / len(misses) < 0.5, matched


def test_stats_and_bloom_compose(spark, tmp_path):
    cat = _build(spark, tmp_path)
    # outside the recorded [min, max]: stats alone kill every file
    assert cat.prune_files_point("t", "k", 10 * N) == []
    # files without blooms are conservatively kept
    cat.append("t", spark.range(1).select(F.lit(2 * N + 100).alias("k"),
                                          F.lit(0).alias("payload")))
    files = cat.prune_files_point("t", "k", 2 * N + 100)
    assert len(files) >= 1
    assert cat.read_point("t", SCHEMA, "k", 2 * N + 100).count() == 1


def test_bloom_requires_integer_column(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(10).select(F.col("id").cast("string").alias("s"),
                                F.col("id").alias("payload"))
    with pytest.raises(TypeError, match="integer"):
        cat.append("t2", df, bloom_cols=["s"])
