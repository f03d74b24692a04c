"""Copy-on-write MERGE (catalog.Catalog.merge): matched keys replace,
unmatched insert, and — the 100-TB property — only data files whose
manifest key stats intersect the delta are rewritten; every other file
carries over into the new snapshot BY NAME. Old snapshots stay readable
(time travel)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

SCHEMA = StructType(
    [StructField("k", LongType()), StructField("v", StringType())]
)


def _base(spark, cat, n=1000, files=10):
    df = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    # range partitioning => per-file key stats are tight, disjoint bands
    cat.append("t", df.repartitionByRange(files, "k"), stat_cols=["k"])
    return df


def test_merge_rewrites_only_touched_files(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="merge_cow_"))
    _base(spark, cat)
    before_files = set(cat.data_files("t"))

    # delta confined to keys [0, 49] — one range band
    upd = spark.range(50).select(
        F.col("id").alias("k"), F.lit("UPDATED").alias("v")
    )
    sid = cat.merge("t", SCHEMA, upd, key="k", stat_cols=["k"])
    meta = cat.snapshot_meta("t", sid)
    assert meta["op"] == "merge"
    assert meta["files_rewritten"] < meta["files_rewritten"] + meta["files_kept"]
    assert meta["files_rewritten"] <= 2  # narrow delta -> ~one band
    assert meta["files_kept"] >= 8
    # kept files carried over BY NAME (zero bytes rewritten)
    after_files = set(cat.data_files("t"))
    assert len(before_files & after_files) == meta["files_kept"]

    got = {r.k: r.v for r in cat.read("t", SCHEMA).collect()}
    assert len(got) == 1000
    assert all(got[k] == "UPDATED" for k in range(50))
    assert all(got[k] == f"v{k}" for k in range(50, 1000))


def test_merge_inserts_unmatched_and_time_travels(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="merge_ins_"))
    _base(spark, cat, n=100, files=4)
    pre_sid = cat.current_snapshot("t")
    pre_digest = cat.content_digest("t", pre_sid)

    upd = spark.createDataFrame(
        [(10, "UPDATED"), (2000, "INSERTED")], schema=SCHEMA
    )
    cat.merge("t", SCHEMA, upd, key="k", stat_cols=["k"])
    got = {r.k: r.v for r in cat.read("t", SCHEMA).collect()}
    assert len(got) == 101
    assert got[10] == "UPDATED" and got[2000] == "INSERTED"
    # the pre-merge snapshot is untouched (COW, not in-place)
    assert cat.content_digest("t", pre_sid) == pre_digest


def test_merge_rejects_duplicate_update_keys(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="merge_dup_"))
    _base(spark, cat, n=10, files=1)
    upd = spark.createDataFrame([(1, "a"), (1, "b")], schema=SCHEMA)
    with pytest.raises(ValueError, match="unique"):
        cat.merge("t", SCHEMA, upd, key="k")


def test_merge_into_empty_table_is_insert_only(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="merge_empty_"))
    cat._commit_manifest(
        "t", {"snapshots": [{"id": 0, "files": [], "meta": {}}], "current": 0}
    )
    upd = spark.createDataFrame([(1, "a"), (2, "b")], schema=SCHEMA)
    sid = cat.merge("t", SCHEMA, upd, key="k", stat_cols=["k"])
    assert cat.snapshot_meta("t", sid)["files_rewritten"] == 0
    assert cat.read("t", SCHEMA).count() == 2


def test_merge_wide_delta_falls_back_to_range_overlap(spark):
    """Above key_probe_limit the driver never collects keys; pruning
    degrades to interval overlap but results stay identical."""
    cat = Catalog(spark, tempfile.mkdtemp(prefix="merge_wide_"))
    _base(spark, cat, n=200, files=4)
    upd = spark.range(0, 200, 2).select(
        F.col("id").alias("k"), F.lit("U").alias("v")
    )
    cat.merge("t", SCHEMA, upd, key="k", stat_cols=["k"], key_probe_limit=10)
    got = {r.k: r.v for r in cat.read("t", SCHEMA).collect()}
    assert len(got) == 200
    assert all(got[k] == ("U" if k % 2 == 0 else f"v{k}") for k in range(200))
