"""Copy-on-write DELETE (catalog.Catalog.delete_where): rows matching
the condition are removed with ANSI semantics (NULL condition keeps the
row), and — the 100-TB property — only data files whose manifest stats
or bloom CANNOT rule the predicate's key values out are rewritten; every
other file carries into the new snapshot BY NAME. Old snapshots stay
readable (time travel); a racing commit raises CommitConflict."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog, CommitConflict

SCHEMA = StructType(
    [StructField("k", LongType()), StructField("v", StringType())]
)


def _base(spark, cat, n=1000, files=10, bloom=False):
    df = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    cat.append(
        "t",
        df.repartitionByRange(files, "k"),
        stat_cols=["k"],
        bloom_cols=["k"] if bloom else None,
    )
    return df


def test_delete_rewrites_only_touched_files(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="del_cow_"))
    _base(spark, cat)
    before = set(cat.data_files("t"))

    sid = cat.delete_where(
        "t", SCHEMA, "k < 50", key="k", key_values=list(range(50)), stat_cols=["k"]
    )
    meta = cat.snapshot_meta("t", sid)
    assert meta["op"] == "delete"
    assert meta["rows_deleted"] == 50
    assert meta["files_kept"] >= 8  # range bands not straddling [0, 49]
    assert meta["files_rewritten"] <= 2
    after = set(cat.data_files("t"))
    # untouched files carried by NAME — present in both snapshots
    assert len(before & after) == meta["files_kept"]

    got = cat.read("t", SCHEMA)
    assert got.count() == 950
    assert got.filter("k < 50").count() == 0
    # time travel: the pre-delete snapshot still has every row
    assert cat.read("t", SCHEMA, snapshot=sid - 1).count() == 1000


def test_delete_bloom_prunes_point_deletes(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="del_bloom_"))
    # 4 hash-interleaved appends: min/max useless, bloom must prune
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    for i in range(4):
        cat.append("t", df.filter(F.col("k") % 4 == i), bloom_cols=["k"])
    # keys all ≡ 1 (mod 4) → only that append's file may contain them
    sid = cat.delete_where(
        "t", SCHEMA, "k IN (1, 5, 9)", key="k", key_values=[1, 5, 9]
    )
    meta = cat.snapshot_meta("t", sid)
    assert meta["rows_deleted"] == 3
    assert meta["files_kept"] >= 3
    assert cat.read("t", SCHEMA).count() == 997


def test_delete_null_condition_keeps_row(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="del_null_"))
    rows = [(1, "a"), (2, None), (3, "b")]
    cat.append("t", spark.createDataFrame(rows, SCHEMA))
    cat.delete_where("t", SCHEMA, "v = 'a'")  # NULL = 'a' is NULL → keep
    got = sorted((r.k, r.v) for r in cat.read("t", SCHEMA).collect())
    assert got == [(2, None), (3, "b")]


def test_delete_no_touched_files_commits_noop_snapshot(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="del_noop_"))
    _base(spark, cat)
    sid = cat.delete_where(
        "t", SCHEMA, "k = 5000", key="k", key_values=[5000], stat_cols=["k"]
    )
    meta = cat.snapshot_meta("t", sid)
    assert meta["rows_deleted"] == 0 and meta["files_rewritten"] == 0
    assert cat.read("t", SCHEMA).count() == 1000


def test_delete_conflict_raises(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="del_conflict_"))
    _base(spark, cat, n=100, files=2)

    orig = cat._write_files
    fired = {"done": False}

    def hijack(table, d):
        if not fired["done"]:
            fired["done"] = True
            cat._write_files = orig
            cat.append(
                "t",
                spark.range(1000, 1010).select(
                    F.col("id").alias("k"), F.col("id").cast("string").alias("v")
                ),
            )
        return orig(table, d)

    cat._write_files = hijack
    with pytest.raises(CommitConflict):
        cat.delete_where("t", SCHEMA, "k < 10")
    # interleaved append intact; the failed delete published nothing
    assert cat.read("t", SCHEMA).count() == 110
    assert cat.snapshot_meta("t", cat.current_snapshot("t")).get("op") != "delete"


def test_delete_matches_filter_logical_digest(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="del_digest_"))
    df = _base(spark, cat)
    cat.delete_where(
        "t", SCHEMA, "k % 7 = 3", key="k", stat_cols=["k"]
    )  # no key_values → full rewrite, still correct
    got = cat.read("t", SCHEMA)
    want = df.filter("k % 7 <> 3")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
