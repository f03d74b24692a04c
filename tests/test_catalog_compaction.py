"""Compaction (rewrite_data_files analogue) + manifest min/max file
skipping: small files fold into few, content is preserved, time travel
still works, and a range read opens only the files that can match."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

SCHEMA = StructType([StructField("id", LongType(), True)])


def test_compact_folds_files_and_preserves_content(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    for i in range(6):  # six appends -> six one-file snapshots
        cat.append("t", spark.range(i * 10, i * 10 + 10).coalesce(1))
    pre_snap = cat.current_snapshot("t")
    assert len(cat.data_files("t")) == 6

    sid = cat.compact("t", SCHEMA, target_file_rows=30, stat_cols=["id"])
    assert sid == pre_snap + 1
    assert len(cat.data_files("t")) == 2  # ceil(60/30)
    assert cat.snapshot_meta("t", sid)["op"] == "compact"
    assert cat.row_count("t") == 60
    # logical content identical (compaction may reorder rows across files)
    ids = sorted(r.id for r in cat.read("t", SCHEMA).collect())
    assert ids == list(range(60))
    # time travel to the pre-compaction snapshot still reads all 6 files
    assert len(cat.data_files("t", pre_snap)) == 6
    assert cat.read("t", SCHEMA, snapshot=pre_snap).count() == 60

    # already packed -> no-op, no new snapshot
    assert cat.compact("t", SCHEMA, target_file_rows=30) is None
    assert cat.current_snapshot("t") == sid


def test_file_stats_prune_range_reads(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    # four time-ordered appends: ids [0,25) [25,50) [50,75) [75,100)
    for i in range(4):
        cat.append(
            "log", spark.range(i * 25, i * 25 + 25).coalesce(1), stat_cols=["id"]
        )
    assert len(cat.data_files("log")) == 4

    # a recency-horizon read over the last quartile opens ONE file
    pruned = cat.prune_files("log", "id", lo=80)
    assert len(pruned) == 1
    df = cat.read_range("log", SCHEMA, "id", lo=80)
    assert sorted(r.id for r in df.collect()) == list(range(80, 100))
    assert len(df.inputFiles()) == 1

    # interior band intersects two files; residual filter still row-exact
    assert len(cat.prune_files("log", "id", lo=20, hi=30)) == 2
    band = cat.read_range("log", SCHEMA, "id", lo=20, hi=30)
    assert sorted(r.id for r in band.collect()) == list(range(20, 31))

    # a file appended WITHOUT stats is never pruned (safe inclusion)
    cat.append("log", spark.range(1000, 1010).coalesce(1))
    assert len(cat.prune_files("log", "id", hi=5)) == 2  # file 0 + statless


def test_clustered_compact_restores_file_skipping(spark, tmp_path):
    """An append log whose every file spans the whole key range prunes
    NOTHING; compact(cluster_by=...) range-sorts the rewrite so each
    output file owns a disjoint band and the same range read opens one
    file."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    # 4 appends, each a full-range stripe (id % 4 == i): every file's
    # [min,max] covers ~[0,100) so stats can prove nothing disjoint
    full = spark.range(100)
    for i in range(4):
        cat.append(
            "log",
            full.filter(F.col("id") % 4 == i).coalesce(1),
            stat_cols=["id"],
        )
    assert len(cat.prune_files("log", "id", lo=80)) == 4  # nothing prunable

    sid = cat.compact("log", SCHEMA, target_file_rows=25, cluster_by="id")
    assert sid is not None
    assert cat.snapshot_meta("log", sid)["cluster_by"] == "id"
    assert len(cat.data_files("log")) == 4  # ceil(100/25)
    # after sort-clustering the same range read opens ONE file
    assert len(cat.prune_files("log", "id", lo=80)) == 1
    df = cat.read_range("log", SCHEMA, "id", lo=80)
    assert sorted(r.id for r in df.collect()) == list(range(80, 100))
    assert len(df.inputFiles()) == 1
    # content preserved
    assert sorted(r.id for r in cat.read("log", SCHEMA).collect()) == list(range(100))


def test_clustered_compact_runs_even_when_packed(spark, tmp_path):
    """cluster_by compacts for ORDER, not count: a single unsorted file
    is still rewritten (the count-only path would no-op)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    import random

    ids = list(range(50))
    random.Random(7).shuffle(ids)
    cat.append(
        "t",
        spark.createDataFrame([(i,) for i in ids], SCHEMA).coalesce(1),
        stat_cols=["id"],
    )
    assert cat.compact("t", SCHEMA, target_file_rows=25) is None  # packed
    sid = cat.compact("t", SCHEMA, target_file_rows=25, cluster_by="id")
    assert sid is not None and len(cat.data_files("t")) == 2
    assert len(cat.prune_files("t", "id", hi=10)) == 1
