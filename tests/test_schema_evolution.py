"""Schema evolution over the append log: a column added later must read
back as NULL for pre-evolution files (Iceberg add-column semantics), a
dropped column disappears from projection without touching old files,
and stats recorded on the new column prune only post-evolution files
(older files carry no stats for it -> conservatively kept)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

V1 = StructType(
    [
        StructField("k", LongType(), False),
        StructField("a", StringType(), True),
    ]
)
V2 = StructType(
    [
        StructField("k", LongType(), False),
        StructField("a", StringType(), True),
        StructField("b", LongType(), True),  # added column
    ]
)


def test_added_column_reads_null_for_old_files(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", spark.range(5).select(
        F.col("id").alias("k"), F.lit("old").alias("a")))
    cat.append("t", spark.range(5, 10).select(
        F.col("id").alias("k"), F.lit("new").alias("a"),
        (F.col("id") * 7).alias("b")), stat_cols=["b"])

    rows = {r.k: r for r in cat.read("t", V2).collect()}
    assert len(rows) == 10
    assert all(rows[k].b is None for k in range(5))  # pre-evolution files
    assert all(rows[k].b == k * 7 for k in range(5, 10))

    # projecting the OLD schema still works over the mixed file set
    old = cat.read("t", V1)
    assert old.columns == ["k", "a"] and old.count() == 10

    # stats on the added column exist only for new files; pruning keeps
    # statless old files (may-match) and skips new files proven disjoint
    m = cat._load_manifest("t")
    with_stats = [f for f, s in m.get("file_stats", {}).items() if "b" in s]
    assert with_stats, "new files must carry stats for b"
    pruned = cat.prune_files("t", "b", lo=10_000, hi=20_000)
    names = {p.split("/")[-1] for p in pruned}
    assert all(f.split("/")[-1] not in names for f in with_stats)
    # old files (no stats for b) are conservatively retained
    assert len(pruned) == len(cat.data_files("t")) - len(with_stats)


def test_time_travel_predates_evolution(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    s0 = cat.append("t", spark.range(3).select(
        F.col("id").alias("k"), F.lit("x").alias("a")))
    cat.append("t", spark.range(3, 6).select(
        F.col("id").alias("k"), F.lit("y").alias("a"), F.col("id").alias("b")))
    # reading the old snapshot with the new schema: all-null added column
    df = cat.read("t", V2, snapshot=s0)
    assert df.count() == 3
    assert df.filter(F.col("b").isNotNull()).count() == 0
