"""Regression for the ADVICE r1 catalog finding: reading a zero-copy
prop table (column_map + row_filter) must return the DECLARED schema —
names, types, and column order — not whatever parquet inference gives,
and casts must not be attempted across nullability-only differences
(Spark refuses nullable->non-null casts on nested types)."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.catalog import Catalog
from swmaestro_crawler_spark.schema import SPANS_DOC


def test_spans_prop_table_read_matches_declared_schema(spark, tmp_path, cfg):
    from swmaestro_crawler_spark.plans.crawl import Crawl
    from swmaestro_crawler_spark.sources.synth_web import make_seeds

    crawl = Crawl(spark, cfg)
    crawl.run(spark.createDataFrame(make_seeds(cfg, 20)), rounds=1)
    df = crawl.cat.read("spans", SPANS_DOC)
    assert [f.name for f in df.schema.fields] == [f.name for f in SPANS_DOC.fields]
    for got, want in zip(df.schema.fields, SPANS_DOC.fields):
        assert got.dataType.simpleString() == want.dataType.simpleString(), got.name
    # row_filter applied: every row is a fetched-ok document
    assert df.count() > 0
    assert df.filter(F.col("doc_id").isNull()).count() == 0


def test_prop_table_type_cast_applied(spark, tmp_path):
    """A declared type that differs from the stored one (beyond
    nullability) is enforced by an explicit cast on read."""
    from pyspark.sql.types import LongType, StructField, StructType

    cat = Catalog(spark, str(tmp_path / "wh"))
    src = spark.range(5).select(
        F.col("id").cast("int").alias("k"), F.lit(True).alias("keep")
    )
    sid = cat.append("src", src)
    cat.append_files("dst", "src", sid, column_map={"key": "k"}, row_filter="keep")
    declared = StructType(
        [StructField("key", LongType(), True)]  # stored as int -> cast to long
    )
    out = cat.read("dst", declared)
    assert out.schema.fields[0].dataType.simpleString() == "bigint"
    assert sorted(r.key for r in out.collect()) == [0, 1, 2, 3, 4]
