"""AQE skew-join: the engine's standing defense for hot keys it did NOT
pre-salt. The crawl pre-salts the known-skewed axis (host buckets,
operators/fetch.py C2); for ad-hoc joins over crawl output the skew is
data-dependent, and the engine relies on AQE's runtime re-plan to split
oversized partitions. This test proves that defense actually engages:
a hot key whose partition dwarfs the advisory size must show
``skew=true`` in the final adaptive plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # left: 200k rows on ONE hot key + uniform tail; right: all keys once
        left = spark.range(200_000).select(
            F.when(F.col("id") < 150_000, F.lit(0))
            .otherwise(F.col("id") % 512)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(512).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = left.join(right, "k")
        # execute THIS DataFrame's queryExecution so the adaptive plan
        # is finalized (count() would plan/execute a different query)
        assert len(joined.collect()) == 200_000
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
