"""Bucketed co-located join: two tables bucketed on the same key with
the same bucket count must join with NO Exchange on either side, and the
result must equal the plain shuffled join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    from swmaestro_crawler_spark.operators.bucketed import (
        colocated_join,
        write_bucketed,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    left = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    right = ev.groupBy("user_id").agg(F.sum("value").alias("total_value"))
    write_bucketed(left, "bkt_left", "user_id", buckets=4)
    write_bucketed(right, "bkt_right", "user_id", buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the co-location (not a broadcast) is what
        # eliminates the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "bkt_left", "bkt_right", "user_id")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        expect = {
            (r.user_id, r.n_events, float(r.total_value))
            for r in left.join(right, "user_id").collect()
        }
        got = {
            (r.user_id, r.n_events, float(r.total_value))
            for r in joined.collect()
        }
        assert got == expect and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
