"""Z-order locality as a contract query.

Buckets the events table by the Morton key of (user_id, event time):
the top 6 bits of the interleaved 32-bit z-value split the (user, time)
plane into 64 rectangles, and the per-bucket min/max of BOTH source
columns witness the locality that makes z-ordered files prunable on
either column (operators read the same aggregates the manifest would
record per file).  The bit math is the engine-shared expression from
``functions.zorder``; the bounds used for 16-bit normalization are
computed in-query and attached via a broadcast of the 1-row aggregate —
no single-partition exchange of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.zorder import zvalue_sql
from ..sources.testdata import load

Z_BUCKET_SHIFT = 26  # 32-bit z >> 26 -> 64 buckets


def _z_expr(intdiv: str) -> str:
    nx = f"(((user_id - mn_u) * 65535) {intdiv} greatest(mx_u - mn_u, 1))"
    ny = f"(((t_us - mn_t) * 65535) {intdiv} greatest(mx_t - mn_t, 1))"
    return zvalue_sql(nx, ny)


def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS t_us"
    )
    bounds = ev.agg(
        F.min("user_id").alias("mn_u"),
        F.max("user_id").alias("mx_u"),
        F.min("t_us").alias("mn_t"),
        F.max("t_us").alias("mx_t"),
    )
    z = ev.crossJoin(F.broadcast(bounds)).selectExpr(
        "user_id", "t_us", _z_expr("div") + " AS z"
    )
    return (
        z.selectExpr("user_id", "t_us", "z", f"(z >> {Z_BUCKET_SHIFT}) AS bucket")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("user_id").alias("u_min"),
            F.max("user_id").alias("u_max"),
            F.min("t_us").alias("t_min"),
            F.max("t_us").alias("t_max"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
    )


SQL_ZORDER_LOCALITY = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t_us FROM events),
b AS (
  SELECT min(user_id) AS mn_u, max(user_id) AS mx_u,
         min(t_us) AS mn_t, max(t_us) AS mx_t
  FROM ev),
z AS (
  SELECT user_id, t_us, {_z_expr("//")} AS z FROM ev CROSS JOIN b)
SELECT (z >> {Z_BUCKET_SHIFT}) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(user_id) AS u_min, max(user_id) AS u_max,
       min(t_us) AS t_min, max(t_us) AS t_max,
       min(z) AS z_min, max(z) AS z_max
FROM z GROUP BY 1
"""


QUERIES = {
    "zorder_locality": (q_zorder_locality, SQL_ZORDER_LOCALITY),
}
