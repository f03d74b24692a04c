"""Late/out-of-order data accounting: rows past the watermark must be
COUNTED into the audit face, never silently lost, and the engine's own
drop telemetry must agree with the reconstruction (the function raises
otherwise — exercised here through the public contract query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.streaming.stream_metrics import (
    stream_late_data_audit,
)

SF_DIR = "/root/testdata/sf0.001"


def test_late_rows_land_in_audit_face_and_balance(spark):
    out = stream_late_data_audit(spark, SF_DIR).persist()
    faces = {r.face for r in out.select("face").distinct().collect()}
    assert faces == {"on_time", "late_audit"}

    late = out.filter(F.col("face") == "late_audit")
    n_late = late.agg(F.sum("n_events")).first()[0]
    assert n_late and n_late > 0, "no late rows were audited"

    # conservation: on_time + late_audit + the never-emitted open-window
    # tail (windows whose end > final watermark) = every event exactly once
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    mx = ev.agg(F.max("ts")).first()[0]
    open_tail = ev.filter(
        (F.date_trunc("day", "ts") + F.expr("INTERVAL 1 DAY"))
        > F.lit(mx) - F.expr("INTERVAL 1 HOUR")
    ).filter(
        # open-tail rows that are NOT in the late split (late-split rows
        # are in the audit face regardless of their window)
        ~(
            (F.col("event_id") % 10 == 0)
            & (F.col("ts") <= F.lit(mx) - F.expr("INTERVAL 3 DAYS"))
        )
    )
    n_on_time = out.filter(F.col("face") == "on_time").agg(
        F.sum("n_events")
    ).first()[0]
    assert n_on_time + n_late + open_tail.count() == ev.count()

    # the audit face is exactly the reconstructable drop set, per (day, type)
    expect = (
        ev.filter(
            (F.col("event_id") % 10 == 0)
            & (F.col("ts") <= F.lit(mx) - F.expr("INTERVAL 3 DAYS"))
        )
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = late.select("day", "event_type", "n_events")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    out.unpersist()


def test_no_late_row_leaks_into_on_time(spark):
    """Every on_time (day, type) count equals the not-late subset's count
    for that closed window — a leaked late row would inflate it."""
    out = stream_late_data_audit(spark, SF_DIR)
    on_time = {
        (r.day, r.event_type): r.n_events
        for r in out.filter(F.col("face") == "on_time").collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    mx = ev.agg(F.max("ts")).first()[0]
    kept = (
        ev.filter(
            ~(
                (F.col("event_id") % 10 == 0)
                & (F.col("ts") <= F.lit(mx) - F.expr("INTERVAL 3 DAYS"))
            )
        )
        .filter(
            (F.date_trunc("day", "ts") + F.expr("INTERVAL 1 DAY"))
            <= F.lit(mx) - F.expr("INTERVAL 1 HOUR")
        )
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    expect = {(r.day, r.event_type): r.n_events for r in kept.collect()}
    assert on_time == expect
