"""Exactly-once streaming ingestion into the snapshot catalog.

Structured Streaming's ``foreachBatch`` delivers micro-batches
at-least-once: after a crash the last in-flight batch is REPLAYED with
the same ``batch_id``. Exactly-once therefore comes from an idempotent,
transactional sink — the recipe the Spark Structured Streaming guide
prescribes for foreachBatch — realized here over the engine's
atomic-manifest catalog (catalog.py): every commit records its
``batch_id`` in the snapshot meta, and a batch whose id is already
durable is skipped, so replays cannot double-append.

This is the streaming face of the crawl's commit discipline: the batch
engine gets byte-identical resume from the same atomic manifest commit
(plans/crawl.py C4); a streaming consumer of the same tables gets
exactly-once from it. The reference's analogue is RabbitMQ manual acks
after the DB commit (New_YouTube_Crawler.py:210,275 — at-least-once with
PostgreSQL dedup by primary key); here the dedup key is the micro-batch.

Scale: the sink adds no data-path work — the append IS the normal
distributed parquet write; the idempotency check reads only the JSON
manifest (O(snapshots), driver-side, no Spark job).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from .stream_metrics import EVENTS_SCHEMA


def last_committed_batch(cat: Catalog, table: str) -> int:
    """Largest ``batch_id`` recorded in any snapshot's meta, -1 if none.
    Replayed micro-batches compare against this high-water mark."""
    best = -1
    m = cat._load_manifest(table)
    for s in m["snapshots"]:
        b = s["meta"].get("batch_id")
        if b is not None:
            best = max(best, int(b))
    return best


def catalog_batch_sink(cat: Catalog, table: str):
    """foreachBatch function: append the micro-batch as a catalog
    snapshot carrying its batch_id; skip batches at or below the
    high-water mark (crash replays, checkpoint resets)."""

    def write(df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(cat, table):
            return  # already durable — idempotent replay
        cat.append(table, df, meta={"batch_id": int(batch_id)})

    return write


def stream_into_catalog(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    cat: Catalog,
    table: str,
    checkpoint: str,
) -> None:
    """Drain all currently-available files from ``src_dir`` into the
    catalog table exactly once (availableNow trigger)."""
    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(catalog_batch_sink(cat, table))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: run the events stream into a catalog table THREE
    times — a clean drain, a no-new-data re-drain on the same checkpoint,
    and a full replay from a FRESH checkpoint (every batch re-delivered
    with its original id) — then read the table back. Exactly-once holds
    iff the result still equals the plain batch read of the same files,
    which the DuckDB oracle checks hash-exactly."""
    from pyspark.sql.types import StructType

    src = tempfile.mkdtemp(prefix="eo_src_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(src, "events.parquet"),
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="eo_wh_"))
    ck1 = tempfile.mkdtemp(prefix="eo_ck1_")
    stream_into_catalog(spark, src, EVENTS_SCHEMA, cat, "events_sink", ck1)
    # no-op re-drain: checkpoint knows the files are processed
    stream_into_catalog(spark, src, EVENTS_SCHEMA, cat, "events_sink", ck1)
    # crash-replay simulation: a fresh checkpoint re-delivers batch 0;
    # the high-water mark makes the sink skip it
    ck2 = tempfile.mkdtemp(prefix="eo_ck2_")
    stream_into_catalog(spark, src, EVENTS_SCHEMA, cat, "events_sink", ck2)
    schema = StructType.fromDDL(EVENTS_SCHEMA)
    return cat.read("events_sink", schema).select(
        "event_id", "user_id", "event_type", "value", "props"
    )


SQL_STREAM_EXACTLY_ONCE_SINK = """
SELECT event_id, user_id, event_type, value, props FROM events
"""


QUERIES = {
    "streaming_exactly_once_sink": (
        stream_exactly_once_sink,
        SQL_STREAM_EXACTLY_ONCE_SINK,
    ),
}
