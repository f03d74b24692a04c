"""Exactly-once foreachBatch sink: replayed micro-batches must not
double-append, across checkpoint no-ops AND fresh-checkpoint replays."""

from __future__ import annotations

import os
import tempfile

from swmaestro_crawler_spark.catalog import Catalog
from swmaestro_crawler_spark.streaming.exactly_once import (
    catalog_batch_sink,
    last_committed_batch,
    stream_into_catalog,
)
from swmaestro_crawler_spark.streaming.stream_metrics import EVENTS_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


def test_sink_skips_replayed_batches(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    sink = catalog_batch_sink(cat, "t")
    sink(spark.range(10), 0)
    sink(spark.range(10, 20), 1)
    assert cat.row_count("t") == 20
    assert last_committed_batch(cat, "t") == 1
    # crash replay re-delivers batch 1 — must be a no-op
    sink(spark.range(10, 20), 1)
    sink(spark.range(5), 0)
    assert cat.row_count("t") == 20
    assert cat.current_snapshot("t") == 1
    # genuinely new batch still lands
    sink(spark.range(20, 25), 2)
    assert cat.row_count("t") == 25


def test_stream_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    os.symlink(
        os.path.abspath(os.path.join(SF_DIR, "events.parquet")),
        os.path.join(src, "events.parquet"),
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    n_src = spark.read.parquet(src).count()

    ck1 = str(tmp_path / "ck1")
    stream_into_catalog(spark, src, EVENTS_SCHEMA, cat, "ev", ck1)
    assert cat.row_count("ev") == n_src
    snap_after_first = cat.current_snapshot("ev")

    # same checkpoint: nothing new to process
    stream_into_catalog(spark, src, EVENTS_SCHEMA, cat, "ev", ck1)
    assert cat.row_count("ev") == n_src

    # FRESH checkpoint: batch 0 is re-delivered with its original id and
    # must be skipped by the high-water mark
    ck2 = str(tmp_path / "ck2")
    stream_into_catalog(spark, src, EVENTS_SCHEMA, cat, "ev", ck2)
    assert cat.row_count("ev") == n_src
    assert cat.current_snapshot("ev") == snap_after_first
