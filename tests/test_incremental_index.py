"""Incremental inverted-index maintenance: merge == rebuild, monotone
posting-list elision, and the O(delta)-scan proof."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.search import (
    POSTINGS_MAX_DF,
    _index_arrays,
    q_inverted_index_incremental,
    q_inverted_index_postings,
)
from tests.test_plans import SF_DIR


def test_incremental_equals_rebuild(spark):
    inc = q_inverted_index_incremental(spark, SF_DIR)
    full = q_inverted_index_postings(spark, SF_DIR)
    key = ["term", "df", "total_tf", "postings"]
    assert sorted(map(tuple, inc.select(key).collect())) == sorted(
        map(tuple, full.select(key).collect())
    )


def test_merge_elision_is_monotone(spark):
    """A term pushed past the elision threshold BY the delta loses its
    list in the merged index (rebuild semantics), and a term that stays
    under keeps the exact concatenated sorted list."""
    d = tempfile.mkdtemp(prefix="incidx_sf_")
    common = " ".join(["everywhere"] * 1)
    rows = [(i, f"{common} only{i % 2}") for i in range(3 * (POSTINGS_MAX_DF))]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "source", F.lit("s")
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    got = {r.term: r for r in q_inverted_index_incremental(spark, d).collect()}
    # 'everywhere' is in every doc (3*MAXDF docs) -> elided
    assert got["everywhere"].df == 3 * POSTINGS_MAX_DF
    assert got["everywhere"].postings is None
    full = {r.term: r for r in q_inverted_index_postings(spark, d).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in full.items()
    }


def test_delta_scan_reads_only_added_files(spark):
    """The delta index's tokenization touches ONLY snapshot 2's added
    files — the standing corpus is never re-read."""
    import tempfile as tf

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from swmaestro_crawler_spark.catalog import Catalog
    from swmaestro_crawler_spark.sources.testdata import load

    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    cat = Catalog(spark, tf.mkdtemp(prefix="incidx_wh_"))
    for k in range(3):
        cat.append(
            "docs_h", docs.filter(F.col("doc_id") % 3 == k).repartition(4, "doc_id")
        )
    m = cat._load_manifest("docs_h")
    snap = {s["id"]: set(s["files"]) for s in m["snapshots"]}
    added = snap[2] - snap[1]
    delta_idx = _index_arrays(cat.read_delta("docs_h", doc_schema, snapshot=2))
    touched = {f.rsplit("/", 1)[-1] for f in delta_idx.inputFiles()}
    assert touched and touched <= {f.rsplit("/", 1)[-1] for f in added}
