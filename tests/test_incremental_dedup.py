"""Incremental (nightly-crawl) dedup: a new snapshot's docs are
LSH-matched against the standing corpus via its persisted signature
table — only the snapshot's ADDED files are ever scanned for text.

Mirrors the reference's nightly re-crawl + set-difference insert shape
(Utils/Insert_Nox_Data_to_DB.py:52) at corpus scale: the standing corpus
is never re-read, the delta is matched against a narrow persisted index.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog
from swmaestro_crawler_spark.operators.dedup import (
    MINHASH_K,
    SQL_DEDUP_INCREMENTAL,
    band_rows,
    incremental_lsh_match,
    shingles_of,
    signatures_of,
)

SF_DIR = "/root/testdata/sf0.01"
CUT = 400  # ((499 + 1) * 4) div 5 — the contract split at sf0.01

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
SIG_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"mh{j}", LongType()) for j in range(MINHASH_K)]
)


@pytest.fixture(scope="module")
def incr(spark, tmp_path_factory):
    """Two-snapshot catalog: snapshot 0 = standing corpus (+ persisted
    signature index), snapshot 1 = tonight's appended batch."""
    wh = tmp_path_factory.mktemp("incr_wh")
    cat = Catalog(spark, str(wh))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    s0 = cat.append("documents", docs.filter(F.col("doc_id") < CUT))
    cat.append("doc_sigs", signatures_of(shingles_of(cat.read("documents", DOC_SCHEMA, s0))))
    s1 = cat.append("documents", docs.filter(F.col("doc_id") >= CUT))
    return cat, s0, s1


def _run(spark, incr):
    cat, _s0, s1 = incr
    delta = cat.read_delta("documents", DOC_SCHEMA, s1)
    standing_sigs = cat.read("doc_sigs", SIG_SCHEMA)
    return delta, incremental_lsh_match(delta, standing_sigs)


def test_incremental_matches_oracle(spark, incr):
    """The catalog-fed incremental path reproduces the contract oracle
    (full-corpus DuckDB recompute) exactly."""
    _delta, out = _run(spark, incr)
    got = sorted(
        (r.doc_a, r.doc_b, r.n_match, r.is_cross) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(SQL_DEDUP_INCREMENTAL).fetchall()))
    assert got == want
    assert len(got) > 0
    assert any(c for *_x, c in got) and any(not c for *_x, c in got)


def test_incremental_reads_only_added_files(spark, incr):
    """The delta scan touches ONLY snapshot 1's added files; the whole
    plan never opens a snapshot-0 document file (standing text is dead —
    only the persisted signature index is read)."""
    cat, s0, s1 = incr
    delta, out = _run(spark, incr)
    m = cat._load_manifest("documents")
    snap = {s["id"]: set(s["files"]) for s in m["snapshots"]}
    added = snap[s1] - snap[s0]
    old = snap[s0]
    delta_files = {f.rsplit("/", 1)[-1] for f in delta.inputFiles()}
    assert delta_files and delta_files <= {f.rsplit("/", 1)[-1] for f in added}
    plan_doc_files = {
        f.rsplit("/", 1)[-1] for f in out.inputFiles() if "/documents/" in f
    }
    assert plan_doc_files.isdisjoint({f.rsplit("/", 1)[-1] for f in old})


def test_incremental_plan_shape(spark, incr):
    """Bucket join is a hash join on (band_idx, band_key) — no cartesian
    product; the only nested-loop join is the broadcast of the 1-row
    first_new scalar."""
    _delta, out = _run(spark, incr)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "band_key" in plan


def test_band_rows_shape(spark):
    """The persisted index is narrow: (doc_id, band_idx, band_key)."""
    sigs = signatures_of(
        shingles_of(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        )
    )
    assert band_rows(sigs).columns == ["doc_id", "band_idx", "band_key"]
