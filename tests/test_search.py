"""Inverted index + BM25: hand-checked semantics on an engineered corpus,
posting-list elision for unselective terms, fixed-point score properties,
and the scale-contract plan shape (query-term filter applied before any
shuffle; global top-k with no single-partition sort)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.search import (
    BM25_SCALE,
    POSTINGS_MAX_DF,
    QUERY_TERMS,
    q_bm25_topk,
    q_inverted_index_postings,
)

SF_DIR = "/root/testdata/sf0.001"


def _mini_docs(spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len()
    return spark.createDataFrame(pdf)


def _patched_load(df):
    def load(spark, sf_dir, table):
        assert table == "documents"
        return df

    return load


def test_postings_sorted_and_exact(spark, monkeypatch, tmp_path):
    from swmaestro_crawler_spark.operators import search

    docs = _mini_docs(
        spark,
        [
            (7, "s", "alpha beta"),
            (3, "s", "alpha alpha gamma"),
            (5, "s", "beta"),
        ],
    )
    monkeypatch.setattr(search, "load", _patched_load(docs))
    out = {
        r.term: r
        for r in q_inverted_index_postings(spark, str(tmp_path)).collect()
    }
    assert out["alpha"].df == 2 and out["alpha"].total_tf == 3
    assert out["alpha"].postings == "3,7"  # sorted doc ids
    assert out["beta"].postings == "5,7"
    assert out["gamma"].df == 1 and out["gamma"].postings == "3"


def test_postings_elided_above_max_df(spark, monkeypatch, tmp_path):
    from swmaestro_crawler_spark.operators import search

    rows = [(i, "s", "stopword uniq%d" % i) for i in range(POSTINGS_MAX_DF + 5)]
    docs = _mini_docs(spark, rows)
    monkeypatch.setattr(search, "load", _patched_load(docs))
    out = {
        r.term: r
        for r in q_inverted_index_postings(spark, str(tmp_path)).collect()
    }
    assert out["stopword"].df == POSTINGS_MAX_DF + 5
    assert out["stopword"].postings is None  # stats kept, list elided
    assert out["uniq0"].postings == "0"


def test_bm25_ranking_semantics(spark, monkeypatch, tmp_path):
    """More hits on a rarer term must outrank fewer hits on a common one;
    term frequency saturates rather than growing linearly."""
    from swmaestro_crawler_spark.operators import search

    filler = " ".join(["pad"] * 20)
    docs = _mini_docs(
        spark,
        [
            # 'vector' appears only here -> rare, high idf
            (1, "s", f"vector vector {filler}"),
            # 'customer' is in every other doc -> common, low idf
            (2, "s", f"customer {filler}"),
            (3, "s", f"customer {filler}"),
            (4, "s", f"customer {filler}"),
            (5, "s", f"customer customer customer customer {filler}"),
        ],
    )
    monkeypatch.setattr(search, "load", _patched_load(docs))
    got = q_bm25_topk(spark, str(tmp_path)).collect()
    scores = {r.doc_id: r.score_micro for r in got}
    assert got[0].doc_id == 1  # rare-term doc wins the ranking
    # tf saturation: 4x the tf must score well under 4x the single-hit doc
    assert scores[5] < 3 * scores[2]
    assert scores[5] > scores[2]  # but still monotone in tf
    assert all(r.score_micro >= 0 for r in got)


def test_bm25_topk_plan_shape(spark):
    """The query-term filter must sit under the first aggregate (only
    query hits reach a shuffle) and the global top-k must be
    TakeOrderedAndProject — no single-partition sort exchange."""
    plan = q_bm25_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only single-partition exchange allowed is the one feeding the
    # scalar (N, L) corpus-stats aggregate — a 2-long-columns stream of
    # one partial row per partition, not corpus data
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Sort " not in plan  # top-k must not globally sort
    # the isin filter appears as an IN predicate below the first HashAggregate
    assert QUERY_TERMS[0] in plan


def test_bm25_layout_independent(spark):
    a = {r.doc_id: r.score_micro for r in q_bm25_topk(spark, SF_DIR).collect()}
    b_df = q_bm25_topk(spark, SF_DIR)
    b = {r.doc_id: r.score_micro for r in b_df.collect()}
    assert a == b and len(a) > 0
    assert all(0 <= v for v in a.values())
    # scores are in micro-units of the fixed-point scale
    assert max(a.values()) < 10 * BM25_SCALE * len(QUERY_TERMS)
