"""Product quantization: code semantics, two-stage search recall, and
the no-corpus-shuffle ADC plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.pq import (
    PQ_K,
    PQ_M,
    PQ_SHORTLIST,
    q_pq_adc_recall,
    q_pq_adc_topk,
    q_pq_codes,
    _adc_shortlist,
)
from tests.test_plans import SF_DIR, plan_of


def test_pq_codes_shape_and_range(spark):
    df = q_pq_codes(spark, SF_DIR)
    assert df.columns == ["vec_id"] + [f"c{m}" for m in range(PQ_M)]
    bad = df.filter(
        " OR ".join(f"(c{m} < 0 OR c{m} >= {PQ_K})" for m in range(PQ_M))
    )
    assert bad.count() == 0
    assert df.count() == df.select("vec_id").distinct().count()


def test_pq_shortlist_and_rerank_sizes(spark):
    short = _adc_shortlist(spark, SF_DIR)
    per_q = short.groupBy("query_id").count().collect()
    assert all(r["count"] == PQ_SHORTLIST for r in per_q)
    top = q_pq_adc_topk(spark, SF_DIR)
    # rerank only reorders within the shortlist
    missing = top.join(
        short.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    assert missing.count() == 0


def test_pq_two_stage_recall_beats_floor(spark):
    rows = q_pq_adc_recall(spark, SF_DIR).collect()
    mean = sum(r.recall_pct for r in rows) / len(rows)
    # deterministic on this corpus (measured 54.0 at sf0.001); the floor
    # guards regressions, not the corpus (uniform-random vectors are the
    # quantization worst case — see the module-head note)
    assert mean >= 40
    assert all(0 <= r.recall_pct <= 100 for r in rows)


def test_pq_adc_plan_no_corpus_shuffle_before_topk(spark):
    plan = plan_of(_adc_shortlist(spark, SF_DIR))
    # no real cartesian: the query LUT table is broadcast (BNLJ over 10
    # rows is the intended ADC scan shape)
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # exactly one exchange feeds the per-query top-k window; the coded
    # corpus itself is never hash-repartitioned for a join
    assert plan.count("Exchange hashpartitioning") <= 1
