"""DSIR importance resampling: semantics on an engineered corpus and
the broadcast/no-corpus-reshuffle plan shape."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.curation import (
    DSIR_SCALE,
    q_dsir_topk,
)
from tests.test_plans import SF_DIR, plan_of


def _mini_sf(spark) -> str:
    """Target slice = source 'a' (lexicographic min). Doc 10 repeats the
    target's vocabulary; doc 11 shares nothing with it."""
    d = tempfile.mkdtemp(prefix="dsir_sf_")
    rows = [
        (1, "a", "alpha beta alpha beta gamma"),
        (2, "a", "alpha beta delta"),
        (10, "b", "alpha beta alpha beta"),       # target-like
        (11, "b", "zeta eta theta iota kappa"),   # off-target
    ]
    spark.createDataFrame(rows, "doc_id long, source string, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_dsir_ranks_target_like_docs_above_off_target(spark):
    got = {r.doc_id: r for r in q_dsir_topk(spark, _mini_sf(spark)).collect()}
    assert set(got) == {1, 2, 10, 11}
    # the target-like outside doc outranks the off-target one
    assert got[10].avg_imp > got[11].avg_imp
    # and the target slice itself scores at least as target-like
    assert min(got[1].avg_imp, got[2].avg_imp) > got[11].avg_imp
    # off-target features still get smoothed mass, never zero/negative
    assert got[11].avg_imp >= 0
    # feature counts: unigrams + bigrams
    assert got[11].n_feats == 5 + 4


def test_dsir_plan_broadcasts_scores_and_avoids_cartesian(spark):
    plan = plan_of(q_dsir_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the B<=4096-row score table reaches the doc-bucket counts via a
    # broadcast hash join — the corpus side never re-shuffles for it
    assert "BroadcastHashJoin" in plan
    # top-k is TakeOrdered, not a global single-partition sort
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dsir_scale_constant_headroom():
    # documented int64 bound: (N_t+1) * (N_r+B) * SCALE < 2^63 holds for
    # slices up to ~10^7 tokens with the shipped SCALE
    n = 10**7
    assert (n + 1) * (4 * n + 4096) * DSIR_SCALE < 2**63
