"""LSH-fed Jaccard (VERDICT r1 task 8): the scale path must not lose
pairs the round-1 blocked-quadratic variant found.

The blocked variant compares every pair within a (lang, source) block —
exhaustive inside blocks, O(block^2). The LSH-fed contract query only
verifies MinHash band-join candidates. This cross-check asserts, at test
scale, that every blocked-discovery pair is recalled by the LSH path
with the identical jaccard value (band recall at J >= 0.30 with 4 bands
of 2 over 8 minhashes is ~1 for the planted near-dups)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return {(r.doc_a, r.doc_b): float(r.jaccard) for r in df.collect()}


def test_lsh_fed_jaccard_recalls_blocked_pairs(spark):
    from swmaestro_crawler_spark.operators.dedup import (
        q_ngram_jaccard_blocked,
        q_ngram_jaccard_pairs,
    )

    lsh_fed = _rows(q_ngram_jaccard_pairs(spark, SF_DIR))
    blocked = _rows(q_ngram_jaccard_blocked(spark, SF_DIR))
    assert blocked, "cross-check vacuous: blocked variant found no pairs"
    missing = {p: j for p, j in blocked.items() if p not in lsh_fed}
    assert not missing, f"LSH candidates missed blocked pairs: {missing}"
    for p, j in blocked.items():
        assert lsh_fed[p] == j, (p, lsh_fed[p], j)


def test_lsh_fed_plan_has_no_quadratic_block(spark):
    """The contract query's optimized plan must join on LSH band keys,
    never a (lang, source) block (the O(block^2) shape VERDICT flagged)."""
    from swmaestro_crawler_spark.operators.dedup import q_ngram_jaccard_pairs

    plan = q_ngram_jaccard_pairs(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    assert "band_key" in plan
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert not any("lang" in ln and "source" in ln for ln in joins), joins
