"""PPJoin exact similarity join: equals brute force (no false
negatives/positives), and the prefix-filter plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.dedup import (
    PPJOIN_T_DEN,
    PPJOIN_T_NUM,
    _doc_shingles,
    ppjoin_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _brute(sets_df):
    sets = {
        r.doc_id: frozenset(r.ws)
        for r in sets_df.groupBy("doc_id")
        .agg(F.collect_list("w").alias("ws"))
        .collect()
    }
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if PPJOIN_T_DEN * inter >= PPJOIN_T_NUM * uni:
                out.add((a, b, inter, uni))
    return out


def test_ppjoin_equals_brute_force_unrestricted(spark):
    sets = _doc_shingles(spark, SF_DIR)
    got = {
        (r.doc_a, r.doc_b, r.inter, r.uni)
        for r in ppjoin_pairs(sets).collect()
    }
    assert got == _brute(sets)
    assert got, "sf0.001 must contain planted near-dup pairs"


def test_ppjoin_engineered_threshold_edges(spark):
    # J exactly at threshold (7/10) must be KEPT; just below must not
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "d"), (1, "e"), (1, "f"), (1, "g"),
        (2, "a"), (2, "b"), (2, "c"), (2, "d"), (2, "e"), (2, "f"), (2, "g"),
        (3, "a"), (3, "b"), (3, "c"), (3, "d"), (3, "e"), (3, "f"), (3, "x"),
        (4, "a"), (4, "b"), (4, "c"), (4, "d"), (4, "x"), (4, "y"), (4, "z"),
    ]
    sets = spark.createDataFrame(rows, "doc_id long, w string")
    got = {(r.doc_a, r.doc_b): (r.inter, r.uni) for r in ppjoin_pairs(sets).collect()}
    assert got[(1, 2)] == (7, 7)          # identical
    # |1∩3|=6, |1∪3|=8 -> 0.75 >= 0.7 kept
    assert got[(1, 3)] == (6, 8)
    # |1∩4|=4, |1∪4|=10 -> 0.4 dropped
    assert (1, 4) not in got
    assert {(a, b, i, u) for (a, b), (i, u) in got.items()} == _brute(
        sets.select("doc_id", "w")
    )


def test_ppjoin_plan_no_cartesian(spark):
    df = ppjoin_pairs(_doc_shingles(spark, SF_DIR))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan
