"""Semantic dedup over trained k-means cells (SemDeDup shape):
correctness invariants + the plan shapes the 100-TB path depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of

SF_DIR = "/root/testdata/sf0.001"


def test_semantic_dedup_invariants(spark):
    from swmaestro_crawler_spark.operators.kmeans import (
        SEMDEDUP_TAU,
        q_semantic_dedup,
    )
    from swmaestro_crawler_spark.operators.similarity import _int_cosine, _qvecs

    out = q_semantic_dedup(spark, SF_DIR)
    rows = {r.vec_id: r for r in out.collect()}
    vecs = _qvecs(spark, SF_DIR).select("vec_id", "qv")
    n = vecs.count()
    assert len(rows) == n  # every vector gets a verdict
    kept = [v for v in rows.values() if v.keep == 1]
    dropped = [v for v in rows.values() if v.keep == 0]
    assert dropped, "tau chosen so dedup actually fires at this SF"
    assert kept, "dedup must not drop everything"

    # The minimum vec_id within each cluster can never be dropped
    # (keep-first rule has nothing earlier to match it against).
    min_per_cluster: dict[int, int] = {}
    for v in rows.values():
        if v.cluster not in min_per_cluster or v.vec_id < min_per_cluster[v.cluster]:
            min_per_cluster[v.cluster] = v.vec_id
    for cid, mid in min_per_cluster.items():
        assert rows[mid].keep == 1, f"cluster {cid} min id {mid} was dropped"

    # Spot-check the drop rule on one dropped vector: some lower-id
    # same-cluster vector must exceed the threshold in exact cosine.
    victim = min(dropped, key=lambda v: v.vec_id)
    peers = [
        v.vec_id
        for v in rows.values()
        if v.cluster == victim.cluster and v.vec_id < victim.vec_id
    ]
    qv = {r.vec_id: r.qv for r in vecs.filter(
        F.col("vec_id").isin([victim.vec_id] + peers)).collect()}
    pair_df = spark.createDataFrame(
        [(list(qv[p]), list(qv[victim.vec_id])) for p in peers], "qa array<long>, qb array<long>"
    ).select(_int_cosine(F.col("qa"), F.col("qb")).alias("cos"))
    from swmaestro_crawler_spark.operators.kmeans import SEMDEDUP_TAU as TAU

    assert any(r.cos >= TAU for r in pair_df.collect())


def test_semantic_dedup_plan_shapes(spark):
    """Cell assignment is joinless (literal-centroid expression); the
    pair stage is a hash-partitioned equi-join on the cluster id — never
    a CartesianProduct or a corpus broadcast."""
    from swmaestro_crawler_spark.operators.kmeans import (
        KMEANS_ITERS,
        KMEANS_K,
        assign_to,
        kmeans_fit,
    )
    from swmaestro_crawler_spark.operators.similarity import _qvecs

    vecs = _qvecs(spark, SF_DIR).select("vec_id", "qv")
    assigned = assign_to(vecs, kmeans_fit(vecs, KMEANS_K, KMEANS_ITERS))
    assert "Join" not in plan_of(assigned)

    from swmaestro_crawler_spark.operators.kmeans import q_semantic_dedup

    plan = plan_of(q_semantic_dedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "cluster" in plan  # the pair join keys on the cell id
