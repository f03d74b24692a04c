"""Lloyd's k-means trainer: layout-independence (integer math makes the
fit exactly reproducible regardless of partitioning) and index sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.kmeans import (
    KMEANS_ITERS,
    KMEANS_K,
    assign_to,
    kmeans_fit,
)
from swmaestro_crawler_spark.operators.similarity import _qvecs

SF_DIR = "/root/testdata/sf0.001"


def test_fit_is_layout_independent(spark):
    vecs = _qvecs(spark, SF_DIR).select("vec_id", "qv")
    a = kmeans_fit(vecs, KMEANS_K, KMEANS_ITERS)
    b = kmeans_fit(vecs.repartition(13, "vec_id"), KMEANS_K, KMEANS_ITERS)
    assert a == b  # exact integer equality: cid, sum vector, count


def test_assignment_covers_corpus_and_counts_match(spark):
    vecs = _qvecs(spark, SF_DIR).select("vec_id", "qv")
    cent = kmeans_fit(vecs, KMEANS_K, KMEANS_ITERS)
    assigned = assign_to(vecs, cent)
    n = vecs.count()
    assert assigned.count() == n  # expression assignment: no row loss
    got = {r.cluster: r.c for r in assigned.groupBy("cluster").agg(F.count("*").alias("c")).collect()}
    assert sum(got.values()) == n
    assert set(got) <= {cid for cid, _, _ in cent}


def test_iterations_refine_the_seeds(spark):
    """After a full fit the centroids must differ from the 1-member
    seeds (i.e. the updates actually ran) and carry real member counts."""
    vecs = _qvecs(spark, SF_DIR).select("vec_id", "qv")
    cent = kmeans_fit(vecs, KMEANS_K, KMEANS_ITERS)
    assert sum(n for _, _, n in cent) == vecs.count()
    assert any(n > 1 for _, _, n in cent)


def test_arrow_assignment_matches_column_expression_mirror(spark):
    """The Arrow-batched argmin (assign_to) and the pure-Column
    array_min form (assign_to_expr) must agree row-for-row — same int64
    numerator, one double cast, same (dist, cid) tie-break."""
    from swmaestro_crawler_spark.operators.kmeans import assign_to_expr

    vecs = _qvecs(spark, SF_DIR).select("vec_id", "qv")
    cent = kmeans_fit(vecs, KMEANS_K, KMEANS_ITERS)
    udf_side = {r.vec_id: r.cluster for r in assign_to(vecs, cent).collect()}
    expr_side = {r.vec_id: r.cluster for r in assign_to_expr(vecs, cent).collect()}
    assert udf_side == expr_side
