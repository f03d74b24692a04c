"""Multi-table random-hyperplane embedding LSH (VERDICT r2 item 2):
recall cross-check vs brute force, candidate-shuffle plan shape, and the
bucket-width scaling helper."""

from __future__ import annotations

import duckdb

from swmaestro_crawler_spark.operators.similarity import (
    NEARDUP_MIN_COS,
    lsh_bucket_stats,
    lsh_hyperplanes,
    lsh_params,
    q_embedding_neardup_pairs,
    _sql_int_cosine,
    _SQL_Q_CTE,
)

SF_DIR = "/root/testdata/sf0.01"


def _brute_force_pairs() -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    rows = con.execute(
        f"""WITH {_SQL_Q_CTE}
        SELECT a.vec_id, b.vec_id FROM q a JOIN q b ON a.vec_id < b.vec_id
        WHERE {_sql_int_cosine('a.qv', 'b.qv')} >= {NEARDUP_MIN_COS}"""
    ).fetchall()
    return {(r[0], r[1]) for r in rows}


def test_recall_vs_brute_force_and_perfect_precision(spark):
    truth = _brute_force_pairs()
    got = {(r.vec_a, r.vec_b) for r in q_embedding_neardup_pairs(spark, SF_DIR).collect()}
    assert got <= truth  # verify stage guarantees precision 1.0
    recall = len(got) / len(truth)
    assert recall >= 0.85, f"recall {recall:.3f} over {len(truth)} true pairs"


def test_candidate_join_is_hash_keys_only(spark):
    """Candidates must come from a hash join on (tbl, bucket) — no
    cartesian/broadcast-nested-loop anywhere, and the shuffled candidate
    relation carries ids only (vectors re-join later by vec_id)."""
    df = q_embedding_neardup_pairs(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "tbl" in plan and "bucket" in plan


def test_bucket_population_is_bounded_and_visible(spark):
    stats = lsh_bucket_stats(spark, SF_DIR).collect()
    assert stats, "stats diagnostic must return per-bucket rows"
    assert max(r.n_rows for r in stats) < 150  # 500 vecs over 16 buckets/table
    # the no-silent-caps number a deployment would log:
    assert sum(r.cand_pairs for r in stats) > 0


def test_lsh_params_scales_bits_with_corpus():
    assert lsh_params(2_000, 1024) == 1
    assert lsh_params(1_000_000, 1024) == 10
    assert lsh_params(10_000_000_000, 4096) == 22  # the 10^10 frontier case
    # monotone: bigger corpus never gets fewer bits
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9, 10**11):
        b = lsh_params(n)
        assert b >= prev
        prev = b


def test_hyperplanes_are_stable_constants():
    a = lsh_hyperplanes(2, 2, 8)
    b = lsh_hyperplanes(2, 2, 8)
    assert a == b
    assert all(x in (1, -1) for t in a for h in t for x in h)
    # distinct tables/bits get distinct planes
    assert a[0][0] != a[0][1] and a[0][0] != a[1][0]


def test_arrow_bucketing_matches_column_expression_mirror(spark):
    """lsh_keys' single integer matmul must reproduce the per-bit
    Column-expression bucketing (_lsh_bucket) exactly."""
    from pyspark.sql import functions as F

    from swmaestro_crawler_spark.operators.similarity import (
        _lsh_bucket,
        _qvecs,
        lsh_hyperplanes,
        lsh_keys,
    )

    vecs = _qvecs(spark, SF_DIR)
    planes = lsh_hyperplanes()
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"), _lsh_bucket(F.col("qv"), pt).alias("bucket")
            )
            for t, pt in enumerate(planes)
        ]
    )
    expr_side = set(
        map(
            tuple,
            vecs.select("vec_id", F.explode(entries).alias("e"))
            .select("vec_id", "e.tbl", "e.bucket")
            .collect(),
        )
    )
    udf_side = set(map(tuple, lsh_keys(vecs).collect()))
    assert udf_side == expr_side
