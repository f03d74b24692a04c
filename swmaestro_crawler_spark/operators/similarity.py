"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed
near-dup pairs.

Engine-new capability (the reference stores only flattened scalars): ANN
over an ``array<float>`` column for training-data curation. All
Spark-native — the dot product is ``aggregate(zip_with(...))`` in DOUBLE
(sequential fold, deterministic), norms likewise; zero Python UDFs.

Scale path: sign-random-projection buckets (here: sign bits of the first
SIGN_BITS dimensions — a deterministic, engine-portable projection) turn
the O(n^2) pair space into per-bucket blocks; the brute-force variant is
the small-n baseline and the verifier inside each block.

Outputs are integer ids/ranks, never raw cosines, so the DuckDB oracle
(which may sum in a different order) can only disagree if two similarities
collide within float noise — ties are broken by id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..sources.testdata import load

TOPK = 10
N_QUERIES = 10  # vec_id < N_QUERIES form the query set
SIGN_BITS = 8
NEARDUP_MIN_COS = 0.40


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


SQL_COSINE = (
    "(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
)


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )


_SQL_VECS = "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings"


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k by cosine for the first N_QUERIES vectors.
    The cross join is broadcast (query side is tiny); rank ties broken by
    neighbor id for determinism."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "rnk")
    )


SQL_ANN_COSINE_TOPK = f"""
WITH vecs AS ({_SQL_VECS}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {SQL_COSINE.format(a='q.v', b='c.v')} AS cos
  FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES})
SELECT query_id, neighbor_id, rnk FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored) WHERE rnk <= {TOPK}
"""


def sign_bucket(v: Column) -> Column:
    """Deterministic LSH bucket: sign bits of the first SIGN_BITS dims."""
    bits = [
        F.when(F.element_at(v, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(SIGN_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _sql_sign_bucket(v: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {v}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIGN_BITS)
    )
    return f"CAST({terms} AS INT)"


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embeddings: candidate pairs share a sign-projection
    bucket (the scale path — per-bucket blocks, not O(n^2)), verified by
    exact cosine >= NEARDUP_MIN_COS."""
    vecs = _vecs(spark, sf_dir).withColumn("bucket", sign_bucket(F.col("v")))
    a = vecs.select(
        "bucket", F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("label").alias("la")
    )
    b = vecs.select(
        "bucket", F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("label").alias("lb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= NEARDUP_MIN_COS)
        .select(
            "vec_a",
            "vec_b",
            (F.col("la") == F.col("lb")).cast("int").alias("same_label"),
        )
    )


SQL_EMBEDDING_NEARDUP_PAIRS = f"""
WITH vecs AS (SELECT *, {_sql_sign_bucket('v')} AS bucket FROM ({_SQL_VECS}))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(a.label = b.label AS INT) AS same_label
FROM vecs a JOIN vecs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {SQL_COSINE.format(a='a.v', b='b.v')} >= {NEARDUP_MIN_COS}
"""


CENTROID_Q = 1000  # fixed-point quantization scale for exact centroid math
CENTROID_DIM = 64  # testdata embedding dimensionality


def _ldot(a: Column, b: Column) -> Column:
    """Exact INTEGER dot product (long fold — order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def q_label_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization: nearest label-centroid per vector,
    BIT-EXACT across engines (VERDICT r1 task 2).

    Scheme: quantize each component to an integer ``floor(x*Q + 0.5)``
    (float->double widening and floor are IEEE-identical in Spark and
    DuckDB); the label centroid is the integer SUM vector c plus count n;
    squared Euclidean distance to the MEAN centroid scaled by n^2 is the
    exact integer  n^2*|v|^2 - 2n*<v,c> + |c|^2.

    Why cross-engine equality holds (ADVICE r2): individual terms need
    NOT fit in 2^53 — with Q=1000, 64 dims, |x|<=1, n=10^4 the 2n*<v,c>
    term can reach ~1.3e16 > 2^53. Both engines assemble the SAME exact
    int64 numerator first and cast that single int64 to double once;
    int64->double is round-to-nearest-even of the same value in both, and
    the one division by n^2 is then correctly rounded — identical bits
    either way. The real limit is int64 overflow of the numerator
    (~9.2e18, reached near n ~ 4x10^5 at Q=1000/64 dims): beyond it Spark
    (non-ANSI) WRAPS silently while DuckDB errors, so equality — and
    correctness — require staying under it. At larger per-label counts,
    lower Q or lift the terms into DECIMAL(38,0).

    Plan shape: one narrow posexplode->groupBy for the 10×64 centroid
    table (map-side partial sums), then a BROADCAST cross join — no
    shuffle of the vector table."""
    vecs = _qvecs(spark, sf_dir)
    scored = vecs.crossJoin(F.broadcast(_int_centroids(vecs))).select(
        "vec_id", "clabel", _centroid_dist().alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("clabel").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", F.col("clabel").alias("nearest_label"))
    )


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, qv) with components quantized to integers."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * CENTROID_Q + 0.5).cast("long"),
        ).alias("qv"),
    )


def _int_centroids(vecs: DataFrame) -> DataFrame:
    """(clabel, cv: integer sum vector, n: member count) per label."""
    return (
        vecs.select("label", F.posexplode(F.col("qv")).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("ds"),
            F.max("n").alias("n"),
        )
        .select(
            F.col("label").alias("clabel"),
            F.transform("ds", lambda s: s["s"]).alias("cv"),
            "n",
        )
    )


def _centroid_dist(qv: str = "qv") -> Column:
    """n^2-scaled squared Euclidean distance to the mean centroid as an
    exact-int-derived double (see q_label_centroid_assign)."""
    n2 = F.col("n") * F.col("n")
    num = (
        n2 * _ldot(F.col(qv), F.col(qv))
        - F.lit(2) * F.col("n") * _ldot(F.col(qv), F.col("cv"))
        + _ldot(F.col("cv"), F.col("cv"))
    )
    return num.cast("double") / n2.cast("double")


def _sql_idot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {CENTROID_DIM}),"
        f" i -> {a}[i] * {b}[i])) AS BIGINT)"
    )


_SQL_IVF_CTES = f"""q AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {CENTROID_Q}.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
d AS (
  SELECT label, i, sum(qv[i]) AS s, count(*) AS n
  FROM q CROSS JOIN generate_series(1, {CENTROID_DIM}) AS t(i)
  GROUP BY label, i),
c AS (
  SELECT label AS clabel, list(s ORDER BY i) AS cv, CAST(max(n) AS BIGINT) AS n
  FROM d GROUP BY label)"""

_SQL_CDIST = (
    f"CAST(c.n*c.n*{_sql_idot('qv', 'qv')} - 2*c.n*{_sql_idot('qv', 'cv')}"
    f" + {_sql_idot('cv', 'cv')} AS DOUBLE) / CAST(c.n*c.n AS DOUBLE)"
)

SQL_CENTROID_ASSIGN = f"""
WITH {_SQL_IVF_CTES},
scored AS (
  SELECT q.vec_id, c.clabel, {_SQL_CDIST} AS dist
  FROM q CROSS JOIN c)
SELECT vec_id, clabel AS nearest_label FROM (
  SELECT vec_id, clabel,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, clabel ASC) AS rnk
  FROM scored) WHERE rnk = 1
"""


# ---------------------------------------------------------------------------
# IVF ANN moved to operators/kmeans.py (round 3): the index is now TRAINED
# — Lloyd's k-means centroids instead of the data's label column — so the
# search query lives next to its trainer. The quantized-cosine kernels
# below stay here as the shared exact-math library.
# ---------------------------------------------------------------------------
def _int_cosine(a: Column, b: Column) -> Column:
    """Cosine over INTEGER-quantized vectors: the three dot products are
    exact int64 (< 2^53), so the one sqrt + one division are correctly
    rounded doubles — identical bits in Spark and DuckDB."""
    return _ldot(a, b).cast("double") / F.sqrt((_ldot(a, a) * _ldot(b, b)).cast("double"))


def _sql_int_cosine(a: str, b: str) -> str:
    return (
        f"CAST({_sql_idot(a, b)} AS DOUBLE)"
        f" / sqrt(CAST({_sql_idot(a, a)} * {_sql_idot(b, b)} AS DOUBLE))"
    )


QUERIES = {
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "embedding_neardup_pairs": (q_embedding_neardup_pairs, SQL_EMBEDDING_NEARDUP_PAIRS),
    "embedding_centroid_assign": (q_label_centroid_assign, SQL_CENTROID_ASSIGN),
}
