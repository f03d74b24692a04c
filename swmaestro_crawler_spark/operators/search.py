"""Full-text retrieval over the documents corpus: inverted index + BM25.

The reference stores raw comment/caption text in Postgres and never
queries it by content (New_YouTube_Crawler_Comment.py writes rows; no
reader selects on text). A training-data engine needs a retrieval path:
decontamination sweeps, targeted corpus slicing ("every document about
X") and curation audits are all ranked-retrieval problems. This module
builds the two classic IR primitives Spark-first:

- ``inverted_index_postings``: term -> (df, total_tf, postings). Two
  hash aggregations — ``groupBy(term, doc_id)`` for tf (map-side
  combined), ``groupBy(term)`` for the index row — so document text
  crosses exactly one shuffle as (term, doc_id) pairs and is never
  carried into the index. Posting LISTS materialize only for selective
  terms (df <= POSTINGS_MAX_DF): a stopword's corpus-sized posting list
  is exactly what production indexes shard or elide (stopword elision /
  impact-ordered skips), so unselective terms keep stats but no list —
  the collect_list aggregation runs AFTER a semi-join against the
  selective vocabulary, so no executor ever buffers a corpus-sized
  group.

- ``bm25_topk``: rank documents for a literal query under BM25
  (k1 = 1.2, b = 0.75 as exact ratios) with the log-idf replaced by its
  exact rational argument (N - df + 1/2) / (df + 1/2). log is monotone,
  so per-term document ranking is IDENTICAL to classic BM25; what
  changes is only the inter-term mixing weight — and in exchange every
  score is exact int64 micro-units computed with integer floor
  division (Spark ``div`` == DuckDB ``//`` on the all-nonnegative
  values here), the same fixed-point discipline as
  :mod:`.graph`'s PageRank: results are engine-exact, never
  libm-tolerance-compared.

Scale shape of bm25_topk at 100 TB: the ``isin(QUERY_TERMS)`` filter is
applied in the same codegen stage as the tokenize-explode, so only
query-hit tokens (query-selectivity-sized, not corpus-sized) reach the
one groupBy shuffle; df (|query| rows) and the (N, L) corpus stats
(1 row) broadcast back; the final top-k is ``orderBy().limit(k)`` —
Spark's TakeOrderedAndProject, per-partition heaps + driver merge of
k rows, no single-partition sort exchange.

Fixed-point overflow bounds (int64 max ~9.2e18): with S = 1e6,
idf_u <= (2N+1)·S and tfp_u <= 2.2·S, so idf_u·tfp_u <= ~4.4·N·S² =
4.4e16 even at N = 1e4 corpus docs per partition-group; the tf-part
numerator 22·tf·L·S stays < 1e17 for L (total corpus tokens) up to
~4e9 per group. At larger corpora drop S to 1e4 (documented knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import SQL_WORDS, words
from ..sources.testdata import load

_WS = SQL_WORDS.format(c="text")

# posting lists materialize only below this df (stopword elision)
POSTINGS_MAX_DF = 64

# BM25 constants: k1 = 6/5, b = 3/4, fixed-point scale
BM25_SCALE = 1_000_000
BM25_TOPK = 10
QUERY_TERMS = ("spark", "merge", "vector", "customer")


def q_inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the inverted index: one row per term with df, total_tf and
    (for selective terms only) the sorted comma-joined doc_id posting
    list."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    )
    tf = toks.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    sel = stats.filter(F.col("df") <= POSTINGS_MAX_DF).select("w")
    lists = (
        tf.join(sel, "w", "left_semi")
        .groupBy("w")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings")
        )
    )
    return stats.join(lists, "w", "left").select(
        F.col("w").alias("term"), "df", "total_tf", "postings"
    )


SQL_INVERTED_INDEX = f"""
WITH toks AS (
  SELECT doc_id, unnest({_WS}) AS w FROM documents),
tf AS (
  SELECT w, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY w, doc_id),
stats AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY w),
lists AS (
  SELECT w, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM tf
  WHERE w IN (SELECT w FROM stats WHERE df <= {POSTINGS_MAX_DF})
  GROUP BY w)
SELECT stats.w AS term, df, total_tf, lists.postings
FROM stats LEFT JOIN lists USING (w)
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BM25_TOPK} documents for QUERY_TERMS under rational-idf BM25
    in exact int64 micro-units (see module docstring)."""
    S = BM25_SCALE
    base = load(spark, sf_dir, "documents").select(
        "doc_id", words(F.col("text")).alias("ws")
    )
    base = base.select("doc_id", F.size("ws").alias("dl"), "ws")
    stats = base.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l"))
    tf = (
        base.select("doc_id", "dl", F.explode("ws").alias("w"))
        .filter(F.col("w").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_u", F.expr(f"((2*n - 2*df + 1) * {S}) div (2*df + 1)"))
        .withColumn(
            "tfp_u", F.expr(f"(22*tf*l*{S}) div (10*tf*l + 3*l + 9*dl*n)")
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            F.sum(F.expr(f"(idf_u * tfp_u) div {S}")).alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

SQL_BM25_TOPK = f"""
WITH base AS (
  SELECT doc_id, len({_WS}) AS dl, {_WS} AS ws FROM documents),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l FROM base),
tf AS (
  SELECT doc_id, dl, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(ws) AS w FROM base)
  WHERE w IN ({_TERMS_SQL})
  GROUP BY doc_id, dl, w),
dfreq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         ((2*s.n - 2*d.df + 1) * {BM25_SCALE}) // (2*d.df + 1) AS idf_u,
         (22*tf.tf*s.l*{BM25_SCALE}) // (10*tf.tf*s.l + 3*s.l + 9*tf.dl*s.n)
           AS tfp_u
  FROM tf JOIN dfreq d USING (w) CROSS JOIN stats s)
SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
       CAST(sum((idf_u * tfp_u) // {BM25_SCALE}) AS BIGINT) AS score_micro
FROM scored GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# Incremental index maintenance — the nightly-crawl shape: a standing
# inverted index (a catalog table) is refreshed from ONE crawl round's
# appends via the catalog's changelog read, never by re-tokenizing the
# corpus. The merge is exact because the index row is a pair of
# distributive aggregates (df, total_tf are sums over disjoint doc sets)
# plus a posting list whose keep-rule is monotone: merged df <= the
# elision threshold implies BOTH constituent dfs were, so both lists
# exist and their sorted concat IS the rebuilt list (doc_ids are unique
# across batches). Scale shape: the delta tokenization scans only the
# new snapshot's files (structural file pruning, same proof as
# catalog_incremental_read); the merge joins two VOCABULARY-sized
# tables (Zipf-bounded), not corpora. The contract oracle is the full
#-corpus index SQL — incremental == rebuild, hash-exact.
# ---------------------------------------------------------------------------
def _index_arrays(docs: DataFrame) -> DataFrame:
    """(w, df, total_tf, plist): index rows with array postings (null
    when elided) — the standing-table representation."""
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    tf = toks.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    sel = stats.filter(F.col("df") <= POSTINGS_MAX_DF).select("w")
    lists = (
        tf.join(sel, "w", "left_semi")
        .groupBy("w")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("plist"))
    )
    return stats.join(lists, "w", "left").select("w", "df", "total_tf", "plist")


def q_inverted_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: build the standing index over the first two
    document batches, persist it as a catalog table, then fold in the
    third batch via ``read_delta`` (only the delta files are scanned)
    and return the merged index — byte-equal to a full rebuild."""
    import tempfile

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..catalog import Catalog

    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    idx_schema = StructType(
        [
            StructField("w", StringType()),
            StructField("df", LongType()),
            StructField("total_tf", LongType()),
            StructField("plist", ArrayType(LongType())),
        ]
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cat = Catalog(spark, tempfile.mkdtemp(prefix="invidx_wh_"))
    for k in range(3):
        cat.append(
            "docs_h",
            docs.filter(F.col("doc_id") % 3 == k).repartition(4, "doc_id"),
        )
    # standing index over snapshots 0-1, persisted like a nightly job's
    cat.append("inv_idx", _index_arrays(cat.read("docs_h", doc_schema, snapshot=1)))
    standing = cat.read("inv_idx", idx_schema)
    delta = _index_arrays(cat.read_delta("docs_h", doc_schema, snapshot=2))
    empty = F.array().cast("array<long>")
    merged = (
        standing.select("w", "df", "total_tf", "plist")
        .join(
            delta.select(
                F.col("w"),
                F.col("df").alias("ddf"),
                F.col("total_tf").alias("dtf"),
                F.col("plist").alias("dplist"),
            ),
            "w",
            "full_outer",
        )
        .select(
            "w",
            (F.coalesce("df", F.lit(0)) + F.coalesce("ddf", F.lit(0))).alias("mdf"),
            (
                F.coalesce("total_tf", F.lit(0)) + F.coalesce("dtf", F.lit(0))
            ).alias("mtf"),
            F.array_sort(
                F.concat(F.coalesce("plist", empty), F.coalesce("dplist", empty))
            ).alias("mplist"),
        )
    )
    return merged.select(
        F.col("w").alias("term"),
        F.col("mdf").alias("df"),
        F.col("mtf").alias("total_tf"),
        F.when(
            F.col("mdf") <= POSTINGS_MAX_DF,
            F.concat_ws(
                ",", F.transform("mplist", lambda x: x.cast("string"))
            ),
        ).alias("postings"),
    )


QUERIES = {
    "inverted_index_postings": (q_inverted_index_postings, SQL_INVERTED_INDEX),
    "inverted_index_incremental": (
        q_inverted_index_incremental,
        SQL_INVERTED_INDEX,
    ),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
}
