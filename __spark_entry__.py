"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl pipeline end-to-end on a deterministic
synthetic web and returns the interleaved span documents. ``queries`` /
``oracle_sql`` expose the engine's operator battery (SURVEY.md §2 +
training-data ops), every entry with an exact DuckDB oracle (a module
may mark a pair rows-only via SQL=None; as of round 2 none do — the
binary multimodal stage is checked by an analytic SQL mirror and the
centroid assignment by fixed-point integer-exact math).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: a two-round crawl — frontier dedup (bloom+anti-join),
    robots + politeness budget admission, salted host-bucket batch fetch,
    interleaved span extraction — returning the spans table exploded to
    one row per span (doc_id, offset, kind, text, media_ref)."""
    from swmaestro_crawler_spark.config import CrawlConfig
    from swmaestro_crawler_spark.plans.crawl import Crawl
    from swmaestro_crawler_spark.schema import SPANS_DOC
    from swmaestro_crawler_spark.sources.synth_web import make_seeds

    cfg = CrawlConfig(
        round_seconds=6.0,
        max_rounds=2,
        max_depth=2,
        frontier_partitions=8,
        bloom_bits=1 << 18,
        synth_n_hosts=20,
        warehouse=tempfile.mkdtemp(prefix="crawl_wh_"),
    )
    crawl = Crawl(spark, cfg)
    crawl.run(spark.createDataFrame(make_seeds(cfg, 40)), rounds=cfg.max_rounds)
    spans = crawl.cat.read("spans", SPANS_DOC)
    return spans.select(
        "doc_id",
        F.col("round"),
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        "round",
        F.col("span.offset").alias("offset"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )


def _all_modules():
    from swmaestro_crawler_spark.functions import html_extract
    from swmaestro_crawler_spark.operators import (
        curation,
        dedup,
        graph,
        kmeans,
        multimodal,
        packing,
        pq,
        relational,
        scheduling,
        scoretable,
        search,
        similarity,
        sketches,
        text_analysis,
        urlspace,
        zorder,
    )
    from swmaestro_crawler_spark.streaming import (
        exactly_once,
        sessionize,
        stream_metrics,
    )

    return (
        relational,
        scheduling,
        dedup,
        graph,
        scoretable,
        search,
        text_analysis,
        curation,
        similarity,
        kmeans,
        pq,
        sketches,
        urlspace,
        zorder,
        packing,
        multimodal,
        html_extract,
        stream_metrics,
        sessionize,
        exactly_once,
    )


# Keys with no driver CORRECTNESS row in rounds 1-3 (the driver samples
# ~50 keys in dict order per round, so never-checked keys must come
# first; VERDICT r3 "Next round" item 2). Once CORRECTNESS_r04 lands,
# the union r01-r04 covers every contract query.
_NEVER_CHECKED_FIRST = (
    "catalog_schema_evolution",
    "inverted_index_incremental",
    "kmv_set_ops",
    "label_propagation_communities",
    "scd2_dimension",
    "dedup_ppjoin_pairs",
    "batch_sessionize",
    "pps_systematic_sample",
    "quantile_sketch",
    "dsir_importance_topk",
    "pq_codes",
    "pq_adc_topk",
    "pq_adc_recall",
    "bm25_topk",
    "inverted_index_postings",
    "hits_purchase_graph",
    "table_profile",
    "catalog_time_travel",
    "catalog_incremental_read",
    "catalog_takedown",
    "boilerplate_removal",
    "dupspan_removal",
    "dedup_cluster_representatives",
    "adaptive_backoff_factors",
    "opic_score_table",
    "multimodal_av_probe",
    "quality_classifier",
    "host_reputation",
    "lsh_bucket_stats",
    "embedding_int8_quantize",
    "kmeans_centroids",
    "ann_ivf_recall",
    "ann_ivf_topk",
    "semantic_dedup",
    "hll_distinct",
    "kmv_distinct",
    "countmin_heavy_hitters",
    "url_trap_templates",
    "boilerplate_ngrams",
    "zorder_locality",
    "corpus_shard_pack",
    "streaming_dedup_exact",
    "streaming_stream_join",
    "streaming_exactly_once_sink",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    flat: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _all_modules():
        for name, (fn, _sql) in mod.QUERIES.items():
            flat[name] = fn
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _NEVER_CHECKED_FIRST:
        if name in flat:
            out[name] = flat.pop(name)
    out.update(flat)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _all_modules():
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
