"""Change-rate-driven revisit rounds: refetch URLs when their estimated
change interval says they are due.

The reference refreshes on a fixed recency horizon (every channel whose
``recent`` flag is set is rescanned each run — the frontier scans in
Utils/Nox_Crawler.py / New_YouTube_Crawler.py). At 10^10 URLs a crawler
estimates each page's change rate from its OWN fetch history instead
(Cho & Garcia-Molina's refresh policies); the engine already has the
history — the spans table accumulates one observation row per (url,
round) — so the estimator is the same window + aggregation as
``operators/scheduling.q_recrawl_schedule``, with the crawl round as the
clock and ``xxhash64(to_json(spans))`` as the content fingerprint.

``run_revisit`` is an auxiliary flow BETWEEN crawls, deliberately not
wired into the main round loop (whose stop-on-seen semantics are
reference-parity-pinned): it builds the due frontier from the catalog,
reuses the round machinery's politeness admission and salted-bucket
batch fetch verbatim — robots and crawl-delay budgets apply to revisits
exactly as to discovery fetches — and appends the new observations as
ordinary spans + seen snapshots (zero-copy manifest append, same as the
round pipeline). Everything is data-derived and deterministic: two
identical warehouses produce byte-identical revisit commits
(tests/test_revisit.py pins digests).

Scale shape: the estimator is one window + one same-key aggregation on
doc_id (one shuffle); the frontier build re-canonicalizes only DUE urls;
fetch is the existing one-Exchange -> fused-Arrow stage. Nothing here
collects per-URL state to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import Catalog
from ..config import CrawlConfig
from ..functions.canonical import with_canonical
from ..operators.fetch import FETCHED, fetch_stage
from ..operators.politeness import split_admitted, split_robots_excluded
from ..operators.seen import as_seen_rows
from ..schema import ROBOTS, SPANS_DOC
from .round import FRONTIER_COLS, _part_by_hash

# intervals are measured in crawl rounds (the engine's clock); a page
# never seen changing waits the maximum, a churning page is re-eligible
# every round (politeness still gates the actual fetch)
MIN_INTERVAL_ROUNDS = 1
MAX_INTERVAL_ROUNDS = 64


def revisit_schedule(spans: DataFrame) -> DataFrame:
    """Per-URL change-rate estimate over the span observation history:
    (doc_id, host, n_obs, n_changes, last_round, interval_rounds,
    due_round)."""
    obs = spans.select(
        "doc_id",
        "host",
        "round",
        F.xxhash64(F.to_json(F.col("spans"))).alias("content_fp"),
    )
    w = Window.partitionBy("doc_id").orderBy("round")
    hist = obs.select(
        "doc_id",
        "host",
        "round",
        (~F.col("content_fp").eqNullSafe(F.lag("content_fp").over(w)))
        .cast("int")
        .alias("chg"),
        F.row_number().over(w).alias("rn"),
    )
    agg = hist.groupBy("doc_id").agg(
        F.min("host").alias("host"),  # functionally dependent on doc_id; min is order-stable
        F.count("*").alias("n_obs"),
        F.sum(F.when(F.col("rn") > 1, F.col("chg")).otherwise(0)).alias("n_changes"),
        F.min("round").alias("first_round"),
        F.max("round").alias("last_round"),
    )
    est = F.when(F.col("n_changes") == 0, F.lit(MAX_INTERVAL_ROUNDS)).otherwise(
        F.least(
            F.greatest(
                F.expr("(last_round - first_round) div greatest(n_changes, 1)"),
                F.lit(MIN_INTERVAL_ROUNDS),
            ),
            F.lit(MAX_INTERVAL_ROUNDS),
        )
    )
    return agg.select(
        "doc_id",
        "host",
        "n_obs",
        "n_changes",
        "last_round",
        est.cast("int").alias("interval_rounds"),
        (F.col("last_round") + est).cast("int").alias("due_round"),
    )


def revisit_frontier(cat: Catalog, now_round: int) -> DataFrame:
    """FRONTIER-schema rows for every URL due at ``now_round``. seq =
    url_hash: a deterministic, data-derived priority that needs no global
    ordering pass (revisits have no parent link index)."""
    due = revisit_schedule(cat.read("spans", SPANS_DOC)).filter(
        F.col("due_round") <= F.lit(int(now_round))
    )
    return (
        due.select(F.col("doc_id").alias("url"))
        .transform(with_canonical)
        .select(
            "url",
            "url_hash",
            "host",
            F.lit(0).cast("int").alias("depth"),
            F.col("url_hash").alias("seq"),
            F.lit(int(now_round)).cast("int").alias("round"),
            F.lit(0).cast("int").alias("attempt"),
            F.lit(None).cast("string").alias("parent"),
        )
    )


def run_revisit(
    spark: SparkSession, cat: Catalog, cfg: CrawlConfig, now_round: int
) -> dict:
    """One revisit round: due frontier -> robots + politeness admission ->
    batch fetch -> spans/seen append. Returns summary counts. Commits
    ordinary catalog snapshots (time-traveled like any other); run it
    between crawls — the next crawl's checkpoint protocol picks up the
    post-revisit snapshot ids."""
    robots = cat.read("robots", ROBOTS)
    frontier = revisit_frontier(cat, now_round)
    allowed, _excluded, _ = split_robots_excluded(frontier, robots)
    admitted, deferred = split_admitted(allowed.select(*FRONTIER_COLS), robots, cfg)
    admitted = admitted.withColumn("fingerprint", F.hash(F.col("url")))
    sid = cat.overwrite(
        "fetched",
        fetch_stage(admitted, cfg, now_round).sortWithinPartitions(
            "host", F.col("depth").desc(), "seq", "url_hash"
        ),
        meta={"round": int(now_round), "revisit": True},
    )
    cat.append_files(
        "spans",
        "fetched",
        sid,
        meta={"round": int(now_round), "revisit": True},
        column_map={"doc_id": "url", "round": "fetch_round"},
        row_filter="ok",
    )
    ok = cat.read("fetched", FETCHED).filter(F.col("ok"))
    cat.append(
        "seen",
        _part_by_hash(
            as_seen_rows(ok, cfg.seen_buckets, now_round), cfg.frontier_partitions
        ),
        meta={"round": int(now_round), "revisit": True},
    )
    return {
        "round": int(now_round),
        "admitted": admitted.count(),
        "deferred": deferred.count(),
        "refetched_ok": ok.count(),
    }
