"""The crawl driver loop: rounds + checkpoint + byte-identical resume.

Replaces the reference supervisor's poll-queue-until-empty loop
(supervisor.py:70-92,128-138,162-194) with a driver-side round loop whose
termination aggregate is ``pending.count() == 0`` (SURVEY.md A3/C5).

Checkpoint protocol (per committed round):
  1. every table append/overwrite commits an atomic snapshot (catalog.py)
  2. the bloom bitmap is persisted to ``bloom-r{r}.npy``
  3. ``_crawl_checkpoint.json`` is replaced atomically LAST, recording the
     round and each table's snapshot id
Resume rolls every table back to the checkpoint's snapshot ids and re-runs
from the next round. Because every stage is deterministic (pure-function
transport, data-derived ordering, fixed partitioning), the re-run writes
byte-identical files — verified by tests/test_resume.py.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from ..config import CrawlConfig
from ..functions.canonical import with_canonical
from ..operators.politeness import synth_robots
from ..operators.seen import empty_bloom
from ..schema import FRONTIER, ROBOTS, SEEN
from .round import (
    FRONTIER_COLS,
    RoundResult,
    _part_by_hash,
    finish_round,
    run_round_critical,
)

TABLES = (
    "pending",
    "seen",
    "spans",
    "dead",
    "crawl_order",
    "metrics",
    "robots",
    "fetched",
    "lineage",
    "link_scores",
    "host_stats",
    "observations",
)


def warehouse_views() -> dict:
    """table -> declared schema for every standard warehouse table: the
    registry behind ``Catalog.register_views`` — the engine's plain-SQL
    query surface over a crawl warehouse (the reference's consumers are
    all psycopg2 SELECTs over its PostgreSQL tables)."""
    from ..operators.fetch import FETCHED
    from ..operators.scoretable import SCORES
    from ..schema import (
        CRAWL_ORDER,
        DEAD,
        HOST_STATS,
        LINEAGE,
        METRICS,
        OBSERVATIONS,
        SPANS_DOC,
    )
    from .media import MEDIA_BLOBS, MEDIA_REFS

    return {
        "pending": FRONTIER,
        "seen": SEEN,
        "spans": SPANS_DOC,
        "dead": DEAD,
        "crawl_order": CRAWL_ORDER,
        "metrics": METRICS,
        "robots": ROBOTS,
        "fetched": FETCHED,
        "lineage": LINEAGE,
        "link_scores": SCORES,
        "host_stats": HOST_STATS,
        "observations": OBSERVATIONS,
        "media_refs": MEDIA_REFS,
        "media_blobs": MEDIA_BLOBS,
    }


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """Seed rows -> round-0 frontier. Priority within a host follows seed
    rank (Utils/Nox_Crawler.py:98-113: top-500 rank orders)."""
    return (
        seeds.transform(with_canonical)
        .select(
            "url",
            "url_hash",
            "host",
            F.lit(0).cast("int").alias("depth"),
            F.col("rank").cast("long").alias("seq"),
            F.lit(0).cast("int").alias("round"),
            F.lit(0).cast("int").alias("attempt"),
            F.lit(None).cast("string").alias("parent"),
        )
    )


class Crawl:
    def __init__(self, spark: SparkSession, cfg: CrawlConfig):
        self.spark = spark
        self.cfg = cfg
        self.cat = Catalog(spark, cfg.warehouse)

    # -- checkpoint ----------------------------------------------------------
    @property
    def _ckpt_path(self) -> str:
        return os.path.join(self.cat.warehouse, "_crawl_checkpoint.json")

    def _bloom_path(self, r: int) -> str:
        return os.path.join(self.cat.warehouse, f"bloom-r{r}.npy")

    def _cuckoo_path(self, r: int) -> str:
        return os.path.join(self.cat.warehouse, f"cuckoo-r{r}.npy")

    def _write_checkpoint(
        self,
        r: int,
        bloom: np.ndarray,
        sids: dict[str, int] | None = None,
        cuckoo_tables: np.ndarray | None = None,
    ) -> None:
        """``sids`` pins per-table snapshot ids AS OF round r — required
        when the round's deferred bookkeeping overlaps the next round
        (current_snapshot would already be round r+1's); tables absent
        from sids fall back to current (bootstrap/requeue paths, where
        nothing runs concurrently)."""
        sids = sids or {}
        np.save(self._bloom_path(r), bloom)
        ckpt = {
            "round": r,
            "snapshots": {
                t: sids.get(t, self.cat.current_snapshot(t)) for t in TABLES
            },
            "bloom": os.path.basename(self._bloom_path(r)),
        }
        if cuckoo_tables is not None:
            np.save(self._cuckoo_path(r), cuckoo_tables)
            ckpt["cuckoo"] = os.path.basename(self._cuckoo_path(r))
        tmp = self._ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ckpt, f, indent=1, sort_keys=True)
        os.replace(tmp, self._ckpt_path)

    def _load_checkpoint(self) -> dict | None:
        if not os.path.exists(self._ckpt_path):
            return None
        with open(self._ckpt_path) as f:
            return json.load(f)

    def register_consistent_views(self, prefix: str = "") -> dict[str, int]:
        """SQL views over the last CHECKPOINTED round's per-table snapshot
        ids — a cross-table-consistent read of the warehouse. The plain
        ``Catalog.register_views`` pins each table independently at call
        time, which can tear across the concurrently-committing deferred
        bookkeeping of the next round (e.g. spans already shows round
        r+1 while crawl_order still shows r); the checkpoint's sids were
        captured atomically AS OF one round, so views registered from
        them always agree. Returns the pinned {table: snapshot} map."""
        ckpt = self._load_checkpoint()
        if ckpt is None:
            raise RuntimeError(
                "no checkpoint yet — bootstrap or run the crawl first"
            )
        views = warehouse_views()
        pinned: dict[str, int] = {}
        for t, sid in ckpt["snapshots"].items():
            if t in views:
                self.cat.read(t, views[t], snapshot=sid).createOrReplaceTempView(
                    prefix + t
                )
                pinned[t] = sid
        return pinned

    # -- lifecycle -------------------------------------------------------------
    def bootstrap(
        self,
        seeds: DataFrame | None = None,
        robots: DataFrame | None = None,
        frontier: DataFrame | None = None,
    ) -> None:
        """Initialize crawl state (round -1 checkpoint = empty-but-seeded).
        Either ``seeds`` (rank-ordered seed rows) or a pre-built FRONTIER
        DataFrame may be supplied (the latter for bulk synthetic frontiers
        generated JVM-side, e.g. the scaling bench)."""
        robots = robots if robots is not None else synth_robots(self.spark, self.cfg)
        self.cat.overwrite("robots", robots.repartition(1).sortWithinPartitions("host"))
        if frontier is None:
            frontier = seeds_to_frontier(seeds)
        self.cat.overwrite(
            "pending",
            _part_by_hash(frontier, self.cfg.frontier_partitions).sortWithinPartitions(
                "url_hash", "attempt", "depth", "seq", "parent"
            ),
            meta={"round": 0},
        )
        for t in (
            "seen",
            "spans",
            "dead",
            "crawl_order",
            "metrics",
            "fetched",
            "lineage",
            "link_scores",
            "host_stats",
        ):
            # materialize an empty snapshot 0 so resume rollback has a target
            self.cat._commit_manifest(
                t, {"snapshots": [{"id": 0, "files": [], "meta": {}}], "current": 0}
            )
        if self.cfg.score_admission and self.cfg.score_table:
            # edges injected with the bootstrap frontier are discoveries
            # too: log their OPIC contributions so round 0's admission
            # already ranks by them (operators/scoretable)
            from ..operators.scoretable import append_contributions

            append_contributions(self.cat, frontier, -1)
        self._write_checkpoint(
            -1, empty_bloom(self.cfg.bloom_bits), cuckoo_tables=self._empty_cuckoo()
        )

    def _empty_cuckoo(self) -> np.ndarray | None:
        if self.cfg.cuckoo_buckets is None:
            return None
        from ..operators.cuckoo import PartitionedCuckoo

        return PartitionedCuckoo.empty(
            self.cfg.cuckoo_parts, self.cfg.cuckoo_buckets, self.cfg.cuckoo_slots
        ).tables

    def resume_or_bootstrap(self, seeds: DataFrame) -> tuple[int, np.ndarray, object]:
        """Returns (next_round, bloom, cuckoo | None). Rolls tables back
        to the last committed checkpoint if a later, uncommitted round
        left appends. The cuckoo tier resumes from its checkpointed
        tables; a warehouse checkpointed before the tier was enabled
        rebuilds them from the (rolled-back) seen table — one
        distributed pass, FN-free like any other path."""
        ckpt = self._load_checkpoint()
        if ckpt is None:
            self.bootstrap(seeds)
            ckpt = self._load_checkpoint()
        for t, sid in ckpt["snapshots"].items():
            if self.cat.current_snapshot(t) != sid:
                self.cat.rollback(t, sid)
        bloom = np.load(os.path.join(self.cat.warehouse, ckpt["bloom"]))
        cuckoo = None
        if self.cfg.cuckoo_buckets is not None:
            from ..operators.cuckoo import PartitionedCuckoo, build_cuckoo_increment

            want_shape = self._empty_cuckoo().shape  # (P, B, S) from cfg
            if "cuckoo" in ckpt:
                loaded = np.load(os.path.join(self.cat.warehouse, ckpt["cuckoo"]))
                if loaded.shape == want_shape:
                    cuckoo = PartitionedCuckoo(loaded)
                else:
                    # config changed since the checkpoint (e.g. the user
                    # enlarged the filter after an over-capacity error):
                    # resuming with the old undersized tables would hit
                    # the same failure with no hint why. Rebuild at the
                    # NEW shape from the rolled-back seen table — the
                    # same FN-free path pre-tier checkpoints take.
                    import warnings

                    warnings.warn(
                        f"checkpointed cuckoo shape {loaded.shape} != configured "
                        f"{want_shape}; rebuilding the tier from the seen table",
                        stacklevel=2,
                    )
                    cuckoo = build_cuckoo_increment(
                        self.cat.read("seen", SEEN).select("url_hash"),
                        PartitionedCuckoo(self._empty_cuckoo()),
                    )
            else:
                cuckoo = build_cuckoo_increment(
                    self.cat.read("seen", SEEN).select("url_hash"),
                    PartitionedCuckoo(self._empty_cuckoo()),
                )
        return ckpt["round"] + 1, bloom, cuckoo

    def requeue_dead(self, reason: str = "max_attempts") -> int:
        """Drain the dead-letter table back into the frontier — the
        reference's dead-queue drainers republish failed ids for another
        pass (channel_updater_dead at
        New_YouTube_Crawler_Channel_Updater_Error.py:31-56,
        video_crawler_dead at New_YouTube_Crawler_proxy_APP_Error.py:26-51).
        Requeued rows restart with attempt=0; the dead table keeps only
        the other reasons. Returns rows requeued."""
        from ..schema import DEAD
        from .round import FRONTIER_COLS, _part_by_hash

        dead = self.cat.read("dead", DEAD)
        requeue = dead.filter(F.col("reason") == reason)
        keep = dead.filter(F.col("reason") != reason)
        pending = self.cat.read("pending", FRONTIER)
        revived = requeue.select(*FRONTIER_COLS).withColumn(
            "attempt", F.lit(0).cast("int")
        )
        # count the requeued rows DIRECTLY (tiny table). Differencing the
        # new pending snapshot against the previous one is wrong once
        # expire_snapshots has dropped it (data_files -> [] -> silent 0).
        n = revived.count()
        merged = _part_by_hash(
            pending.unionByName(revived), self.cfg.frontier_partitions
        ).sortWithinPartitions("url_hash", "attempt", "depth", "seq", "parent")
        self.cat.overwrite("pending", merged)
        self.cat.overwrite("dead", _part_by_hash(keep, 1))
        # fold the requeue into the checkpoint, else a later resume would
        # roll pending/dead back and silently undo it
        ckpt = self._load_checkpoint()
        if ckpt is not None:
            bloom = np.load(os.path.join(self.cat.warehouse, ckpt["bloom"]))
            cuckoo_tables = (
                np.load(os.path.join(self.cat.warehouse, ckpt["cuckoo"]))
                if "cuckoo" in ckpt
                else None
            )
            self._write_checkpoint(ckpt["round"], bloom, cuckoo_tables=cuckoo_tables)
        return n

    def run(self, seeds: DataFrame, rounds: int | None = None) -> list[RoundResult]:
        """Run (or resume) the crawl for up to ``rounds`` rounds.

        Round r's DEFERRED bookkeeping (crawl_order, dead, metrics,
        lineage, checkpoint — none of which round r+1 consumes) overlaps
        round r+1's fetch (VERDICT r2 item 5): the critical phase
        returns as soon as pending/seen/bloom are committed, and a
        single-worker executor finishes rounds strictly in order, so
        checkpoints are written oldest-first from each round's CAPTURED
        snapshot ids and a kill can only lose the (deterministically
        re-runnable) newest rounds. Set cfg.overlap_bookkeeping=False to
        serialize (the pre-overlap behavior)."""
        from concurrent.futures import ThreadPoolExecutor

        rounds = rounds if rounds is not None else self.cfg.max_rounds
        start, bloom, cuckoo = self.resume_or_bootstrap(seeds)
        robots = self.cat.read("robots", ROBOTS)
        # robots TTL revalidation epoch currently in the table: 0 for a
        # fresh bootstrap; unknown after a resume (-1 forces the first
        # loop pass to re-fetch — idempotent, the bodies are a pure
        # function of (host, epoch), and the dimension is tiny)
        robots_epoch = 0 if start == 0 else -1

        def _finish(h) -> RoundResult:
            res = finish_round(self.cat, h)
            self._write_checkpoint(h.round, h.bloom, h.sids, h.cuckoo_tables)
            return res

        futures = []
        with ThreadPoolExecutor(max_workers=1, thread_name_prefix="bk-finish") as fin:
            for r in range(start, rounds):
                if self.cat.row_count("pending") == 0:
                    break  # frontier drained — reference: queue len == 0
                    # (footer stats; pending was committed by the prior
                    # round's CRITICAL phase, so no wait is needed)
                if self.cfg.robots_ttl_rounds:
                    epoch = r // self.cfg.robots_ttl_rounds
                    if epoch != robots_epoch:
                        # TTL expired: re-fetch + re-parse every host's
                        # robots.txt (the same body->parse chain as the
                        # bootstrap) and overwrite the dimension — the
                        # new rules/delays bind from THIS round on
                        from ..operators.politeness import synth_robots

                        self.cat.overwrite(
                            "robots",
                            synth_robots(self.spark, self.cfg, epoch)
                            .repartition(1)
                            .sortWithinPartitions("host"),
                        )
                        robots = self.cat.read("robots", ROBOTS)
                        robots_epoch = epoch
                h = run_round_critical(
                    self.spark, self.cat, self.cfg, r, robots, bloom, cuckoo
                )
                if (
                    self.cfg.score_admission
                    and self.cfg.score_table
                    and self.cfg.score_compact_every
                    and (r + 1) % self.cfg.score_compact_every == 0
                ):
                    # The round's contribution append is CRITICAL (round
                    # r+1 reads it), so the log is complete here. The
                    # compacted snapshot is read-identical, so a crash
                    # before the next checkpoint merely rolls current
                    # back to the pre-compaction snapshot — compaction
                    # re-runs, nothing is lost (scoretable docstring).
                    from ..operators.scoretable import compact_scores

                    compact_scores(self.cat)
                if self.cfg.overlap_bookkeeping:
                    futures.append(fin.submit(_finish, h))
                else:
                    futures.append(fin.submit(_finish, h))
                    futures[-1].result()
            return [f.result() for f in futures]
