"""Snapshot-versioned parquet table layer (Iceberg stand-in).

The sandbox has no Iceberg runtime jar and no network to fetch one
(SURVEY.md §7.1), so this module emulates the subset the engine needs —
append / overwrite with ATOMIC snapshot commit and snapshot-id time
travel — over partitioned parquet plus a ``_snapshots.json`` manifest.
Commit protocol: data files are written to a staging directory first,
then the manifest is replaced via ``os.replace`` (atomic on POSIX), so a
killed job never exposes a half-written snapshot — the property
byte-identical resume depends on. In production, swap ``Catalog`` for a
real Iceberg catalog (``spark.sql.catalog.crawl =
org.apache.iceberg.spark.SparkCatalog``); engine code only talks to this
API, never to paths.

This replaces the reference's PostgreSQL persistence + per-unit
transaction commit (autocommit=False ... conn.commit() at
New_YouTube_Crawler.py:210,275, New_YouTube_Crawler_Comment.py:386,439).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class CommitConflict(RuntimeError):
    """A commit planned against snapshot S found the table moved past S
    (another writer landed first). Retry by re-planning against the new
    current snapshot — rebasing blindly could resurrect rows the planned
    rewrite no longer accounts for."""


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    # -- commit isolation -----------------------------------------------------
    # Manifest writes are atomic (os.replace), but read-modify-write is not:
    # two concurrent appends that both load current=N would both commit N+1
    # and one snapshot would vanish. Every commit therefore re-loads the
    # manifest UNDER a per-table lock and mutates that fresh state — appends
    # rebase for free (their data files are already on disk; only the
    # manifest entry moves), while read-dependent commits (merge) instead
    # verify their planned base is still current and raise CommitConflict.
    # The lock is an O_CREAT|O_EXCL file carrying the holder pid — atomic on
    # POSIX, reclaimable when the holder died mid-commit (resume path). On a
    # real cluster this CAS lives in the metastore; the file stands in for
    # it with identical semantics on one node.
    LOCK_TIMEOUT_S = 60.0

    @contextlib.contextmanager
    def _commit_lock(self, table: str):
        os.makedirs(self._dir(table), exist_ok=True)
        path = os.path.join(self._dir(table), "_commit.lock")
        deadline = time.monotonic() + self.LOCK_TIMEOUT_S
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                break
            except FileExistsError:
                try:
                    holder = int(open(path).read() or -1)
                except (OSError, ValueError):
                    holder = -1
                if holder > 0 and holder != os.getpid():
                    try:
                        os.kill(holder, 0)
                    except ProcessLookupError:  # holder died mid-commit
                        with contextlib.suppress(OSError):
                            os.unlink(path)
                        continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock on {table} held by {holder}")
                time.sleep(0.01)
        try:
            yield
        finally:
            os.close(fd)
            with contextlib.suppress(OSError):
                os.unlink(path)

    def _locked_commit(self, table: str, mutate) -> int:
        """Run ``mutate(manifest) -> sid`` against freshly-loaded manifest
        state under the table's commit lock, then publish atomically."""
        with self._commit_lock(table):
            m = self._load_manifest(table)
            sid = mutate(m)
            self._commit_manifest(table, m)
            return sid

    # -- manifest helpers ---------------------------------------------------
    def _dir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._dir(table), "_snapshots.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"snapshots": [], "current": -1}
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, table: str, manifest: dict) -> None:
        os.makedirs(self._dir(table), exist_ok=True)
        tmp = self._manifest_path(table) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point

    # -- branches (write-audit-publish) --------------------------------------
    # ``main`` is the manifest's ``current`` pointer; named branches live in
    # ``refs`` as extra snapshot pointers. Snapshot ids are unique across
    # branches (``_next_sid``), each commit records its ``parent``, and
    # ``publish`` fast-forwards main only when main is an ancestor of the
    # branch head — the Iceberg WAP workflow: stage a round's commits on an
    # audit branch, validate counts/invariants against the staged snapshot,
    # then publish atomically (or drop the branch and nothing ever showed
    # on main).
    @staticmethod
    def _next_sid(m: dict) -> int:
        ids = [s["id"] for s in m["snapshots"]]
        return max([m["current"], *ids], default=m["current"]) + 1

    @staticmethod
    def _base_sid(m: dict, branch: str | None) -> int:
        if branch is None:
            return m["current"]
        refs = m.get("refs", {})
        if branch not in refs:
            raise KeyError(f"unknown branch {branch!r}")
        return refs[branch]

    def create_branch(
        self, table: str, name: str, at_snapshot: int | None = None
    ) -> int:
        """Create (or reset) a named branch pointing at ``at_snapshot``
        (default: current main)."""

        def mutate(m: dict) -> int:
            at = m["current"] if at_snapshot is None else at_snapshot
            m.setdefault("refs", {})[name] = at
            return at

        return self._locked_commit(table, mutate)

    def tag(self, table: str, name: str, snapshot: int | None = None) -> int:
        """Pin an IMMUTABLE named tag to a snapshot (default: current
        main) — the Iceberg tag: "dataset release v1" pins the exact
        corpus bytes a model trained on. Unlike a branch, a tag cannot
        move (re-tagging an existing name raises) and the tagged
        snapshot survives ``expire_snapshots`` until the tag is
        dropped, so the release stays reproducible while the rest of
        the history is garbage-collected."""

        def mutate(m: dict) -> int:
            tags = m.setdefault("tags", {})
            if name in tags:
                raise ValueError(
                    f"{table}: tag {name!r} already pins snapshot "
                    f"{tags[name]} — tags are immutable (drop_tag first)"
                )
            at = m["current"] if snapshot is None else snapshot
            if not any(s["id"] == at for s in m["snapshots"]):
                raise KeyError(f"{table}@{at}: no such snapshot to tag")
            tags[name] = at
            return at

        return self._locked_commit(table, mutate)

    def drop_tag(self, table: str, name: str) -> None:
        """Release a tag (the snapshot becomes expirable again)."""

        def mutate(m: dict) -> int:
            m.get("tags", {}).pop(name, None)
            return m["current"]

        self._locked_commit(table, mutate)

    def resolve_tag(self, table: str, name: str) -> int:
        """Snapshot id a tag pins (pass to ``read(snapshot=...)``)."""
        tags = self._load_manifest(table).get("tags", {})
        if name not in tags:
            raise KeyError(f"{table}: unknown tag {name!r}")
        return tags[name]

    def drop_branch(self, table: str, name: str) -> None:
        """Abandon a branch (its staged snapshots stay in the manifest for
        time travel until expire, but nothing references them)."""

        def mutate(m: dict) -> int:
            m.get("refs", {}).pop(name, None)
            return m["current"]

        self._locked_commit(table, mutate)

    def publish(self, table: str, branch: str) -> int:
        """Fast-forward main to the branch head. Requires main to be an
        ancestor of the head (nothing landed on main since the fork) —
        otherwise raises :class:`CommitConflict` and the caller re-stages
        against the new main. Deletes the branch ref on success."""

        def mutate(m: dict) -> int:
            head = self._base_sid(m, branch)
            by_id = {s["id"]: s for s in m["snapshots"]}
            cur = head
            while cur != m["current"]:
                parent = by_id.get(cur, {}).get("parent")
                if parent is None:
                    raise CommitConflict(
                        f"publish: main {table}@{m['current']} is not an "
                        f"ancestor of branch {branch!r}@{head} — re-stage"
                    )
                cur = parent
            m["current"] = head
            m.get("refs", {}).pop(branch, None)
            return head

        return self._locked_commit(table, mutate)

    # -- public API ----------------------------------------------------------
    def exists(self, table: str) -> bool:
        return os.path.exists(self._manifest_path(table))

    def current_snapshot(self, table: str, branch: str | None = None) -> int:
        return self._base_sid(self._load_manifest(table), branch)

    def _write_files(self, table: str, df: DataFrame) -> tuple[list[str], int]:
        """Stage-write then move into place; returns (files, rows) — the
        row count comes free from the parquet footers (Iceberg records
        the same stat in its manifests)."""
        stage = self.new_stage(table)
        df.write.mode("overwrite").parquet(stage)
        return self._adopt_stage(table, stage)

    def new_stage(self, table: str) -> str:
        """A fresh staging directory under the table dir — either
        ``df.write`` (``_write_files``) or executor-side direct parquet
        writers (operators/fetch.fetch_stage_direct) fill it; the files
        become a snapshot via ``overwrite_stage``/``_adopt_stage``."""
        stage = os.path.join(self._dir(table), f"stage-{uuid.uuid4().hex}")
        os.makedirs(stage, exist_ok=True)
        return stage

    def _adopt_stage(self, table: str, stage: str) -> tuple[list[str], int]:
        import pyarrow.parquet as pq

        data_dir = os.path.join(self._dir(table), "data")
        os.makedirs(data_dir, exist_ok=True)
        files, file_rows = [], []
        for name in sorted(os.listdir(stage)):
            # hidden names are in-flight temporaries (the executor-direct
            # writer stages ``.tmp-part-*`` then os.replace's into place;
            # a task killed mid-write leaves only the dot-file behind)
            if not name.endswith(".parquet") or name.startswith("."):
                continue
            file_rows.append(pq.ParquetFile(os.path.join(stage, name)).metadata.num_rows)
            dst = f"snap-{uuid.uuid4().hex}-{name.split('-')[1]}.parquet"
            shutil.move(os.path.join(stage, name), os.path.join(data_dir, dst))
            files.append(os.path.join("data", dst))
        shutil.rmtree(stage, ignore_errors=True)
        return files, file_rows

    def overwrite_stage(
        self,
        table: str,
        stage: str,
        meta: dict | None = None,
        stat_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> int:
        """``overwrite`` over files already staged by executor-side
        writers (no driver-side ``df.write``): adopt the stage's parquet
        files as the table's next snapshot. Same commit/locking path as
        ``overwrite`` — only the producer of the staged bytes differs."""
        files, file_rows = self._adopt_stage(table, stage)
        stats_d = self._compute_stats(table, files, stat_cols)
        blooms_d = self._compute_blooms(table, files, bloom_cols)

        def mutate(m: dict) -> int:
            self._stamp_files(m, files)
            self._merge_file_meta(m, stats_d, blooms_d)
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": m["current"],
                    "files": files,
                    "meta": dict(
                        meta or {}, rows_delta=sum(file_rows), file_rows=file_rows
                    ),
                }
            )
            m["current"] = sid
            return sid

        return self._locked_commit(table, mutate)

    def _compute_stats(
        self, table: str, files: list[str], stat_cols: list[str] | None
    ) -> dict:
        """Per-file min/max footer stats for ``stat_cols`` (keyed by
        table-relative path) — computed OUTSIDE the commit lock; merged
        into the manifest's ``file_stats`` map at commit."""
        if not stat_cols:
            return {}
        return {
            f: self._footer_stats(os.path.join(self._dir(table), f), stat_cols)
            for f in files
        }

    @staticmethod
    def _merge_file_meta(m: dict, stats_d: dict, blooms_d: dict) -> None:
        if stats_d:
            m.setdefault("file_stats", {}).update(stats_d)
        for f, per in blooms_d.items():
            m.setdefault("file_blooms", {}).setdefault(f, {}).update(per)

    # bloom sizing: ~10 bits/key, k=7 probes -> ~0.8% false-positive rate
    BLOOM_BITS_PER_KEY = 10
    BLOOM_K = 7

    def _compute_blooms(
        self, table: str, files: list[str], bloom_cols: list[str] | None
    ) -> dict:
        """Per-file bloom filter over each integer column in
        ``bloom_cols`` for the manifest's ``file_blooms`` map — the
        Iceberg/parquet bloom analogue, but manifest-level so the DRIVER
        prunes files for point lookups without opening any of them.
        min/max stats only help when the layout is sorted on the column;
        a URL-seen log appended in crawl order has url_hash min/max
        spanning the whole 64-bit range in every file, yet its bloom
        still answers 'this file cannot contain key X' at ~1% error.
        Cost: one columnar read of the just-written file per column (the
        writer already has the file hot in page cache) — computed
        OUTSIDE the commit lock; merged at commit."""
        if not bloom_cols:
            return {}
        import numpy as np
        import pyarrow.parquet as pq

        from .functions.hashing import bloom_positions_np

        blooms: dict[str, dict] = {}
        for f in files:
            path = os.path.join(self._dir(table), f)
            tbl = pq.read_table(path, columns=[c for c in bloom_cols])
            per: dict[str, dict] = {}
            for c in bloom_cols:
                col = tbl.column(c)
                if not str(col.type).startswith(("int", "uint")):
                    raise TypeError(
                        f"bloom_cols need integer columns, {c} is {col.type}; "
                        "hash strings to int64 first (murmur3_url_hash)"
                    )
                v = col.to_numpy(zero_copy_only=False).astype(np.int64)
                n = max(1, len(v))
                bits = 1 << max(6, int(n * self.BLOOM_BITS_PER_KEY).bit_length())
                pos = bloom_positions_np(v, self.BLOOM_K, bits).ravel()
                arr = np.zeros(bits >> 3, dtype=np.uint8)
                np.bitwise_or.at(
                    arr,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8),
                )
                per[c] = {"bits": bits, "k": self.BLOOM_K, "hex": arr.tobytes().hex()}
            blooms[f] = per
        return blooms

    def prune_files_point(
        self, table: str, col: str, value: int, snapshot: int | None = None
    ) -> list[str]:
        """Data files that MAY contain ``col == value``: bloom-negative
        files are skipped (no false negatives by construction), then
        min/max stats cut what remains. Files with neither recorded are
        kept — pruning only ever skips files proven non-matching."""
        from .functions.hashing import bloom_positions_py

        m = self._load_manifest(table)
        blooms = m.get("file_blooms", {})
        stats = m.get("file_stats", {})
        sid = m["current"] if snapshot is None else snapshot
        snaps = [s for s in m["snapshots"] if s["id"] == sid]
        keep = []
        for f in snaps[0]["files"] if snaps else []:
            name = self._stat_name(m, f, col)
            if name is None:
                continue  # field postdates file -> only NULLs -> no match
            s = stats.get(f, {}).get(name)
            if s is not None and not (s[0] <= value <= s[1]):
                continue
            b = blooms.get(f, {}).get(name)
            if b is not None:
                buf = bytes.fromhex(b["hex"])
                if any(
                    not (buf[p >> 3] >> (p & 7)) & 1
                    for p in bloom_positions_py(int(value), b["k"], b["bits"])
                ):
                    continue
            keep.append(os.path.join(self._dir(table), f))
        return keep

    def read_point(
        self,
        table: str,
        schema: StructType,
        col: str,
        value: int,
        snapshot: int | None = None,
    ) -> DataFrame:
        """Point lookup with manifest bloom + stats file skipping; the
        equality predicate still applies row-level (parquet row-group
        pushdown inside the surviving files)."""
        from pyspark.sql import functions as F

        paths = self.prune_files_point(table, col, value, snapshot)
        if not paths:
            return self.spark.createDataFrame([], schema)
        m = self._load_manifest(table)
        if m.get("schema") is not None:
            rel = [os.path.relpath(p, self._dir(table)) for p in paths]
            df = self._read_files_evolved(table, m, rel, schema)
        else:
            df = self.spark.read.schema(schema).parquet(*paths)
        return df.filter(F.col(col) == value)

    def append(
        self,
        table: str,
        df: DataFrame,
        meta: dict | None = None,
        stat_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        branch: str | None = None,
    ) -> int:
        """Append rows as a new snapshot; returns the snapshot id. The
        snapshot meta records ``rows_delta`` (rows in THIS append) and
        ``file_rows`` — per-partition lineage (one written file per task
        partition, rows from the parquet footers). ``stat_cols`` opts the
        new files into manifest min/max stats for ``read_range`` skipping;
        ``bloom_cols`` opts them into per-file blooms for ``read_point``.
        ``branch`` stages the commit on a named ref instead of main
        (write-audit-publish; see ``create_branch``/``publish``).

        Concurrency: the data write and stats/bloom computation happen
        outside the commit lock; the manifest entry rebases onto whatever
        the target ref points at by commit time, so concurrent appends to
        one table all land (tests/test_concurrent_commits.py)."""
        cols_written = list(df.columns)
        files, file_rows = self._write_files(table, df)
        stats_d = self._compute_stats(table, files, stat_cols)
        blooms_d = self._compute_blooms(table, files, bloom_cols)

        def mutate(m: dict) -> int:
            self._check_write_columns(m, table, cols_written)
            self._stamp_files(m, files)
            self._merge_file_meta(m, stats_d, blooms_d)
            base_sid = self._base_sid(m, branch)
            prev = [s for s in m["snapshots"] if s["id"] == base_sid]
            base = prev[0]["files"] if prev else []
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "files": base + files,
                    "meta": dict(
                        meta or {}, rows_delta=sum(file_rows), file_rows=file_rows
                    ),
                }
            )
            if branch is None:
                m["current"] = sid
            else:
                m["refs"][branch] = sid
            return sid

        return self._locked_commit(table, mutate)

    def append_rows(
        self, table: str, rows: list[tuple], schema: StructType, meta: dict | None = None
    ) -> int:
        """Append a SMALL driver-side row batch (metrics, lineage) as a new
        snapshot via a direct pyarrow write — tiny fact appends shouldn't
        pay a Spark job (a local-rows write costs seconds of fixed
        overhead per call; Iceberg's analogue is a direct data-file
        commit). The file is identical in shape to a Spark-written one and
        reads back through the normal ``read`` path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        _PA = {
            "string": pa.string(),
            "bigint": pa.int64(),
            "int": pa.int32(),
            "double": pa.float64(),
            "boolean": pa.bool_(),
        }
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        arrow_schema = pa.schema(
            [(f.name, _PA[f.dataType.simpleString()]) for f in schema.fields]
        )
        tbl = pa.table(
            {f.name: list(c) for f, c in zip(schema.fields, cols)}, schema=arrow_schema
        )
        data_dir = os.path.join(self._dir(table), "data")
        os.makedirs(data_dir, exist_ok=True)
        name = f"snap-{uuid.uuid4().hex}-local.parquet"
        pq.write_table(tbl, os.path.join(data_dir, name))

        def mutate(m: dict) -> int:
            self._check_write_columns(m, table, [f.name for f in schema.fields])
            self._stamp_files(m, [os.path.join("data", name)])
            prev = [s for s in m["snapshots"] if s["id"] == m["current"]]
            base = prev[0]["files"] if prev else []
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": m["current"],
                    "files": base + [os.path.join("data", name)],
                    "meta": dict(meta or {}, rows_delta=len(rows)),
                }
            )
            m["current"] = sid
            return sid

        return self._locked_commit(table, mutate)

    def overwrite(
        self,
        table: str,
        df: DataFrame,
        meta: dict | None = None,
        stat_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> int:
        """Replace table contents as a new snapshot (old files retained for
        time travel / resume)."""
        cols_written = list(df.columns)
        files, file_rows = self._write_files(table, df)
        stats_d = self._compute_stats(table, files, stat_cols)
        blooms_d = self._compute_blooms(table, files, bloom_cols)

        def mutate(m: dict) -> int:
            self._check_write_columns(m, table, cols_written)
            self._stamp_files(m, files)
            self._merge_file_meta(m, stats_d, blooms_d)
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": m["current"],
                    "files": files,
                    "meta": dict(
                        meta or {}, rows_delta=sum(file_rows), file_rows=file_rows
                    ),
                }
            )
            m["current"] = sid
            return sid

        return self._locked_commit(table, mutate)

    def merge(
        self,
        table: str,
        schema: StructType,
        updates: DataFrame,
        key: str,
        stat_cols: list[str] | None = None,
        key_probe_limit: int = 100_000,
    ) -> int:
        """Copy-on-write MERGE (upsert): rows of ``updates`` whose ``key``
        matches an existing row REPLACE it; the rest are inserted — the
        Iceberg ``MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT
        MATCHED THEN INSERT`` shape (the reference's per-row idempotent
        upsert, K3/K4, lifted to file granularity).

        Scale design: only data files whose manifest [min, max] stats for
        ``key`` can contain an update key are rewritten; every other file
        carries over into the new snapshot BY NAME (no bytes touched) —
        at 100 TB a nightly delta touching a narrow key range rewrites a
        handful of files, not the table. File-level pruning is manifest
        math on the driver (per-file interval probe against the sorted
        update-key list when the delta has ≤ ``key_probe_limit`` distinct
        keys, else interval-vs-range overlap); the rewrite itself is one
        distributed anti-join + union, update side broadcast when small.
        Files without recorded stats are always rewritten (pruning may
        only skip files PROVEN untouched). Old files remain readable for
        time travel until expire+vacuum, like every other commit here.

        ``updates`` must be key-unique (two updates for one key have no
        deterministic winner) — raises otherwise.

        Concurrency: merge is read-dependent (the survivor anti-join was
        computed against the snapshot current at plan time), so unlike
        append it cannot rebase — if another writer commits between plan
        and commit it raises :class:`CommitConflict`; the caller
        re-plans against the new current snapshot (Iceberg's
        validate-and-retry loop)."""
        from bisect import bisect_left

        from pyspark.sql import functions as F

        n_upd = updates.count()
        n_keys = updates.select(key).distinct().count()
        if n_keys != n_upd:
            raise ValueError(
                f"merge: updates must be unique on {key!r} "
                f"({n_upd} rows, {n_keys} distinct keys)"
            )
        if n_keys <= key_probe_limit:
            keys = sorted(r[0] for r in updates.select(key).distinct().collect())
            lo, hi = keys[0], keys[-1]

            def touches(fmin, fmax) -> bool:
                i = bisect_left(keys, fmin)
                return i < len(keys) and keys[i] <= fmax
        else:
            keys = None
            row = updates.agg(
                F.min(key).alias("lo"), F.max(key).alias("hi")
            ).collect()[0]
            lo, hi = row["lo"], row["hi"]

            def touches(fmin, fmax) -> bool:
                return not (fmin > hi or fmax < lo)

        m = self._load_manifest(table)
        stats = m.get("file_stats", {})
        base_sid = m["current"]
        cur = [s for s in m["snapshots"] if s["id"] == base_sid][0]
        touched, kept = [], []
        for f in cur["files"]:
            name = self._stat_name(m, f, key)
            if name is None:
                # key field postdates this file: only NULL keys inside,
                # and update keys are non-null -> provably untouched
                kept.append(f)
                continue
            s = stats.get(f, {}).get(name)
            (touched if s is None or touches(s[0], s[1]) else kept).append(f)

        if touched:
            if m.get("schema") is not None:
                old = self._read_files_evolved(table, m, touched, schema)
            else:
                old = self.spark.read.schema(schema).parquet(
                    *[os.path.join(self._dir(table), f) for f in touched]
                )
            survivors = old.join(
                F.broadcast(updates.select(key)) if n_keys <= key_probe_limit
                else updates.select(key),
                key,
                "left_anti",
            )
            rewrite = survivors.unionByName(updates)
        else:
            rewrite = updates
        files, file_rows = self._write_files(table, rewrite)
        stats_d = self._compute_stats(table, files, stat_cols)

        def mutate(m: dict) -> int:
            if m["current"] != base_sid:
                raise CommitConflict(
                    f"merge planned against {table}@{base_sid} but current "
                    f"is {m['current']} — re-plan against the new snapshot"
                )
            self._check_write_columns(m, table, list(updates.columns))
            self._stamp_files(m, files)
            self._merge_file_meta(m, stats_d, {})
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "files": kept + files,
                    "meta": {
                        "op": "merge",
                        "merge_key": key,
                        "updates": n_upd,
                        "files_rewritten": len(touched),
                        "files_kept": len(kept),
                        "rows_delta": sum(file_rows),
                        "file_rows": file_rows,
                    },
                }
            )
            m["current"] = sid
            return sid

        return self._locked_commit(table, mutate)

    def delete_where(
        self,
        table: str,
        schema: StructType,
        condition: str,
        key: str | None = None,
        key_values: list | None = None,
        stat_cols: list[str] | None = None,
    ) -> int:
        """Copy-on-write DELETE: rows where ``condition`` evaluates TRUE
        are removed; FALSE/NULL rows survive (ANSI DELETE semantics) —
        the takedown / right-to-be-forgotten operation a training corpus
        needs (remove every document from a host, purge a doc_id list)
        that the reference can only express as per-row SQL DELETEs
        (New_YouTube_Crawler.py's psycopg2 loop shape).

        Scale design mirrors :meth:`merge`: when the caller names the
        equality ``key`` + ``key_values`` the predicate targets, only
        data files whose manifest stats/bloom CANNOT rule those values
        out are rewritten (``old.filter(NOT coalesce(condition, false))``
        — one distributed scan of the touched files, no join); every
        other file carries into the new snapshot BY NAME, untouched.
        At 100 TB a single-host takedown rewrites the few files whose
        (min, max) straddle that host, not the table. Files without
        recorded stats are always rewritten (pruning only skips files
        PROVEN untouched). Without key/key_values every file is
        rewritten (correct, just unpruned). Old files stay readable for
        time travel until expire+vacuum.

        Concurrency: read-dependent like merge — raises
        :class:`CommitConflict` if another writer commits between plan
        and commit; the caller re-plans."""
        from bisect import bisect_left

        from pyspark.sql import functions as F

        from .functions.hashing import bloom_positions_py

        m = self._load_manifest(table)
        stats = m.get("file_stats", {})
        blooms = m.get("file_blooms", {})
        base_sid = m["current"]
        cur = [s for s in m["snapshots"] if s["id"] == base_sid][0]

        def may_touch(f: str) -> bool:
            if key is None or not key_values:
                return True
            kname = self._stat_name(m, f, key)
            if kname is None:
                # key field postdates this file: all NULLs, and an
                # equality/IN predicate over non-null values cannot
                # evaluate TRUE -> the file provably survives intact
                return False
            s = stats.get(f, {}).get(kname)
            if s is not None:
                vals = sorted(key_values)
                i = bisect_left(vals, s[0])
                if not (i < len(vals) and vals[i] <= s[1]):
                    return False
            b = blooms.get(f, {}).get(kname)
            if b is not None and all(isinstance(v, int) for v in key_values):
                buf = bytes.fromhex(b["hex"])
                if all(
                    any(
                        not (buf[p >> 3] >> (p & 7)) & 1
                        for p in bloom_positions_py(int(v), b["k"], b["bits"])
                    )
                    for v in key_values
                ):
                    return False
            return True

        touched = [f for f in cur["files"] if may_touch(f)]
        kept = [f for f in cur["files"] if f not in set(touched)]

        files: list[str] = []
        file_rows: list[int] = []
        rows_before = 0
        if touched:
            paths = [os.path.join(self._dir(table), f) for f in touched]
            import pyarrow.parquet as pq

            rows_before = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
            if m.get("schema") is not None:
                old = self._read_files_evolved(table, m, touched, schema)
            else:
                old = self.spark.read.schema(schema).parquet(*paths)
            survivors = old.filter(
                ~F.coalesce(F.expr(condition), F.lit(False))
            )
            files, file_rows = self._write_files(table, survivors)
        stats_d = self._compute_stats(table, files, stat_cols)
        n_deleted = rows_before - sum(file_rows)

        def mutate(m: dict) -> int:
            if m["current"] != base_sid:
                raise CommitConflict(
                    f"delete planned against {table}@{base_sid} but current "
                    f"is {m['current']} — re-plan against the new snapshot"
                )
            self._stamp_files(m, files)
            self._merge_file_meta(m, stats_d, {})
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "files": kept + files,
                    "meta": {
                        "op": "delete",
                        "condition": condition,
                        "rows_deleted": n_deleted,
                        "files_rewritten": len(touched),
                        "files_kept": len(kept),
                        "rows_delta": sum(file_rows),
                        "file_rows": file_rows,
                    },
                }
            )
            m["current"] = sid
            return sid

        return self._locked_commit(table, mutate)

    def rows_delta(self, table: str, snapshot: int) -> int:
        """PHYSICAL rows written by snapshot ``snapshot`` (from footer
        stats). For zero-copy tables with a ``row_filter`` prop this is
        the PRE-filter file row count — rows the filter excludes are
        included (same contract as Iceberg manifest stats over files
        carrying delete predicates). Callers needing the logical count of
        a filtered table must run a count over ``read``."""
        return int(self.snapshot_meta(table, snapshot).get("rows_delta", 0))

    def file_rows(self, table: str, snapshot: int) -> list[int]:
        """Per-partition lineage of a snapshot: rows per written file, in
        partition order (footer stats captured at commit)."""
        return list(self.snapshot_meta(table, snapshot).get("file_rows", []))

    def append_files(
        self,
        table: str,
        src_table: str,
        src_snapshot: int,
        meta: dict | None = None,
        column_map: dict[str, str] | None = None,
        row_filter: str | None = None,
    ) -> int:
        """ZERO-COPY append: add another table snapshot's data FILES to this
        table's manifest without rewriting a byte — the Iceberg idiom of
        committing existing data files into a second table, combined with
        name mapping (Iceberg's schema name-mapping) and a row-filter
        predicate (the moral equivalent of an equality-delete file readers
        must apply). ``column_map`` maps THIS table's column -> source
        column; ``row_filter`` is a SQL predicate over source columns.
        Both are table-level properties (must be identical across
        appends)."""
        src = self._load_manifest(src_table)
        src_snap = [s for s in src["snapshots"] if s["id"] == src_snapshot]
        if not src_snap:
            raise KeyError(f"{src_table}@{src_snapshot}")
        # file paths are warehouse-relative via the source table dir
        rel = os.path.relpath(self._dir(src_table), self._dir(table))
        files = [os.path.join(rel, f) for f in src_snap[0]["files"]]
        rows = src_snap[0]["meta"].get("rows_delta", 0)
        file_rows = src_snap[0]["meta"].get("file_rows", [])
        new_props = {
            k: v
            for k, v in (("column_map", column_map), ("row_filter", row_filter))
            if v is not None
        }

        def mutate(m: dict) -> int:
            if m.get("schema") is not None:
                raise ValueError(
                    f"{table}: zero-copy append_files is unsupported on "
                    "schema-evolved tables (field-id mapping and column_map "
                    "props cannot compose)"
                )
            props = m.get("props", {})
            if props and new_props and props != new_props:
                raise ValueError(f"conflicting table props for {table}")
            m["props"] = props or new_props
            prev = [s for s in m["snapshots"] if s["id"] == m["current"]]
            base = prev[0]["files"] if prev else []
            sid = self._next_sid(m)
            m["snapshots"].append(
                {
                    "id": sid,
                    "parent": m["current"],
                    "files": base + files,
                    "meta": dict(meta or {}, rows_delta=rows, file_rows=file_rows),
                }
            )
            m["current"] = sid
            return sid

        return self._locked_commit(table, mutate)

    def read(
        self,
        table: str,
        schema: StructType,
        snapshot: int | None = None,
        branch: str | None = None,
        project: StructType | None = None,
    ) -> DataFrame:
        """Read a snapshot (default: current main; ``branch`` reads a
        staged ref head). Empty table -> empty DF with the declared
        schema, so pipelines need no existence branches. Honors
        table-level ``column_map``/``row_filter`` props set by zero-copy
        ``append_files``.

        ``project``: optional SUBSET of ``schema`` (nested-struct subsets
        allowed) pushed to the parquet scan — the Iceberg projected-read
        analogue. Catalyst prunes unused TOP-LEVEL columns on its own,
        but a filter the optimizer infers over a whole array column
        (e.g. ``size(spans) > 0`` from an explode) defeats nested-field
        pruning, so a consumer that needs two subfields of a wide struct
        would otherwise decode every payload byte. Pass the pruned type
        and only those leaves are read."""
        m = self._load_manifest(table)
        sid = self._base_sid(m, branch) if snapshot is None else snapshot
        snaps = [s for s in m["snapshots"] if s["id"] == sid]
        files = snaps[0]["files"] if snaps else []
        if not files:
            return self.spark.createDataFrame([], project or schema)
        if m.get("schema") is not None:
            # field-id registry: name-map each file by its write version
            return self._read_files_evolved(table, m, files, schema)
        paths = [os.path.join(self._dir(table), f) for f in files]
        return self._read_paths(paths, schema, m.get("props", {}), project)

    def _read_paths(
        self,
        paths: list[str],
        schema: StructType,
        props: dict,
        project: StructType | None = None,
    ) -> DataFrame:
        """Read data files under the declared schema, applying zero-copy
        table props (``row_filter``/``column_map``) and an optional
        projected schema. Prop tables read the SOURCE files (other column
        names), so the declared schema is enforced by explicit per-column
        casts after the name mapping rather than at scan time (the
        row_filter may also reference source columns absent from the
        declared schema). Casts are applied only where the
        parquet-inferred type truly differs — nullability is erased for
        the comparison, since Spark refuses nullable->non-null casts on
        nested types yet the data is valid."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, MapType, StructField

        want = project or schema
        if not props:
            return self.spark.read.schema(want).parquet(*paths)
        cmap = props.get("column_map", {})
        if project is None:
            df = self.spark.read.parquet(*paths)
        else:
            # source-side pruned scan: map the projected fields to their
            # source names/types; keep every ATOMIC source column readable
            # so the row_filter always resolves (scalars are cheap — the
            # pruning win is the nested payloads).
            src_full = self.spark.read.parquet(paths[0]).schema
            keep = {cmap.get(f.name, f.name): f.dataType for f in project.fields}
            fields = []
            for sf in src_full.fields:
                if sf.name in keep:
                    fields.append(StructField(sf.name, keep[sf.name], True))
                elif not isinstance(sf.dataType, (ArrayType, MapType, StructType)):
                    fields.append(sf)
            df = self.spark.read.schema(StructType(fields)).parquet(*paths)
        if props.get("row_filter"):
            df = df.filter(props["row_filter"])

        def _erase_null(dt):
            return dt.json().replace('"nullable":false', '"nullable":true').replace(
                '"containsNull":false', '"containsNull":true'
            )

        src_types = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for f in want.fields:
            src = cmap.get(f.name, f.name)
            c = F.col(src)
            if _erase_null(src_types[src]) != _erase_null(f.dataType):
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        return df.select(*cols)

    def read_delta(
        self,
        table: str,
        schema: StructType,
        snapshot: int,
        project: StructType | None = None,
    ) -> DataFrame:
        """INCREMENTAL scan: only the data files snapshot ``snapshot``
        ADDED (the Iceberg incremental-read / changelog analogue). Lets a
        consumer process one crawl round's appends — e.g. stream the
        crawl_order increments — without rescanning the table. Appends
        only; an overwrite snapshot's delta is its full file set.
        Applies zero-copy table props (row_filter/column_map) exactly
        like ``read``; ``project`` prunes the scan the same way."""
        m = self._load_manifest(table)
        cur = [s for s in m["snapshots"] if s["id"] == snapshot]
        prev = [s for s in m["snapshots"] if s["id"] == snapshot - 1]
        if not cur:
            raise KeyError(f"{table}@{snapshot}")
        if snapshot > 0 and not prev:
            # Snapshot ids are dense (append/overwrite assign current+1),
            # so a missing ``snapshot-1`` entry means expire_snapshots
            # dropped it. Falling through would return the snapshot's FULL
            # cumulative file set as if it were all new — a streaming
            # consumer would re-emit every prior row. Fail loudly instead
            # (same contract as Iceberg incremental read past the
            # expiration horizon).
            raise KeyError(
                f"{table}@{snapshot}: predecessor snapshot {snapshot - 1} "
                "was expired; incremental read is no longer possible"
            )
        prev_files = set(prev[0]["files"]) if prev else set()
        files = [f for f in cur[0]["files"] if f not in prev_files]
        if not files:
            return self.spark.createDataFrame([], project or schema)
        if m.get("schema") is not None:
            return self._read_files_evolved(table, m, files, schema)
        paths = [os.path.join(self._dir(table), f) for f in files]
        return self._read_paths(paths, schema, m.get("props", {}), project)

    def register_views(
        self, views: dict[str, StructType], prefix: str = ""
    ) -> list[str]:
        """Register warehouse tables as session temp views so the whole
        warehouse is queryable in plain SQL (``spark.sql``) — the surface
        the reference's users already have against its PostgreSQL tables
        (every consumer there is a psycopg2 SELECT,
        sendToRabbitMQ.py:28-39, Selenium/YouTube_Crawler.py:523). Each view pins the table's CURRENT
        snapshot at registration time (a consistent read set across a
        multi-statement SQL session); re-register to see later commits.
        Empty tables register as empty relations with the declared
        schema, so SQL over a fresh warehouse parses and runs."""
        out = []
        for name, schema in views.items():
            self.read(name, schema).createOrReplaceTempView(prefix + name)
            out.append(prefix + name)
        return out

    def row_count(self, table: str, snapshot: int | None = None) -> int:
        """Row count from parquet footer metadata — no Spark job (the
        Iceberg analogue reads it from manifest stats). PRE-filter for
        zero-copy tables with a ``row_filter`` prop (see rows_delta)."""
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(p).metadata.num_rows for p in self.data_files(table, snapshot)
        )

    def snapshot_meta(self, table: str, snapshot: int) -> dict:
        m = self._load_manifest(table)
        for s in m["snapshots"]:
            if s["id"] == snapshot:
                return s["meta"]
        raise KeyError(f"{table}@{snapshot}")

    def data_files(self, table: str, snapshot: int | None = None) -> list[str]:
        m = self._load_manifest(table)
        sid = m["current"] if snapshot is None else snapshot
        snaps = [s for s in m["snapshots"] if s["id"] == sid]
        return [os.path.join(self._dir(table), f) for f in (snaps[0]["files"] if snaps else [])]

    def content_digest(self, table: str, snapshot: int | None = None) -> str:
        """Deterministic digest of the table's logical bytes: every data
        file read in manifest order, rows in file order, hashed via Arrow
        IPC. Raw file bytes are identical across resumes within one JVM;
        across JVMs the parquet footer's ``encodings`` list (a parquet-mr
        hash-set) can reorder, so byte-identity of the DATA is asserted at
        this level. Writer-identity metadata (schema/field key-value
        pairs like ``org.apache.spark.version`` and declared nullability
        flags) is normalized away before hashing: the digest certifies
        VALUES in ROW ORDER, not which engine encoded the file — the JVM
        writer and the executor-direct Arrow writer
        (operators/fetch.fetch_stage_direct) must digest equal."""
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        def nullable(dt):
            if pa.types.is_struct(dt):
                return pa.struct([pa.field(f.name, nullable(f.type)) for f in dt])
            if pa.types.is_list(dt):
                return pa.list_(pa.field(dt.value_field.name, nullable(dt.value_type)))
            return dt

        h = hashlib.sha256()
        for path in self.data_files(table, snapshot):
            tbl = pq.read_table(path).combine_chunks().replace_schema_metadata(None)
            norm = pa.schema([pa.field(f.name, nullable(f.type)) for f in tbl.schema])
            tbl = tbl.cast(norm)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl)
            h.update(sink.getvalue().to_pybytes())
        return h.hexdigest()

    def logical_digest(self, table: str, snapshot: int | None = None) -> str:
        """Order- and layout-invariant digest of the table's VALUES:
        sum of per-row ``xxhash64`` over all columns (decimal(38,0) —
        commutative, so file boundaries and row order don't matter) plus
        the row count. Complements ``content_digest``: content_digest
        certifies byte replay (rows in file order — the resume proofs,
        valid within one writer version), logical_digest certifies the
        DATA itself and is stable across writer/layout changes (e.g. the
        executor-direct fetch writer reshaping scratch file boundaries
        shifted downstream shuffle row order and thus content digests,
        while sorted-row table contents were byte-identical — the
        round-over-round BENCH comparison wants THIS digest)."""
        from pyspark.sql import functions as F

        files = self.data_files(table, snapshot)
        if not files:
            return "0/0"
        df = self.spark.read.parquet(*files)
        row = df.agg(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return f"{row.h}/{row.n}"

    def list_tables(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.exists(self._manifest_path(d))
        )

    def expire_snapshots(self, table: str, keep_last: int = 2) -> int:
        """Drop snapshot ENTRIES older than the last ``keep_last`` (data
        files are only reclaimed by ``vacuum``, which accounts for
        zero-copy shares). Returns snapshots removed. Time travel back
        past the horizon is no longer possible — same contract as
        Iceberg's expire_snapshots."""
        def mutate(m: dict) -> int:
            if len(m["snapshots"]) <= keep_last:
                return 0
            keep_ids = (
                {s["id"] for s in m["snapshots"][-keep_last:]}
                | {m["current"]}
                | set(m.get("refs", {}).values())  # staged branch heads
                | set(m.get("tags", {}).values())  # release tags pin bytes
            )
            before = len(m["snapshots"])
            m["snapshots"] = [s for s in m["snapshots"] if s["id"] in keep_ids]
            return before - len(m["snapshots"])

        return self._locked_commit(table, mutate)

    def vacuum(self) -> int:
        """Delete data files no snapshot of ANY table references (safe
        under zero-copy shares: a file lives while any manifest lists it).
        Returns files deleted. Run after expire_snapshots."""
        live: set[str] = set()
        for t in self.list_tables():
            tdir = self._dir(t)
            for snap in self._load_manifest(t)["snapshots"]:
                for f in snap["files"]:
                    live.add(os.path.realpath(os.path.join(tdir, f)))
        deleted = 0
        for t in self.list_tables():
            data_dir = os.path.join(self._dir(t), "data")
            if not os.path.isdir(data_dir):
                continue
            for name in os.listdir(data_dir):
                full = os.path.realpath(os.path.join(data_dir, name))
                if full not in live:
                    os.remove(full)
                    deleted += 1
        return deleted

    # -- maintenance: compaction + file-stats pruning -----------------------
    def compact(
        self,
        table: str,
        schema: StructType,
        target_file_rows: int = 1_000_000,
        stat_cols: list[str] | None = None,
        cluster_by: str | None = None,
        zorder_by: tuple[str, str] | None = None,
    ) -> int | None:
        """Bin-packing small-file compaction (the Iceberg
        ``rewrite_data_files`` analogue): rewrite the current snapshot's
        files into ``ceil(rows / target_file_rows)`` files as a NEW
        overwrite snapshot (old files stay readable for time travel until
        expire+vacuum). A crawl appends one snapshot per round per table,
        so file counts grow linearly with rounds; at 100 TB the scan-task
        count (and driver planning cost) grows with them — compaction is
        the nightly job that folds them back. Entirely a distributed
        read+write (one Exchange); no driver data path. Returns the new
        snapshot id, or None when the table is already packed.

        ``cluster_by`` sort-clusters the rewrite (Iceberg's sort-order
        rewrite): rows are range-partitioned and sorted on the column, so
        each output file owns a disjoint value band and the per-file
        min/max stats recorded via ``stat_cols`` make ``read_range``
        skipping tight — an append log whose every file spans the whole
        key range (nothing prunable) becomes one-file-per-band after the
        nightly compact. With ``cluster_by`` set, compaction proceeds
        even when the file count is already small, because the REASON to
        rewrite is ordering, not count.

        ``zorder_by`` (two integer-valued columns) is the multi-column
        variant (Iceberg/Delta ``ZORDER BY``): rows sort on the Morton
        interleave of the two 16-bit-normalized keys, so each output
        file owns a rectangle in (x, y) space and the recorded min/max
        stats prune on EITHER column — a spans table laid out this way
        serves both per-host scans and recency-horizon scans from the
        same copy.  Bounds come from one min/max aggregate (4 scalars to
        the driver); the z key is pure int64 bit math (functions/zorder
        raises on ranges past the 2^47 overflow bound)."""
        import math

        n_rows = self.row_count(table)
        n_files = len(self.data_files(table))
        want = max(1, math.ceil(n_rows / max(1, target_file_rows)))
        if n_files <= want and cluster_by is None and zorder_by is None:
            return None
        df = self.read(table, schema)
        if zorder_by is not None:
            from pyspark.sql import functions as F

            from .functions.zorder import zvalue_norm_sql

            xc, yc = zorder_by
            b = df.agg(
                F.min(xc), F.max(xc), F.min(yc), F.max(yc)
            ).collect()[0]
            zx = zvalue_norm_sql(
                xc, yc, (b[0], b[1]), (b[2], b[3]), engine="spark"
            )
            df = (
                df.withColumn("__z", F.expr(zx))
                .repartitionByRange(want, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
            stat_cols = sorted(set(stat_cols or []) | {xc, yc})
        elif cluster_by is not None:
            df = df.repartitionByRange(want, cluster_by).sortWithinPartitions(
                cluster_by
            )
            stat_cols = sorted(set(stat_cols or []) | {cluster_by})
        else:
            df = df.repartition(want)
        return self.overwrite(
            table,
            df,
            meta={
                "op": "compact",
                "compacted_from_files": n_files,
                **({"cluster_by": cluster_by} if cluster_by else {}),
                **({"zorder_by": list(zorder_by)} if zorder_by else {}),
            },
            stat_cols=stat_cols,
        )

    def _footer_stats(self, path: str, cols: list[str]) -> dict:
        """Per-file [min, max] for ``cols`` straight from the parquet
        row-group footers — no data scan (Iceberg keeps the same stats in
        its manifest files). Columns whose stats are absent or not
        JSON-representable are omitted (readers treat missing stats as
        'file may match' — always safe)."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out: dict[str, list] = {}
        for c in cols:
            if c not in idx:
                continue
            mns, mxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    break
                mns.append(st.min)
                mxs.append(st.max)
            else:
                if mns and all(
                    isinstance(v, (int, float, str)) for v in mns + mxs
                ):
                    out[c] = [min(mns), max(mxs)]
        return out

    def prune_files(
        self,
        table: str,
        col: str,
        lo=None,
        hi=None,
        snapshot: int | None = None,
    ) -> list[str]:
        """Data files whose [min, max] for ``col`` may intersect
        [lo, hi] (None = unbounded). Files without recorded stats are
        always included — pruning can only skip files PROVEN disjoint."""
        m = self._load_manifest(table)
        stats = m.get("file_stats", {})
        sid = m["current"] if snapshot is None else snapshot
        snaps = [s for s in m["snapshots"] if s["id"] == sid]
        keep = []
        for f in snaps[0]["files"] if snaps else []:
            name = self._stat_name(m, f, col)
            if name is None and (lo is not None or hi is not None):
                continue  # field postdates file -> only NULLs -> no match
            s = stats.get(f, {}).get(name) if name is not None else None
            if s is not None and (
                (hi is not None and s[0] > hi) or (lo is not None and s[1] < lo)
            ):
                continue
            keep.append(os.path.join(self._dir(table), f))
        return keep

    def read_range(
        self,
        table: str,
        schema: StructType,
        col: str,
        lo=None,
        hi=None,
        snapshot: int | None = None,
    ) -> DataFrame:
        """Range scan with manifest-level file skipping: only files whose
        recorded [min, max] can intersect are opened; the residual
        predicate still applies row-level (parquet row-group pushdown
        handles the rest). The 100-TB win: a recency-horizon frontier
        scan over a time-ordered append log opens only the recent files
        instead of planning tasks for every file ever written."""
        from pyspark.sql import functions as F

        paths = self.prune_files(table, col, lo, hi, snapshot)
        if not paths:
            return self.spark.createDataFrame([], schema)
        m = self._load_manifest(table)
        if m.get("schema") is not None:
            rel = [os.path.relpath(p, self._dir(table)) for p in paths]
            df = self._read_files_evolved(table, m, rel, schema)
        else:
            df = self.spark.read.schema(schema).parquet(*paths)
        if lo is not None:
            df = df.filter(F.col(col) >= lo)
        if hi is not None:
            df = df.filter(F.col(col) <= hi)
        return df

    # -- schema evolution (field-id registry; the Iceberg schema-update
    # shape). Implicit evolution (add a column by reading a wider schema,
    # drop by projecting a narrower one) already works through ``read``'s
    # caller-supplied StructType; the REGISTRY adds what name-based reads
    # cannot express: RENAME without rewriting a byte, and re-adding a
    # dropped column name without resurrecting the old values. Columns get
    # stable integer field ids; every data file is stamped with the schema
    # version it was written under; reads resolve a CURRENT name to a
    # field id, then to the name that id had when each file was written.
    # Opt-in: tables never touched by rename/add/drop_column behave
    # exactly as before (no registry, no overhead). The reference's
    # analogue is a hand-run ALTER TABLE on its Postgres store; here the
    # change is a metadata-only commit over an immutable file log.
    # Zero-copy prop tables (append_files) cannot evolve — their name
    # mapping is the table-level column_map property.
    def _evolve(self, table: str, change) -> int:
        """Apply ``change(m, fields) -> fields`` as a metadata-only locked
        commit; initializes the registry (version 0 = the current files'
        footer schema) on first use. Returns the new schema version."""
        def mutate(m: dict) -> int:
            if m.get("props"):
                raise ValueError(
                    f"{table}: schema evolution is unsupported on zero-copy "
                    "prop tables (their mapping is the column_map property)"
                )
            reg = m.get("schema")
            if reg is None:
                names = self._infer_current_names(table, m)
                m["schema"] = reg = {"ver": 0, "next_id": len(names)}
                m["schema_log"] = {
                    "0": [{"id": i, "name": n} for i, n in enumerate(names)]
                }
                fs = m.setdefault("file_schema", {})
                for s in m["snapshots"]:
                    for f in s["files"]:
                        fs.setdefault(f, 0)
            fields = [dict(x) for x in self._ver_fields(m, reg["ver"])]
            fields = change(m, fields)
            reg["ver"] += 1
            m["schema_log"][str(reg["ver"])] = fields
            return reg["ver"]

        return self._locked_commit(table, mutate)

    def _infer_current_names(self, table: str, m: dict) -> list[str]:
        import pyarrow.parquet as pq

        cur = [s for s in m["snapshots"] if s["id"] == m["current"]]
        files = cur[0]["files"] if cur else []
        if not files:
            raise ValueError(
                f"{table}: cannot initialize schema tracking on an empty "
                "table — append data first (version 0 is inferred from the "
                "current files' footer schema)"
            )
        sch = pq.ParquetFile(
            os.path.join(self._dir(table), files[0])
        ).schema_arrow
        return list(sch.names)

    def rename_column(self, table: str, old: str, new: str) -> int:
        """Rename a column WITHOUT rewriting data (field id is stable;
        old files keep their bytes and are name-mapped at read). Returns
        the new schema version."""
        def change(m: dict, fields: list[dict]) -> list[dict]:
            names = [f["name"] for f in fields]
            if old not in names:
                raise KeyError(f"{table}: no column {old!r} to rename")
            if new in names:
                raise ValueError(f"{table}: column {new!r} already exists")
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
            return fields

        return self._evolve(table, change)

    def add_column(self, table: str, name: str) -> int:
        """Add a column under a FRESH field id: pre-evolution files read
        back NULL for it, and if ``name`` was dropped earlier the old
        values do NOT resurrect (Iceberg add-after-drop semantics)."""
        def change(m: dict, fields: list[dict]) -> list[dict]:
            if name in [f["name"] for f in fields]:
                raise ValueError(f"{table}: column {name!r} already exists")
            fields.append({"id": m["schema"]["next_id"], "name": name})
            m["schema"]["next_id"] += 1
            return fields

        return self._evolve(table, change)

    def drop_column(self, table: str, name: str) -> int:
        """Drop a column from the current schema (metadata-only; bytes in
        old files stay for time travel but no current read resolves to
        them)."""
        def change(m: dict, fields: list[dict]) -> list[dict]:
            out = [f for f in fields if f["name"] != name]
            if len(out) == len(fields):
                raise KeyError(f"{table}: no column {name!r} to drop")
            return out

        return self._evolve(table, change)

    def schema_version(self, table: str) -> int | None:
        """Current schema version, or None for never-evolved tables."""
        reg = self._load_manifest(table).get("schema")
        return None if reg is None else reg["ver"]

    def current_columns(self, table: str) -> list[str] | None:
        """Column names of the current schema version (None = untracked)."""
        m = self._load_manifest(table)
        reg = m.get("schema")
        if reg is None:
            return None
        return [f["name"] for f in self._ver_fields(m, reg["ver"])]

    @staticmethod
    def _ver_fields(m: dict, ver: int) -> list[dict]:
        return m["schema_log"][str(ver)]

    @staticmethod
    def _file_ver(m: dict, f: str) -> int:
        return m.get("file_schema", {}).get(f, 0)

    @staticmethod
    def _stamp_files(m: dict, files: list[str]) -> None:
        """Record (at commit time, under the lock) which schema version
        newly-committed data files were written under."""
        reg = m.get("schema")
        if reg is not None and files:
            fs = m.setdefault("file_schema", {})
            for f in files:
                fs[f] = reg["ver"]

    @staticmethod
    def _check_write_columns(m: dict, table: str, cols: list[str]) -> None:
        """Registry tables reject writes whose column set is not exactly
        the current schema — a silent name drift would stamp files with a
        version whose names they don't carry. Raised inside the commit
        lock, so a bad write never publishes (its staged files are
        orphans until vacuum)."""
        reg = m.get("schema")
        if reg is None:
            return
        want = {f["name"] for f in Catalog._ver_fields(m, reg["ver"])}
        if set(cols) != want:
            raise ValueError(
                f"{table}: write columns {sorted(cols)} != schema "
                f"v{reg['ver']} columns {sorted(want)} — evolve the schema "
                "first (rename_column/add_column/drop_column)"
            )

    def _stat_name(self, m: dict, f: str, col: str) -> str | None:
        """The name CURRENT column ``col`` had when file ``f`` was
        written (stats/blooms are recorded under write-time names).
        None = the field did not exist then, so the file can only hold
        NULLs for it — point/range predicates can skip it outright."""
        reg = m.get("schema")
        if reg is None:
            return col
        cur = {x["name"]: x["id"] for x in self._ver_fields(m, reg["ver"])}
        fid = cur.get(col)
        if fid is None:
            return col
        vmap = {
            x["id"]: x["name"]
            for x in self._ver_fields(m, self._file_ver(m, f))
        }
        return vmap.get(fid)

    def _read_files_evolved(
        self, table: str, m: dict, files: list[str], schema: StructType
    ) -> DataFrame:
        """Read a file list through the field-id registry: group files by
        write-time schema version (a handful of groups, not per-file
        plans), read each group under its own names with explicit schemas
        (pushdown + pruning intact), alias back to CURRENT names, NULL-fill
        fields younger than the file, and union. Requested names resolve
        against the CURRENT version only."""
        from functools import reduce

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructField, StructType as ST

        reg = m["schema"]
        cur = {f["name"]: f["id"] for f in self._ver_fields(m, reg["ver"])}
        unknown = [f.name for f in schema.fields if f.name not in cur]
        if unknown:
            raise KeyError(
                f"{table}: columns {unknown} are not in schema v{reg['ver']}"
            )
        groups: dict[int, list[str]] = {}
        for f in files:
            groups.setdefault(self._file_ver(m, f), []).append(f)
        parts = []
        for ver in sorted(groups):
            vmap = {
                f["id"]: f["name"] for f in self._ver_fields(m, ver)
            }
            present = [f for f in schema.fields if cur[f.name] in vmap]
            paths = [os.path.join(self._dir(table), f) for f in groups[ver]]
            if present:
                read_schema = ST(
                    [
                        StructField(vmap[cur[f.name]], f.dataType, True)
                        for f in present
                    ]
                )
                df = self.spark.read.schema(read_schema).parquet(*paths)
            else:
                # no requested field existed at this version — keep the
                # rows (all-NULL projection) via an inferred read
                df = self.spark.read.parquet(*paths)
            parts.append(
                df.select(
                    *[
                        (
                            F.col(vmap[cur[f.name]])
                            if cur[f.name] in vmap
                            else F.lit(None).cast(f.dataType)
                        ).alias(f.name)
                        for f in schema.fields
                    ]
                )
            )
        return reduce(DataFrame.union, parts)

    def rollback(self, table: str, snapshot: int) -> None:
        """Reset ``current`` to an earlier snapshot and discard later ones
        (used on resume so a half-finished round's appends are undone;
        orphaned data files are ignored by the manifest)."""
        def mutate(m: dict) -> int:
            m["snapshots"] = [s for s in m["snapshots"] if s["id"] <= snapshot]
            m["current"] = snapshot
            refs = m.get("refs", {})
            for name in [n for n, v in refs.items() if v > snapshot]:
                del refs[name]  # branch heads past the rollback point dangle
            tags = m.get("tags", {})
            for name in [n for n, v in tags.items() if v > snapshot]:
                del tags[name]  # tags past the rollback point dangle too
            return snapshot

        self._locked_commit(table, mutate)

    def drop(self, table: str) -> None:
        shutil.rmtree(self._dir(table), ignore_errors=True)
