"""Batch fetch stage: salted sub-buckets -> fused Arrow fetch+extract.

Replaces the reference's 15-process proxy pool with one message in flight
per worker (supervisor.py:146-160; prefetch_count=1 at
New_YouTube_Crawler_proxy_APP.py:41) with one ``mapInArrow`` stage that
does, per partition, in a single pass:

1. sort rows into per-host priority order (Arrow sort kernel),
2. run the pluggable BATCH transport — the sandbox transport is the
   fully vectorized synthetic web (numpy splitmix64 + Arrow string
   kernels, synth_web.payload_arrays); production would run an async
   HTTP client over the same batch interface, one session per partition
   (the reference's one ``requests.Session`` per worker,
   New_YouTube_Crawler_Comment.py:32-33),
3. extract the interleaved span documents from the payloads with pure
   Arrow C kernels (operators/spans.extract_spans_arrow) — the payload
   string NEVER leaves the Python worker; what crosses back to the JVM
   is the final nested span column plus flat metadata.

No per-row Python anywhere (BASELINE.json north_star), and the round's
largest bytes make exactly one trip: generate -> extract -> Arrow -> one
parquet write (plans/round.py commits the output once; the spans table
shares those files zero-copy).

Partitioning is an explicit ``repartition(P, salted-sub-bucket)``:
``xxhash64(host, salt, pmod(url_hash, S))`` spreads one host over S
sub-buckets, so a Zipf-hot domain (>10% of a round) cannot become the
straggler task that caps scaling at 4N executors — while rows of a host
still land in at most S partitions (robots/cookie affinity). Politeness
is enforced upstream, so splitting a host across tasks never violates the
crawl-delay budget. The explicit partition count also keeps AQE from
coalescing the stage below the cluster's parallelism (axis B).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..config import CrawlConfig
from ..schema import FRONTIER, SPAN
from ..sources import synth_web
from .spans import extract_spans_arrow

FETCHED = StructType(
    FRONTIER.fields
    + [
        StructField("fingerprint", IntegerType(), True),
        StructField("ok", BooleanType(), False),
        StructField("status_code", IntegerType(), False),
        StructField("links", StringType(), True),
        StructField("spans", ArrayType(SPAN, False), False),
        StructField("fetch_round", IntegerType(), False),
    ]
)

# batch transport: whole sorted partition -> (status codes, payload, links).
# status: 200 ok; 403/413 fatal (straight to dead, reference
# New_YouTube_Crawler_Comment.py:50-52 aborts with no retry); 500 transient
# (bounded retry).
# Two signatures, chosen by the ``arrow_native`` attribute on the callable:
#   pandas (default, the custom/production seam): pd.DataFrame ->
#     (pd.Series codes, pd.Series payload, pd.Series links)
#   arrow_native=True (the synthetic sandbox web): pa.RecordBatch ->
#     (np.int64 codes, pa.Array<string> payload, pa.Array<string> links)
BatchTransport = Callable[[pd.DataFrame], tuple["pd.Series", "pd.Series", "pd.Series"]]


def synth_transport(cfg: CrawlConfig) -> BatchTransport:
    """Arrow-native synthetic transport: the whole batch stays in
    contiguous Arrow/numpy buffers — no object-dtype pandas strings are
    ever materialized on the hot path (they were the fetch stage's main
    allocator/memory-bandwidth load; see synth_web.payload_arrays).
    Receives the sorted Arrow batch, returns (status numpy int64,
    payload pa.Array<string>, links pa.Array<string>)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fetch(batch):
        hashes = batch.column("url_hash").to_numpy()
        # redirect resolution (synth_web redirect section): same-host
        # chains are followed inline — the row serves its FINAL target's
        # page (requests-transparent-follow parity) — while cross-host
        # targets come back as 301 + handoff link and >max-hop chains as
        # 508. All vectorized; a no-op when synth_redirect_prob == 0.
        if cfg.synth_redirect_prob > 0.0:
            eff, code_override, handoff, followed = synth_web.resolve_redirects_np(
                hashes, batch.column("host"), cfg
            )
        else:
            eff, code_override, handoff, followed = hashes, None, None, None
        code = synth_web.status_code_np(eff, batch.column("attempt").to_numpy(), cfg)
        kinds = synth_web.kind_codes_pa(batch.column("url"))
        if code_override is not None:
            code = np.where(code_override > 0, code_override, code)
            # a followed chain always lands on a /w/ target
            kinds = np.where(followed, synth_web.KIND_WATCH, kinds)
        ok = code == 200
        # payloads are a pure per-row function of (url_hash, host, kind):
        # computing them for the ~few-% failed rows too and masking after
        # costs less than a gather/scatter round-trip through objects
        pl, lk = synth_web.payload_arrays(eff, batch.column("host"), cfg, kinds)
        ok_pa = pa.array(ok)
        blank = pa.scalar("", type=pa.string())
        payload = pc.if_else(ok_pa, pl, blank)
        links = pc.if_else(ok_pa, lk, blank)
        if handoff is not None:
            # 301 rows carry exactly one outlink: the cross-host target
            links = pc.if_else(pa.array(code == synth_web.REDIRECT_CODE), handoff, links)
        synth_web.parse_work(hashes[ok], cfg.synth_work_iters)
        return code, payload, links

    fetch.arrow_native = True
    return fetch


def fetch_stage(admitted: DataFrame, cfg: CrawlConfig, round_no: int,
                transport_factory: Callable[[CrawlConfig], BatchTransport] = synth_transport) -> DataFrame:
    """admitted frontier rows -> FETCHED rows (ok, links, spans)."""
    import pyarrow as pa

    def run_partition(batches):
        yield from _fetched_batches(batches, transport_factory, cfg, round_no)

    sub_bucket = F.xxhash64(
        F.col("host"), F.lit(cfg.host_salt), F.pmod(F.col("url_hash"), F.lit(cfg.fetch_host_splits))
    )
    cols = [f.name for f in FETCHED.fields]
    return (
        admitted.repartition(cfg.frontier_partitions, sub_bucket)
        .mapInArrow(run_partition, FETCHED)
        .select(*cols)
    )


_FLAT_COLS = [f.name for f in FRONTIER.fields] + ["fingerprint"]
_OUT_NAMES = _FLAT_COLS + ["ok", "status_code", "links", "spans", "fetch_round"]
_SORT_KEYS = [
    ("host", "ascending"),
    ("depth", "descending"),
    ("seq", "ascending"),
    ("url_hash", "ascending"),
]


def _fetched_batches(batches, transport_factory, cfg: CrawlConfig, round_no: int):
    """Arrow batches of admitted frontier rows -> FETCHED record batches
    (shared by the mapInArrow stage and the executor-direct writer)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    flat_cols, out_names, sort_keys = _FLAT_COLS, _OUT_NAMES, _SORT_KEYS
    transport = transport_factory(cfg)  # one session per partition
    arrow_native = getattr(transport, "arrow_native", False)
    for b in batches:
        if arrow_native:
            # whole pass in Arrow: sort (unique url_hash key -> same
            # total order as the pandas path), fetch, extract — no
            # object-string materialization anywhere
            b2 = b.take(pc.sort_indices(b, sort_keys=sort_keys))
            code, payload, links = transport(b2)
            spans = extract_spans_arrow(payload)
            arrays = [b2.column(c) for c in flat_cols]
            arrays += [
                pa.array(code == 200),
                pa.array(code.astype(np.int32)),
                links,
                spans,
                pa.array(np.full(b2.num_rows, round_no, dtype=np.int32)),
            ]
        else:
            # legacy pandas-transport seam (custom/production
            # transports return pandas Series; tests/test_custom_transport)
            pdf = b.to_pandas()
            pdf = pdf.sort_values(
                ["host", "depth", "seq", "url_hash"], ascending=[True, False, True, True]
            ).reset_index(drop=True)
            code, payload, links = transport(pdf)
            spans = extract_spans_arrow(pa.array(payload, type=pa.string()))
            arrays = [pa.Array.from_pandas(pdf[c]) for c in flat_cols]
            arrays += [
                pa.Array.from_pandas(code == 200, type=pa.bool_()),
                pa.Array.from_pandas(code, type=pa.int32()),
                pa.array(links, type=pa.string()),
                spans,
                pa.array([round_no] * len(pdf), type=pa.int32()),
            ]
        yield pa.RecordBatch.from_arrays(arrays, names=out_names)


FETCH_STATS = StructType(
    [
        StructField("part", IntegerType(), False),
        StructField("rows", IntegerType(), False),
    ]
)


def fetch_stage_direct(admitted: DataFrame, cfg: CrawlConfig, round_no: int,
                       stage_dir: str,
                       transport_factory: Callable[[CrawlConfig], BatchTransport] = synth_transport) -> DataFrame:
    """``fetch_stage`` with EXECUTOR-DIRECT parquet writes: each task
    writes its partition's FETCHED rows straight from the Arrow batches
    to ``stage_dir/part-{pid:05d}.parquet`` (pyarrow C++ writer) and only
    a (partition, rows) stats row crosses back to the JVM.

    Why: through ``mapInArrow`` -> ``df.write.parquet`` the round's
    largest bytes (spans + links, ~1 KB/URL) pay Arrow IPC to the JVM,
    per-row InternalRow conversion of the nested span structs, and a
    second columnar encode in the JVM parquet writer — measured as the
    Python workers spending 2-4x their compute time BLOCKED on the JVM
    consumer (BENCH/BASELINE.md fetch decomposition). Writing the
    already-columnar batches from the worker removes every one of those
    passes; the JVM never touches the payload bytes. At cluster scale
    this is the standard direct-write pattern (task writes its own data
    file, the commit adopts files by name — Iceberg's write path); task
    RETRIES are safe because a re-attempt rewrites the same
    deterministic file name with identical content, and local mode never
    runs two attempts concurrently. A cluster deployment with
    speculative execution would stage per-attempt names + rename-on-
    commit (noted, not needed in local mode).

    Layout parity: rows are sorted whole-partition on the same keys as
    the JVM path's ``sortWithinPartitions`` and cast to the exact Arrow
    schema Spark's writer would produce, so the committed table is
    content- AND layout-identical (tests/test_direct_write.py pins the
    content digest against the JVM path).
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    import pyarrow as pa

    def _nullable(dt):
        # nullability-erased target: the assembled batches carry nullable
        # children (Arrow kernels default to nullable) and read-back
        # enforces the declared Spark schema regardless — parquet bytes
        # only need the right physical types
        if pa.types.is_struct(dt):
            return pa.struct([pa.field(f.name, _nullable(f.type)) for f in dt])
        if pa.types.is_list(dt):
            return pa.list_(pa.field(dt.value_field.name, _nullable(dt.value_type)))
        return dt

    arrow_schema = pa.schema(
        [pa.field(f.name, _nullable(f.type)) for f in to_arrow_schema(FETCHED)]
    )
    sort_keys = _SORT_KEYS

    def run_partition(batches):
        import os

        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = []
        rows = 0
        for rb in _fetched_batches(batches, transport_factory, cfg, round_no):
            out.append(rb)
            rows += rb.num_rows
        if rows:
            tbl = pa.Table.from_batches(out, schema=out[0].schema)
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys))
            tbl = tbl.cast(arrow_schema).combine_chunks()
            tmp = os.path.join(stage_dir, f".tmp-part-{pid:05d}.parquet")
            pq.write_table(tbl, tmp, compression="snappy")
            os.replace(tmp, os.path.join(stage_dir, f"part-{pid:05d}.parquet"))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int32()),
                pa.array([rows], type=pa.int32()),
            ],
            names=["part", "rows"],
        )

    sub_bucket = F.xxhash64(
        F.col("host"), F.lit(cfg.host_salt), F.pmod(F.col("url_hash"), F.lit(cfg.fetch_host_splits))
    )
    return admitted.repartition(cfg.frontier_partitions, sub_bucket).mapInArrow(
        run_partition, FETCH_STATS
    )
