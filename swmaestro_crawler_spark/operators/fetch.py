"""Batch fetch stage: salted sub-buckets -> fused Arrow fetch+extract.

Replaces the reference's 15-process proxy pool with one message in flight
per worker (supervisor.py:146-160; prefetch_count=1 at
New_YouTube_Crawler_proxy_APP.py:41) with one ``mapInArrow`` stage that
does, per partition, in a single pass:

1. sort rows into per-host priority order (pandas, vectorized),
2. run the pluggable BATCH transport — the sandbox transport is the
   fully vectorized synthetic web (numpy splitmix64 + pandas string
   kernels); production would run an async HTTP client over the same
   batch interface, one session per partition (the reference's one
   ``requests.Session`` per worker, New_YouTube_Crawler_Comment.py:32-33),
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
BatchTransport = Callable[[pd.DataFrame], tuple["pd.Series", "pd.Series", "pd.Series"]]


def synth_transport(cfg: CrawlConfig) -> BatchTransport:
    import numpy as np

    def fetch(pdf: pd.DataFrame) -> tuple[pd.Series, pd.Series, pd.Series]:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        code = synth_web.status_code_np(hashes, pdf["attempt"].to_numpy(dtype=np.int64), cfg)
        ok = code == 200
        payload = pd.Series([""] * len(pdf), dtype=object)
        links = pd.Series([""] * len(pdf), dtype=object)
        if ok.any():
            pl, lk = synth_web.payload_series(
                hashes[ok],
                pdf["host"].to_numpy(dtype=object)[ok],
                cfg,
                synth_web.kind_codes(pdf["url"])[ok],
            )
            payload[ok] = pl.to_numpy(dtype=object)
            links[ok] = lk.to_numpy(dtype=object)
            synth_web.parse_work(hashes[ok], cfg.synth_work_iters)
        return pd.Series(code), payload, links

    return fetch


def fetch_stage(admitted: DataFrame, cfg: CrawlConfig, round_no: int,
                transport_factory: Callable[[CrawlConfig], BatchTransport] = synth_transport) -> DataFrame:
    """admitted frontier rows -> FETCHED rows (ok, links, spans)."""
    import pyarrow as pa

    flat_cols = [f.name for f in FRONTIER.fields] + ["fingerprint"]

    def run_partition(batches):
        transport = transport_factory(cfg)  # one session per partition
        for b in batches:
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
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=flat_cols + ["ok", "status_code", "links", "spans", "fetch_round"],
            )

    sub_bucket = F.xxhash64(
        F.col("host"), F.lit(cfg.host_salt), F.pmod(F.col("url_hash"), F.lit(cfg.fetch_host_splits))
    )
    cols = [f.name for f in FETCHED.fields]
    return (
        admitted.repartition(cfg.frontier_partitions, sub_bucket)
        .mapInArrow(run_partition, FETCHED)
        .select(*cols)
    )
