"""Batch fetch stage: salted host buckets -> grouped-map Arrow fetcher.

Replaces the reference's 15-process proxy pool with one message in flight
per worker (supervisor.py:146-160; prefetch_count=1 at
New_YouTube_Crawler_proxy_APP.py:41) with:

- a deterministic SALTED host bucketing
  ``pmod(xxhash64(host, salt), P)`` so a hot Zipf domain cannot pin one
  task (axis B: explicit skew handling — AQE cannot split a grouped-map
  stage, so salting is load-balance AND determinism),
- ``applyInPandas`` over each bucket: one transport session per group
  (the reference keeps one ``requests.Session`` per worker,
  New_YouTube_Crawler_Comment.py:32-33), rows processed in priority order
  within the group.

The transport is BATCH-shaped: ``(pdf) -> (ok mask, payload series)`` for
a whole host-bucket at once. The sandbox transport is the fully
vectorized synthetic web (numpy splitmix64 + pandas string kernels — no
per-row Python anywhere, per the BASELINE.json north_star); a production
HTTP transport would run an async client over the same batch interface.
The stage emits ONE FLAT ``payload`` string per page — nested span
structs are built afterwards by pure Spark codegen (operators/spans.py),
so no nested data ever crosses the Arrow boundary.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..config import CrawlConfig
from ..schema import FRONTIER
from ..sources import synth_web

FETCHED = StructType(
    FRONTIER.fields
    + [
        StructField("fingerprint", IntegerType(), True),
        StructField("ok", BooleanType(), False),
        StructField("payload", StringType(), True),
    ]
)

# batch transport: whole sorted host-bucket -> (ok mask, payload for ok rows)
BatchTransport = Callable[[pd.DataFrame], tuple["pd.Series", "pd.Series"]]


def synth_transport(cfg: CrawlConfig) -> BatchTransport:
    import numpy as np

    def fetch(pdf: pd.DataFrame) -> tuple[pd.Series, pd.Series]:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        ok = synth_web.fetch_ok_np(hashes, pdf["attempt"].to_numpy(dtype=np.int64), cfg)
        payload = pd.Series([""] * len(pdf), dtype=object)
        if ok.any():
            payload[ok] = synth_web.payload_series(
                hashes[ok], pdf["host"].to_numpy(dtype=object)[ok], cfg
            ).to_numpy(dtype=object)
        return pd.Series(ok), payload

    return fetch


def fetch_stage(admitted: DataFrame, cfg: CrawlConfig,
                transport_factory: Callable[[CrawlConfig], BatchTransport] = synth_transport) -> DataFrame:
    """admitted frontier rows -> FETCHED rows (ok, payload)."""

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # one transport session per bucket-group; priority order inside it
        transport = transport_factory(cfg)
        pdf = pdf.sort_values(
            ["host", "depth", "seq", "url_hash"], ascending=[True, False, True, True]
        ).reset_index(drop=True)
        ok, payload = transport(pdf)
        out = pdf[[f.name for f in FRONTIER.fields] + ["fingerprint"]].copy()
        out["ok"] = ok.to_numpy()
        out["payload"] = payload.to_numpy(dtype=object)
        return out

    bucketed = admitted.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("host"), F.lit(cfg.host_salt)), F.lit(cfg.frontier_partitions)),
    )
    cols = [f.name for f in FETCHED.fields]
    grouped_schema = StructType([f for f in FETCHED.fields])
    return (
        bucketed.select(*[c for c in bucketed.columns])
        .groupBy("bucket")
        .applyInPandas(run_group, grouped_schema)
        .select(*cols)
    )
