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

The transport is pluggable; the sandbox transport is the pure-function
synthetic web (sources/synth_web.py), where "I/O" per URL is a seeded RNG
— in production this is an async HTTP client, so the per-URL Python here
stands in for network latency, not for data-path compute. Everything
around this stage (dedup, politeness, joins, span handling) is
codegen'd/Arrow-vectorized.
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

FETCHED = StructType(
    FRONTIER.fields
    + [
        StructField("fingerprint", IntegerType(), True),
        StructField("ok", BooleanType(), False),
        StructField("spans", ArrayType(SPAN, False), True),
        StructField("outlinks", ArrayType(StringType(), False), True),
    ]
)

Transport = Callable[[str, int], tuple[bool, list, list]]


def synth_transport(cfg: CrawlConfig) -> Transport:
    def fetch(url: str, attempt: int) -> tuple[bool, list, list]:
        if not synth_web.fetch_ok(url, attempt, cfg):
            return False, [], []
        page = synth_web.page_for(url, cfg)
        spans = [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in page["spans"]
        ]
        return True, spans, page["outlinks"]

    return fetch


def fetch_stage(admitted: DataFrame, cfg: CrawlConfig,
                transport_factory: Callable[[CrawlConfig], Transport] = synth_transport) -> DataFrame:
    """admitted frontier rows -> FETCHED rows (ok, spans, outlinks)."""

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # one session per bucket-group; priority order inside the group
        transport = transport_factory(cfg)
        pdf = pdf.sort_values(
            ["host", "depth", "seq", "url_hash"], ascending=[True, False, True, True]
        )
        oks, spans_col, links_col = [], [], []
        for url, attempt in zip(pdf["url"], pdf["attempt"]):
            ok, spans, links = transport(url, int(attempt))
            oks.append(ok)
            spans_col.append(spans)
            links_col.append(links)
        out = pdf[[f.name for f in FRONTIER.fields] + ["fingerprint"]].copy()
        out["ok"] = oks
        out["spans"] = spans_col
        out["outlinks"] = links_col
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
