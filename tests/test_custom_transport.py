"""The fetch stage's BatchTransport seam: production swaps the synthetic
web for an HTTP client (or a rendering fetcher — the S9 capability) by
passing a transport_factory; nothing else changes. This test drives
fetch_stage with a custom transport and checks statuses, span documents,
and links flow through the fused mapInArrow pass intact."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.fetch import fetch_stage
from swmaestro_crawler_spark.plans.crawl import seeds_to_frontier
from swmaestro_crawler_spark.sources.synth_web import FIELD, SPANSEP, make_seeds


def renderer_transport(cfg):
    """A stand-in 'rendered page' transport: odd url_hash fails with 503
    -> 500-class transient; even succeeds with a fixed two-span page."""

    def fetch(pdf: pd.DataFrame):
        ok = (pdf["url_hash"] % 2 == 0).to_numpy()
        code = pd.Series([200 if o else 500 for o in ok])
        payload = pd.Series(
            [
                f"stat{FIELD}rendered=1{FIELD}{SPANSEP}text{FIELD}hello {h}{FIELD}"
                if o
                else ""
                for o, h in zip(ok, pdf["url_hash"])
            ],
            dtype=object,
        )
        links = pd.Series([""] * len(pdf), dtype=object)
        return code, payload, links

    return fetch


def test_fetch_stage_accepts_custom_transport(spark, cfg):
    frontier = seeds_to_frontier(
        spark.createDataFrame(make_seeds(cfg, 40))
    ).withColumn("fingerprint", F.hash(F.col("url")))
    fetched = fetch_stage(frontier, cfg, 0, transport_factory=renderer_transport)
    rows = fetched.collect()
    assert rows
    for r in rows:
        if r.url_hash % 2 == 0:
            assert r.ok and r.status_code == 200
            assert [s.kind for s in r.spans] == ["stat", "text"]
            assert r.spans[0].text == "rendered=1"
            assert r.spans[1].text == f"hello {r.url_hash}"
            assert [s.offset for s in r.spans] == [0, 1]
        else:
            assert (not r.ok) and r.status_code == 500
            assert r.spans == []
