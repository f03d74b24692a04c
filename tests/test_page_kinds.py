"""Typed page kinds mirror the reference's crawl graph (supervisor
stages channel -> playlist -> watch): template shapes and link-target
kinds per page kind, and a crawl from channel seeds traverses the graph."""

from __future__ import annotations

import re

from swmaestro_crawler_spark.config import CrawlConfig
from swmaestro_crawler_spark.sources import synth_web


CFG = CrawlConfig(synth_n_hosts=20)


def _kind_of(url: str) -> str:
    m = re.search(r"://[^/]*/(ch|pl|w)/", url)
    return m.group(1) if m else "w"


def test_channel_page_shape():
    for i in range(20):
        url = f"http://host{i % 20:04d}.example.com/ch/{i:012x}"
        page = synth_web.page_for(url, CFG)
        kinds = [s[0] for s in page["spans"]]
        assert kinds[0] == "stat" and "subscribers=" in page["spans"][0][1]
        assert kinds.count("text") == 2
        assert kinds.count("media") == 1  # avatar
        assert "tag" not in kinds
        host = url.split("://")[1].split("/")[0]
        assert 2 <= len(page["outlinks"]) <= 4
        for t in page["outlinks"]:
            assert _kind_of(t) == "pl" and host in t  # own-host playlists


def test_playlist_page_shape():
    saw_next_page = False
    for i in range(40):
        url = f"http://host{i % 20:04d}.example.com/pl/{i:012x}"
        page = synth_web.page_for(url, CFG)
        kinds = [s[0] for s in page["spans"]]
        assert "items=" in page["spans"][0][1]
        assert kinds.count("text") == 1 and "media" not in kinds
        host = url.split("://")[1].split("/")[0]
        tks = [_kind_of(t) for t in page["outlinks"]]
        assert all(host in t for t in page["outlinks"])  # own host only
        assert tks.count("pl") <= 1  # at most one next-page continuation
        saw_next_page |= "pl" in tks
        assert all(k in ("w", "pl") for k in tks)
    assert saw_next_page  # pagination exists somewhere


def test_watch_page_shape():
    cross = 0
    for i in range(40):
        url = f"http://host{i % 20:04d}.example.com/w/{i:012x}"
        page = synth_web.page_for(url, CFG)
        assert "views=" in page["spans"][0][1]
        assert all(_kind_of(t) == "w" for t in page["outlinks"])
        host = url.split("://")[1].split("/")[0]
        cross += sum(host not in t for t in page["outlinks"])
    assert cross > 0  # related videos cross hosts


def test_crawl_traverses_graph(spark, cfg, tmp_path):
    from pyspark.sql import functions as F

    from swmaestro_crawler_spark.plans.crawl import Crawl
    from swmaestro_crawler_spark.schema import SPANS_DOC

    crawl = Crawl(spark, cfg)
    crawl.run(spark.createDataFrame(synth_web.make_seeds(cfg, 40)), rounds=3)
    docs = crawl.cat.read("spans", SPANS_DOC)
    kind = F.regexp_extract("doc_id", r"://[^/]*/(ch|pl|w)/", 1)
    got = {r[0] for r in docs.select(kind).distinct().collect()}
    assert got == {"ch", "pl", "w"}  # all three stages fetched
