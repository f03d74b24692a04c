"""End-to-end golden test: the DataFrame engine must reproduce the
row-at-a-time reference oracle EXACTLY — crawl order, URL-seen membership,
fingerprints, dead letters, and per-document span sequences
(the BASELINE.json invariants)."""

from __future__ import annotations

import math

import pytest

from oracle.reference_oracle import run_oracle
from swmaestro_crawler_spark.plans.crawl import Crawl
from swmaestro_crawler_spark.schema import CRAWL_ORDER, DEAD, FRONTIER, SEEN, SPANS_DOC
from swmaestro_crawler_spark.sources.synth_web import make_seeds


@pytest.fixture(scope="module")
def crawl_pair(spark, tmp_path_factory):
    from tests.conftest import small_cfg

    cfg = small_cfg(str(tmp_path_factory.mktemp("wh")), synth_fail_prob=0.15)
    seeds = make_seeds(cfg, 60)
    oracle = run_oracle(seeds, cfg)
    engine = Crawl(spark, cfg)
    engine.run(spark.createDataFrame(seeds), rounds=cfg.max_rounds)
    return cfg, oracle, engine


def test_crawl_order_identical(crawl_pair):
    _, oracle, engine = crawl_pair
    got = [
        (r.round, r.ord, r.url, r.host, r.depth, r.ok)
        for r in engine.cat.read("crawl_order", CRAWL_ORDER)
        .orderBy("round", "ord")
        .collect()
    ]
    assert len(got) == len(oracle.crawl_order)
    assert got == oracle.crawl_order


def test_seen_membership_identical(crawl_pair):
    _, oracle, engine = crawl_pair
    rows = engine.cat.read("seen", SEEN).collect()
    assert {r.url_hash for r in rows} == oracle.seen
    assert {r.url_hash: r.fingerprint for r in rows} == oracle.fingerprints


def test_span_sequences_identical(crawl_pair):
    _, oracle, engine = crawl_pair
    rows = engine.cat.read("spans", SPANS_DOC).collect()
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans] for r in rows
    }
    assert len(rows) == len(got), "duplicate doc_ids written"
    assert got == oracle.docs


def test_dead_letters_identical(crawl_pair):
    _, oracle, engine = crawl_pair
    got = sorted(
        (r.url, r.reason, r.dead_round) for r in engine.cat.read("dead", DEAD).collect()
    )
    assert got == sorted(oracle.dead)


def test_remaining_frontier_identical(crawl_pair):
    _, oracle, engine = crawl_pair
    got = {
        (r.url_hash, r.attempt, r.depth, r.seq)
        for r in engine.cat.read("pending", FRONTIER).collect()
    }
    want = {(p.url_hash, p.attempt, p.depth, p.seq) for p in oracle.pending_left}
    assert got == want


def test_politeness_budget_never_exceeded(crawl_pair):
    cfg, _, engine = crawl_pair
    from swmaestro_crawler_spark.sources.synth_web import robots_for_host

    orders = engine.cat.read("crawl_order", CRAWL_ORDER).collect()
    per = {}
    for r in orders:
        per[(r.round, r.host)] = per.get((r.round, r.host), 0) + 1
    for (rnd, host), n in per.items():
        delay = robots_for_host(host, cfg)["crawl_delay_s"]
        budget = min(cfg.per_host_cap, max(1, math.floor(cfg.round_seconds / delay)))
        assert n <= budget, (rnd, host, n, budget)
