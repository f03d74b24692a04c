"""Robots.txt TTL revalidation (cfg.robots_ttl_rounds): the crawler
re-fetches and re-parses every host's robots.txt every N rounds, and the
drifted policy (new /w/-shard disallows, re-drawn crawl-delays) binds
from that round on — full engine-vs-oracle crawl equality, default-off
identity, and proofs the drift actually occurred and actually bound."""

from __future__ import annotations

import pytest

from oracle.reference_oracle import run_oracle
from swmaestro_crawler_spark.plans.crawl import Crawl
from swmaestro_crawler_spark.schema import CRAWL_ORDER, DEAD, SEEN, SPANS_DOC
from swmaestro_crawler_spark.sources.synth_web import make_seeds, robots_for_host
from tests.conftest import small_cfg

TTL = 2
ROUNDS = 4


@pytest.fixture(scope="module")
def ttl_pair(spark, tmp_path_factory):
    cfg = small_cfg(
        str(tmp_path_factory.mktemp("wh_ttl")),
        max_rounds=ROUNDS,
        max_depth=ROUNDS,
        robots_ttl_rounds=TTL,
    )
    seeds = make_seeds(cfg, 60)
    oracle = run_oracle(seeds, cfg)
    engine = Crawl(spark, cfg)
    engine.run(spark.createDataFrame(seeds), rounds=ROUNDS)
    return cfg, oracle, engine


def test_epoch_zero_policy_unchanged(cfg):
    """epoch=0 must be byte-identical to the historic policy — the
    default (no TTL) path cannot change any digest."""
    from swmaestro_crawler_spark.sources.synth_web import hosts

    for h in hosts(cfg.synth_n_hosts):
        assert robots_for_host(h, cfg) == robots_for_host(h, cfg, 0)


def test_policy_actually_drifts(ttl_pair):
    """At least one host must tighten a /w/ shard and at least one must
    change its delay between epoch 0 and 1 (else the test is vacuous)."""
    cfg, _, _ = ttl_pair
    from swmaestro_crawler_spark.sources.synth_web import hosts

    e0 = {h: robots_for_host(h, cfg, 0) for h in hosts(cfg.synth_n_hosts)}
    e1 = {h: robots_for_host(h, cfg, 1) for h in hosts(cfg.synth_n_hosts)}
    assert any(
        len(e1[h]["disallow_prefixes"]) > len(e0[h]["disallow_prefixes"])
        for h in e0
    )
    assert any(e1[h]["crawl_delay_s"] != e0[h]["crawl_delay_s"] for h in e0)


def test_ttl_crawl_matches_oracle(ttl_pair):
    """Crawl order, seen set, spans, and dead letters all equal the
    sequential oracle's under the drifting policy."""
    _, oracle, engine = ttl_pair
    got_order = [
        (r.round, r.ord, r.url, r.host, r.depth, r.ok)
        for r in engine.cat.read("crawl_order", CRAWL_ORDER)
        .orderBy("round", "ord")
        .collect()
    ]
    assert got_order == oracle.crawl_order
    rows = engine.cat.read("seen", SEEN).collect()
    assert {r.url_hash for r in rows} == oracle.seen
    docs = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in engine.cat.read("spans", SPANS_DOC).collect()
    }
    assert docs == oracle.docs
    got_dead = sorted(
        (r.url, r.reason, r.dead_round)
        for r in engine.cat.read("dead", DEAD).collect()
    )
    assert got_dead == sorted(oracle.dead)


def test_new_rules_actually_bound(ttl_pair):
    """The drifted policy must be observable in the output: robots dead
    letters on /w/ pages exist ONLY at rounds >= TTL (epoch 0 disallows
    only the never-generated /p/ shard, so any /w/ robots kill proves
    the revalidated table was in force)."""
    _, _, engine = ttl_pair
    dead = engine.cat.read("dead", DEAD).collect()
    w_kills = [
        r for r in dead if r.reason == "robots" and "/w/" in r.url
    ]
    assert w_kills, "policy drift never bound — no /w/ robots kill"
    assert all(r.dead_round >= TTL for r in w_kills)


def test_ttl_off_is_identity(spark, tmp_path):
    """robots_ttl_rounds=None and =len-of-crawl both reproduce the
    historic (single-fetch) output exactly."""
    cfg_off = small_cfg(
        str(tmp_path / "wh_off"), max_rounds=3, max_depth=3
    )
    seeds = make_seeds(cfg_off, 40)
    oracle_off = run_oracle(seeds, cfg_off)
    # a TTL that never expires within the crawl == off
    cfg_long = small_cfg(
        str(tmp_path / "wh_long"),
        max_rounds=3,
        max_depth=3,
        robots_ttl_rounds=10,
    )
    engine = Crawl(spark, cfg_long)
    engine.run(spark.createDataFrame(seeds), rounds=3)
    got = [
        (r.round, r.ord, r.url, r.host, r.depth, r.ok)
        for r in engine.cat.read("crawl_order", CRAWL_ORDER)
        .orderBy("round", "ord")
        .collect()
    ]
    assert got == oracle_off.crawl_order
