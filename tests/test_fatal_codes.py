"""Fatal-code classification (C6/P5, VERDICT r1 task 5): fatal HTTP
codes (the 403/413 analogue, New_YouTube_Crawler_Comment.py:50-52) must
go STRAIGHT to dead letters with reason 'fatal_<code>' — bypassing the
bounded-retry path — while transient failures (500) still retry to
max_attempts. The engine and the sequential reference oracle must
diverge the two classes identically."""

from __future__ import annotations

import pytest

from oracle.reference_oracle import run_oracle
from swmaestro_crawler_spark.plans.crawl import Crawl
from swmaestro_crawler_spark.schema import DEAD
from swmaestro_crawler_spark.sources.synth_web import make_seeds


@pytest.fixture(scope="module")
def fatal_pair(spark, tmp_path_factory):
    from tests.conftest import small_cfg

    # high enough rates that BOTH classes appear: fatal pages at 15%,
    # transient failure at 45% with only 2 attempts so max_attempts deads
    # also occur within 3 rounds
    cfg = small_cfg(
        str(tmp_path_factory.mktemp("wh_fatal")),
        synth_fail_prob=0.45,
        synth_fatal_prob=0.15,
        max_attempts=2,
    )
    seeds = make_seeds(cfg, 60)
    oracle = run_oracle(seeds, cfg)
    engine = Crawl(spark, cfg)
    engine.run(spark.createDataFrame(seeds), rounds=cfg.max_rounds)
    return cfg, oracle, engine


def test_dead_letters_identical_with_fatal_classes(fatal_pair):
    _, oracle, engine = fatal_pair
    got = sorted(
        (r.url, r.reason, r.dead_round) for r in engine.cat.read("dead", DEAD).collect()
    )
    assert got == sorted(oracle.dead)


def test_both_classes_present_and_divergent(fatal_pair):
    """The classes must actually diverge in-run: fatal deads exist AND
    max_attempts deads exist, and they dispose differently."""
    _, oracle, engine = fatal_pair
    rows = engine.cat.read("dead", DEAD).collect()
    reasons = {r.reason for r in rows}
    assert reasons & {"fatal_403", "fatal_413"}, reasons
    assert "max_attempts" in reasons, reasons


def test_fatal_bypasses_retry(fatal_pair):
    """A fatal URL dies at its CURRENT attempt (never incremented, never
    requeued); a max_attempts URL has been retried to the budget."""
    cfg, _, engine = fatal_pair
    rows = engine.cat.read("dead", DEAD).collect()
    for r in rows:
        if r.reason.startswith("fatal_"):
            assert r.attempt == 0, (r.url, r.attempt)
        elif r.reason == "max_attempts":
            assert r.attempt == cfg.max_attempts, (r.url, r.attempt)


def test_fatal_urls_never_retried(fatal_pair):
    """Every fetch of a fatal URL produces exactly one dead letter (a URL
    may be fetched more than once only via LINK re-discovery across
    rounds — never via the retry path), so per fatal URL:
    #crawl_order fetches == #dead entries."""
    from swmaestro_crawler_spark.schema import CRAWL_ORDER

    _, oracle, engine = fatal_pair
    fatal_urls = {u for (u, reason, _r) in oracle.dead if reason.startswith("fatal_")}
    assert fatal_urls
    orders = engine.cat.read("crawl_order", CRAWL_ORDER).collect()
    fetches: dict[str, int] = {}
    for row in orders:
        fetches[row.url] = fetches.get(row.url, 0) + 1
    deads: dict[str, int] = {}
    for u, reason, _r in oracle.dead:
        if reason.startswith("fatal_"):
            deads[u] = deads.get(u, 0) + 1
    for u in fatal_urls:
        assert fetches.get(u, 0) == deads[u], (u, fetches.get(u), deads[u])
