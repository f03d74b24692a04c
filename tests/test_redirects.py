"""Redirect (3xx) semantics: vectorized chain resolution vs the scalar
mirror, full engine-vs-oracle crawl equality with redirects on, and the
digest-neutrality of the default-off configuration.

The reference's ``requests`` sessions follow redirects transparently and
record everything under the requested URL; the engine mirrors that for
same-host chains (followed inline in the vectorized fetch) but routes
cross-host targets back through the frontier as a 301 handoff so the
target host's politeness budget applies, and kills >max-hop chains with
508 (Loop Detected) -> dead letter."""

from __future__ import annotations

import numpy as np
import pytest

from oracle.reference_oracle import run_oracle
from swmaestro_crawler_spark.functions.hashing import xxhash64, xxhash64_np_fixed, xxhash64_str
from swmaestro_crawler_spark.plans.crawl import Crawl
from swmaestro_crawler_spark.schema import CRAWL_ORDER, DEAD, SEEN, SPANS_DOC
from swmaestro_crawler_spark.sources import synth_web as sw
from swmaestro_crawler_spark.sources.synth_web import make_seeds
from tests.conftest import small_cfg


def test_xxhash64_np_fixed_matches_scalar():
    rng = np.random.default_rng(7)
    for width in (1, 4, 8, 12, 31, 32, 42, 64, 70):
        mat = rng.integers(0, 256, size=(64, width), dtype=np.uint8)
        got = xxhash64_np_fixed(mat)
        want = np.array([xxhash64(bytes(row)) for row in mat], dtype=np.int64)
        assert (got == want).all(), width


def _sample_urls(n_hosts: int, n: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    return [
        f"http://host{int(i):04d}.example.com/w/{int(p):012x}"
        for i, p in zip(rng.integers(0, n_hosts, n), rng.integers(0, 1 << 48, n))
    ]


def test_resolve_redirects_np_matches_scalar(tmp_path):
    cfg = small_cfg(str(tmp_path / "wh"), synth_redirect_prob=0.3, synth_n_hosts=50)
    urls = _sample_urls(50, 400)
    hosts = np.array([sw._host_of(u) for u in urls], dtype=object)
    hashes = np.array([xxhash64_str(u) for u in urls], dtype=np.int64)
    eff, code, handoff, followed = sw.resolve_redirects_np(hashes, hosts, cfg)
    handoff = handoff.to_pylist()
    n301 = n508 = nfol = 0
    for k, u in enumerate(urls):
        ho, fin, co = sw.resolve_redirect(u, cfg)
        assert co == code[k]
        if co == sw.REDIRECT_CODE:
            assert handoff[k] == ho
            n301 += 1
        elif co == sw.REDIRECT_LOOP_CODE:
            n508 += 1
        else:
            assert eff[k] == xxhash64_str(fin)
            if fin != u:
                nfol += 1
                assert followed[k]
            else:
                assert not followed[k]
    # the sample must actually exercise every path
    assert n301 > 0 and nfol > 0


def test_hop_limit_resolves_to_508(tmp_path):
    cfg = small_cfg(
        str(tmp_path / "wh"),
        synth_redirect_prob=0.9,
        synth_redirect_same=1.0,
        max_redirect_hops=1,
        synth_n_hosts=50,
    )
    urls = _sample_urls(50, 200)
    hosts = np.array([sw._host_of(u) for u in urls], dtype=object)
    hashes = np.array([xxhash64_str(u) for u in urls], dtype=np.int64)
    _, code, _, _ = sw.resolve_redirects_np(hashes, hosts, cfg)
    got = np.array([sw.resolve_redirect(u, cfg)[2] for u in urls])
    assert (got == code).all()
    assert (code == sw.REDIRECT_LOOP_CODE).sum() > 0


def test_redirects_off_is_identity(tmp_path):
    cfg = small_cfg(str(tmp_path / "wh"))  # synth_redirect_prob = 0.0
    urls = _sample_urls(20, 50)
    hashes = np.array([xxhash64_str(u) for u in urls], dtype=np.int64)
    eff, code, handoff, followed = sw.resolve_redirects_np(
        hashes, np.array([sw._host_of(u) for u in urls], dtype=object), cfg
    )
    assert (eff == hashes).all() and (code == 0).all() and handoff is None
    assert not followed.any()


@pytest.fixture(scope="module")
def redirect_crawl_pair(spark, tmp_path_factory):
    cfg = small_cfg(
        str(tmp_path_factory.mktemp("wh")),
        synth_redirect_prob=0.15,
        synth_fail_prob=0.1,
    )
    seeds = make_seeds(cfg, 60)
    oracle = run_oracle(seeds, cfg)
    engine = Crawl(spark, cfg)
    engine.run(spark.createDataFrame(seeds), rounds=cfg.max_rounds)
    return cfg, oracle, engine


def test_redirect_crawl_order_identical(redirect_crawl_pair):
    _, oracle, engine = redirect_crawl_pair
    got = [
        (r.round, r.ord, r.url, r.host, r.depth, r.ok)
        for r in engine.cat.read("crawl_order", CRAWL_ORDER)
        .orderBy("round", "ord")
        .collect()
    ]
    assert got == oracle.crawl_order
    # the crawl actually hit redirects: some admitted rows are neither ok
    # nor in dead/retries (the 301 handoffs)
    assert any(not ok for (_, _, _, _, _, ok) in got)


def test_redirect_seen_and_spans_identical(redirect_crawl_pair):
    _, oracle, engine = redirect_crawl_pair
    rows = engine.cat.read("seen", SEEN).collect()
    assert {r.url_hash for r in rows} == oracle.seen
    assert {r.url_hash: r.fingerprint for r in rows} == oracle.fingerprints
    docs = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in engine.cat.read("spans", SPANS_DOC).collect()
    }
    assert docs == oracle.docs


def test_redirect_dead_letters_identical(redirect_crawl_pair):
    cfg, oracle, engine = redirect_crawl_pair
    got = sorted(
        (r.url, r.reason, r.dead_round) for r in engine.cat.read("dead", DEAD).collect()
    )
    assert got == sorted(oracle.dead)


def test_redirect_paths_were_exercised(redirect_crawl_pair):
    """The equality above is vacuous unless the crawl actually contains
    handoffs and followed chains — prove both happened."""
    cfg, oracle, engine = redirect_crawl_pair
    order = engine.cat.read("crawl_order", CRAWL_ORDER).collect()
    fetched_urls = [r.url for r in order]
    hashes = np.array([xxhash64_str(u) for u in fetched_urls], dtype=np.int64)
    is_src = sw.is_redirect_np(hashes, cfg)
    assert is_src.sum() > 0, "no redirect sources were ever admitted"
    codes = [sw.resolve_redirect(u, cfg)[2] for u in np.array(fetched_urls)[is_src]]
    assert any(c == sw.REDIRECT_CODE for c in codes), "no cross-host handoff occurred"
    assert any(c == 0 for c in codes), "no same-host chain was followed inline"
