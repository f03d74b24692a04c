"""Deterministic synthetic web — the sandbox transport.

``page_for(url)`` is a PURE function of the canonical URL: the same URL
always yields the same interleaved span document and outlinks. Both the
engine's batch fetcher and the reference oracle call exactly this module,
so crawl results are comparable byte-for-byte without a network.

Page shape mirrors what the reference harvests from one watch page:
stats first (view/like counts yielded before comments,
New_YouTube_Crawler_Comment.py:121,175), then interleaved text spans and
media refs (comment text vs author thumbnail URL,
New_YouTube_Crawler_Comment.py:172,182), tag spans (og:video:tag metas,
view_count_crawler.py:132-135), then outlinks (playlist/continuation
expansion, New_YouTube_Crawler.py:213-229).

Host popularity is Zipf-skewed (s=1.2) so one hot domain exists — the
skew axis the salted host bucketing defuses.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..config import CrawlConfig
from ..functions.hashing import stable64

VOCAB = [f"lorem{i:03d}" for i in range(64)] + [
    "crawl", "frontier", "span", "media", "video", "channel", "comment",
    "politeness", "robots", "bloom", "cuckoo", "shard", "replica", "quorum",
]


@lru_cache(maxsize=8)
def hosts(n_hosts: int) -> tuple[str, ...]:
    return tuple(f"host{i:04d}.example.com" for i in range(n_hosts))


@lru_cache(maxsize=8)
def _zipf_cdf(n_hosts: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def _rng(tag: str, url: str, extra: str = "") -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(stable64(f"{tag}:{url}:{extra}")))


def _pick_host(rng: np.random.Generator, cfg: CrawlConfig) -> str:
    cdf = _zipf_cdf(cfg.synth_n_hosts, cfg.synth_zipf_s)
    return hosts(cfg.synth_n_hosts)[int(np.searchsorted(cdf, rng.random()))]


def _new_path(rng: np.random.Generator) -> str:
    return f"/p/{rng.integers(0, 1 << 48):012x}"


def fetch_ok(url: str, attempt: int, cfg: CrawlConfig) -> bool:
    """Deterministic transient failure — per (url, attempt), so a retry can
    succeed (reference retry loop: New_YouTube_Crawler_Comment.py:45-53)."""
    return _rng("fetch", url, str(attempt)).random() >= cfg.synth_fail_prob


def page_for(url: str, cfg: CrawlConfig) -> dict:
    """Pure URL -> {spans: [(kind,text,media_ref,offset)...], outlinks: [...]}"""
    rng = _rng("page", url)
    host = url.split("://", 1)[1].split("/", 1)[0]
    spans: list[tuple[str, str, str, int]] = []
    off = 0

    views = int(rng.integers(0, 1_000_000))
    likes = int(rng.integers(0, 10_000))
    dislikes = int(rng.integers(0, 1_000))
    spans.append(("stat", f"views={views} likes={likes} dislikes={dislikes}", "", off))
    off += 1

    for _ in range(int(rng.integers(1, 6))):
        words = rng.choice(len(VOCAB), size=int(rng.integers(5, 15)))
        spans.append(("text", " ".join(VOCAB[w] for w in words), "", off))
        off += 1
        if rng.random() < 0.4:
            spans.append(
                ("media", "", f"http://cdn.example.com/img/{rng.integers(0, 1 << 40):010x}.jpg", off)
            )
            off += 1

    for _ in range(int(rng.integers(0, 3))):
        spans.append(("tag", VOCAB[int(rng.integers(0, len(VOCAB)))], "", off))
        off += 1

    outlinks: list[str] = []
    for _ in range(int(rng.integers(2, 9))):
        if rng.random() < 0.5:
            target = f"http://{host}{_new_path(rng)}"
        else:
            target = f"http://{_pick_host(rng, cfg)}{_new_path(rng)}"
        outlinks.append(target)
        spans.append(("link", "", target, off))
        off += 1

    return {"spans": spans, "outlinks": outlinks}


def robots_for_host(host: str, cfg: CrawlConfig) -> dict:
    """Deterministic robots entry: crawl-delay drawn from the reference's
    own constants {0.2, 1.0, 6.0} (New_YouTube_Crawler.py:93 /
    New_YouTube_Crawler_Comment.py:443-448) and occasional disallows."""
    rng = _rng("robots", host)
    delay = [0.2, 1.0, 6.0][int(rng.integers(0, 3))]
    disallow = []
    if rng.random() < 0.25:
        disallow.append(f"/p/{rng.integers(0, 16):01x}")  # one hex-prefix shard blocked
    return {"host": host, "crawl_delay_s": delay, "disallow_prefixes": disallow, "fetched_round": 0}


def make_seeds(cfg: CrawlConfig, n_seeds: int = 100) -> list[dict]:
    """Deterministic seed list mirroring the Nox/Vling category rankings
    (Utils/Nox_Crawler.py:86-113): 15 categories x 4 rank orders."""
    rng = _rng("seeds", str(cfg.synth_seed), str(n_seeds))
    cats = [f"cat{i:02d}" for i in range(15)]
    kinds = ["score", "avgview", "growth", "views"]
    out = []
    for i in range(n_seeds):
        host = _pick_host(rng, cfg)
        out.append(
            {
                "url": f"http://{host}{_new_path(rng)}",
                "category": cats[int(rng.integers(0, len(cats)))],
                "rank_kind": kinds[i % 4],
                "rank": i // 4 + 1,
            }
        )
    return out
