"""CSV/JSONL seed sources round-trip with explicit schemas (reference
S10/K7), and seeds flow into the frontier unchanged."""

from __future__ import annotations

import json
import os

from swmaestro_crawler_spark.sources.seeds import (
    load_seed_csv,
    load_seed_jsonl,
    write_seed_csv,
)
from swmaestro_crawler_spark.sources.synth_web import make_seeds


def test_csv_roundtrip_and_frontier(spark, cfg, tmp_path):
    seeds = make_seeds(cfg, 40)
    df = spark.createDataFrame(seeds)
    out = str(tmp_path / "seeds_csv")
    write_seed_csv(df.select("url", "category", "rank_kind", "rank"), out)

    back = load_seed_csv(spark, out)
    assert sorted(r.url for r in back.collect()) == sorted(s["url"] for s in seeds)
    assert [f.name for f in back.schema.fields] == ["url", "category", "rank_kind", "rank"]

    from swmaestro_crawler_spark.plans.crawl import seeds_to_frontier

    frontier = seeds_to_frontier(back)
    rows = frontier.collect()
    assert len(rows) == 40
    assert all(r.depth == 0 and r.attempt == 0 for r in rows)


def test_jsonl_with_malformed_rows(spark, cfg, tmp_path):
    seeds = make_seeds(cfg, 10)
    p = tmp_path / "seeds.jsonl"
    lines = [json.dumps(s) for s in seeds] + ["{not valid json"]
    p.write_text("\n".join(lines))
    back = load_seed_jsonl(spark, str(p))
    ok = [r for r in back.collect() if r.url is not None]
    assert len(ok) == 10
