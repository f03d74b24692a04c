"""Sitemap ingestion: deterministic sitemap bodies, codegen-only XML
seed extraction, and the extracted seeds driving a real crawl."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from swmaestro_crawler_spark.sources.seeds import (
    seeds_from_sitemap_bodies,
    synth_sitemap_bodies,
)
from swmaestro_crawler_spark.sources.synth_web import hosts, sitemap_xml_for_host
from tests.conftest import small_cfg
from tests.test_plans import plan_of


def test_extraction_matches_python_parse(spark, tmp_path):
    cfg = small_cfg(str(tmp_path / "wh"))
    names = list(hosts(6))
    bodies = synth_sitemap_bodies(spark, cfg, names, n_urls=15)
    got = {
        (r.url, r.category, r.rank)
        for r in seeds_from_sitemap_bodies(bodies).collect()
    }
    want = set()
    for h in names:
        xml = sitemap_xml_for_host(h, cfg, 15)
        for i, loc in enumerate(re.findall(r"<loc>([^<]+)</loc>", xml)):
            want.add((loc, f"sitemap:{h}", i + 1))
    assert got == want and len(got) == 6 * 15


def test_extraction_is_jvm_only(spark, tmp_path):
    """The XML parse must be codegen expressions — no Python eval node
    anywhere in the plan (the no-per-row-Python hot-path rule)."""
    cfg = small_cfg(str(tmp_path / "wh"))
    bodies = synth_sitemap_bodies(spark, cfg, list(hosts(3)))
    plan = plan_of(seeds_from_sitemap_bodies(bodies))
    # (the fixture's createDataFrame source mentions applySchemaToPythonRDD;
    # what must be absent is any Python EVALUATION operator)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonUDF"):
        assert node not in plan, node
    assert "Generate" in plan and "regexp_extract_all" in plan


def test_sitemap_is_deterministic(spark, tmp_path):
    cfg = small_cfg(str(tmp_path / "wh"))
    h = list(hosts(2))[1]
    assert sitemap_xml_for_host(h, cfg) == sitemap_xml_for_host(h, cfg)
    # different hosts publish different URL sets
    assert sitemap_xml_for_host(h, cfg) != sitemap_xml_for_host(list(hosts(2))[0], cfg)


def test_sitemap_seeds_drive_a_crawl(spark, tmp_path):
    from swmaestro_crawler_spark.plans.crawl import Crawl
    from swmaestro_crawler_spark.schema import SEEDS

    cfg = small_cfg(str(tmp_path / "wh"))
    bodies = synth_sitemap_bodies(spark, cfg, list(hosts(cfg.synth_n_hosts))[:8])
    seeds = spark.createDataFrame(
        seeds_from_sitemap_bodies(bodies).collect(), SEEDS
    )
    crawl = Crawl(spark, cfg)
    results = list(crawl.run(seeds, rounds=1))
    assert len(results) == 1 and results[0].fetched_ok > 0


def test_malformed_sitemap_yields_no_rows(spark):
    bodies = spark.createDataFrame(
        [("h.test", "<html>not a sitemap</html>"), ("i.test", "")],
        "host string, xml string",
    )
    assert seeds_from_sitemap_bodies(bodies).count() == 0
