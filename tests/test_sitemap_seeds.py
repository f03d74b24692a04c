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


def test_robots_sitemap_discovery_chain(spark, tmp_path):
    """robots.txt -> Sitemap: directive -> sitemap body -> seeds: the
    full discovery chain, with the extraction matching a python re parse
    and the politeness parse UNCHANGED by the added directive."""
    import pandas as pd

    from swmaestro_crawler_spark.functions.robots import (
        parse_robots_frame,
        sitemaps_from_robots_bodies,
    )
    from swmaestro_crawler_spark.sources.synth_web import robots_txt_for_host

    cfg = small_cfg(str(tmp_path / "wh"))
    names = list(hosts(5))
    bodies = spark.createDataFrame(
        [(h, robots_txt_for_host(h, cfg)) for h in names], "host string, body string"
    )
    got = {(r.host, r.sitemap_url) for r in sitemaps_from_robots_bodies(bodies).collect()}
    want = set()
    for h in names:
        for u in re.findall(
            r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)", robots_txt_for_host(h, cfg)
        ):
            want.add((h, u))
    assert got == want and len(got) == len(names)
    assert all(u == f"http://{h}/sitemap.xml" for h, u in got)
    # the structured politeness parse ignores the Sitemap directive
    body = robots_txt_for_host(names[0], cfg)
    with_line = parse_robots_frame(pd.Series([body]))
    without = parse_robots_frame(
        pd.Series(["\n".join(l for l in body.split("\n") if not l.startswith("Sitemap"))])
    )
    assert with_line["crawl_delay_s"].tolist() == without["crawl_delay_s"].tolist()
    assert with_line["disallow_prefixes"].tolist() == without["disallow_prefixes"].tolist()
    # chain: discovered hosts' sitemap bodies produce the same seeds as
    # addressing the sitemaps directly
    discovered_hosts = sorted(h for h, _u in got)
    via_chain = seeds_from_sitemap_bodies(
        synth_sitemap_bodies(spark, cfg, discovered_hosts)
    )
    direct = seeds_from_sitemap_bodies(synth_sitemap_bodies(spark, cfg, names))
    assert {tuple(r) for r in via_chain.collect()} == {tuple(r) for r in direct.collect()}


def test_malformed_sitemap_yields_no_rows(spark):
    bodies = spark.createDataFrame(
        [("h.test", "<html>not a sitemap</html>"), ("i.test", "")],
        "host string, xml string",
    )
    assert seeds_from_sitemap_bodies(bodies).count() == 0


def test_sitemap_index_expansion(spark):
    """<sitemapindex> shards expand to child sitemap URLs, and the seed
    extractor refuses to read an index body as pages — the two formats
    never cross-contaminate."""
    from swmaestro_crawler_spark.sources.seeds import expand_sitemap_index

    index_xml = (
        '<?xml version="1.0"?>\n<sitemapindex>\n'
        + "\n".join(
            f"  <sitemap>\n    <loc>http://big.test/sitemap-{c}.xml</loc>\n"
            f"    <lastmod>2024-02-0{i+1}</lastmod>\n  </sitemap>"
            for i, c in enumerate("ab")
        )
        # spec-legal entry with <lastmod> BEFORE <loc> (and a comment):
        # must not be dropped (ADVICE r3: anchoring <loc> after <sitemap>
        # silently lost such shards)
        + "\n  <sitemap>\n    <lastmod>2024-02-03</lastmod>\n"
        "    <!-- shard c -->\n    <loc>http://big.test/sitemap-c.xml</loc>\n"
        "  </sitemap>"
        + "\n</sitemapindex>\n"
    )
    urlset_xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url><loc>http://small.test/page</loc></url>\n</urlset>\n"
    )
    bodies = spark.createDataFrame(
        [("big.test", index_xml), ("small.test", urlset_xml)],
        "host string, xml string",
    )
    children = {(r.host, r.sitemap_url) for r in expand_sitemap_index(bodies).collect()}
    assert children == {
        ("big.test", f"http://big.test/sitemap-{c}.xml") for c in "abc"
    }
    seeds = seeds_from_sitemap_bodies(bodies).collect()
    assert [(r.url, r.rank) for r in seeds] == [("http://small.test/page", 1)]
