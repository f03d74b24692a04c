"""Seed-list sources: CSV / JSON-lines with explicit schemas.

The reference seeds its frontier from per-category CSVs scraped off
Nox/Vling ranking pages (``pd.read_csv('channel.csv', header=None)``,
Utils/Insert_Nox_Data_to_DB.py:27,35; writers at Utils/Nox_Crawler.py:115,
Utils/Vling_Crawler.py:126). Engine equivalents: schema'd ``spark.read``
scans — never inferSchema on the data path (a second pass over the files
at scale, and nondeterministic typing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import SEEDS


def load_seed_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV seed list -> SEEDS-schema DataFrame (url, category, rank_kind,
    rank). Malformed rows are dropped, mirroring the reference's silent
    skip of unparseable ranking rows."""
    return (
        spark.read.schema(SEEDS)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def load_seed_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines seed list with the same explicit schema."""
    return spark.read.schema(SEEDS).json(path)


def write_seed_csv(df: DataFrame, path: str) -> None:
    """Diagnostic CSV sink (reference K7: seed lists/error dumps to CSV)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


LOC_RE = "<loc>([^<]+)</loc>"
LASTMOD_RE = "<lastmod>([^<]+)</lastmod>"


def expand_sitemap_index(bodies: DataFrame) -> DataFrame:
    """(host, xml) sitemap-INDEX bodies -> (host, sitemap_url): large
    sites shard their URL space into a <sitemapindex> of child sitemaps;
    this extracts the child locations (codegen regexp, like the <loc>
    seed path) so the caller can fetch them and feed the result back to
    seeds_from_sitemap_bodies. Gated on the body containing
    ``<sitemapindex`` and extracted with the plain LOC_RE — mirroring the
    ``<urlset`` gate in seeds_from_sitemap_bodies — so a spec-legal index
    entry with <lastmod>, comments, or attributes before its <loc> is
    still captured (anchoring <loc> directly after <sitemap> silently
    dropped those shards). A plain <urlset> body yields zero rows here
    (the gate fails), so the two extractors compose without
    misclassifying either format."""
    from pyspark.sql import functions as F

    locs = F.regexp_extract_all(F.col("xml"), F.lit(LOC_RE), 1)
    return (
        bodies.filter(F.col("xml").contains("<sitemapindex"))
        .select("host", F.explode(locs).alias("sitemap_url"))
    )


def seeds_from_sitemap_bodies(bodies: DataFrame) -> DataFrame:
    """(host, xml) -> SEEDS rows: every ``<loc>`` URL becomes a seed,
    ranked by its position in the sitemap (publishers order sitemaps by
    importance), category ``sitemap:<host>``.

    The XML never leaves the JVM: ``regexp_extract_all`` + ``posexplode``
    are whole-stage-codegen expressions (the plan shows no Python
    evaluation node — pinned by tests/test_sitemap_seeds.py), so a
    10^6-host sitemap sweep is one narrow scan, shuffle-free until the
    frontier union. Malformed/empty sitemaps yield zero rows (explode of
    an empty array) — the same silent-skip the CSV path applies. Bodies
    that are <sitemapindex> shards (their <loc> tags point at CHILD
    sitemaps, not pages) are excluded by the <urlset> gate — route them
    through expand_sitemap_index first."""
    from pyspark.sql import functions as F

    locs = F.expr(f"regexp_extract_all(xml, '{LOC_RE}', 1)")
    return (
        bodies.filter(F.col("xml").contains("<urlset"))
        .select("host", F.posexplode(locs).alias("pos", "url"))
        .select(
            "url",
            F.concat(F.lit("sitemap:"), F.col("host")).alias("category"),
            F.lit("sitemap").alias("rank_kind"),
            (F.col("pos") + 1).cast("int").alias("rank"),
        )
    )


def synth_sitemap_bodies(
    spark: SparkSession, cfg, host_names: list[str], n_urls: int = 20
) -> DataFrame:
    """(host, xml) frame from the synthetic web's deterministic sitemap
    generator — the sandbox stand-in for fetching ``/sitemap.xml``
    through the batch transport (swap the body column's source for a
    fetch stage in production; the parse side is identical)."""
    from .synth_web import sitemap_xml_for_host

    return spark.createDataFrame(
        [(h, sitemap_xml_for_host(h, cfg, n_urls)) for h in host_names],
        "host string, xml string",
    )
