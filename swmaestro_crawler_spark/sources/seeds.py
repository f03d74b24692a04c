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
