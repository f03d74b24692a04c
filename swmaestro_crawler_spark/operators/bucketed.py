"""Bucketed tables: pay the big join's shuffle ONCE, at write time.

At 100 TB the dominant cost of a fact-to-fact join (spans x metrics,
frontier x seen) is shuffling BOTH sides on the key every time the join
runs. Spark's bucketed tables hash-partition the data into a fixed
bucket count when the table is written; a join of two tables bucketed on
the same key with the same bucket count scans bucket-aligned files and
joins with NO Exchange on either side — the sort-merge happens directly
on the bucketed scan. The nightly-pipeline idiom: land the heavily
re-joined tables bucketed, then every downstream join of them is
shuffle-free (tests/test_bucketed_join.py pins the Exchange-free plan).

This is the write-side complement of the catalog's read-side pruning
(catalog.read_range): bucketing co-locates by JOIN key, file stats skip
by RANGE predicate. A real deployment uses Iceberg's bucket partition
transform for the same effect; the sandbox has no Iceberg jar
(SURVEY.md §7.1), so this module uses Spark's native parquet bucketing
via the session catalog — the semantics (murmur3 hash on the key, fixed
bucket count, bucket-aware scan) are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.
    ``sort`` additionally sorts within buckets so downstream sort-merge
    joins skip their Sort as well."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Join two same-key same-bucket-count tables; Catalyst's bucketed
    scan makes this Exchange-free on both sides."""
    return spark.table(left).join(spark.table(right), key)
