"""Snapshot expiration + vacuum: old snapshots drop, unreferenced data
files are reclaimed, and zero-copy shared files survive while ANY table
still references them."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from swmaestro_crawler_spark.catalog import Catalog


def _files_on_disk(cat: Catalog, table: str) -> int:
    d = os.path.join(cat.warehouse, table, "data")
    return len(os.listdir(d)) if os.path.isdir(d) else 0


def test_expire_and_vacuum(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    schema = "id bigint"
    for i in range(5):
        cat.overwrite("t", spark.range(i, i + 10).coalesce(1))
    assert cat.current_snapshot("t") == 4
    assert _files_on_disk(cat, "t") == 5

    removed = cat.expire_snapshots("t", keep_last=2)
    assert removed == 3
    deleted = cat.vacuum()
    assert deleted == 3
    assert _files_on_disk(cat, "t") == 2
    # current snapshot still reads
    from pyspark.sql.types import LongType, StructField, StructType

    df = cat.read("t", StructType([StructField("id", LongType(), False)]))
    assert df.count() == 10


def test_vacuum_respects_zero_copy_shares(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    sid = cat.overwrite("src", spark.range(0, 10).select(F.col("id"), F.lit(True).alias("ok")).coalesce(1))
    cat.append_files("dst", "src", sid, row_filter="ok")

    # expire src down to nothing old, then overwrite it: the ORIGINAL file
    # is gone from src's manifest but dst still references it
    cat.overwrite("src", spark.range(10, 20).select(F.col("id"), F.lit(True).alias("ok")).coalesce(1))
    cat.expire_snapshots("src", keep_last=1)
    deleted = cat.vacuum()
    assert deleted == 0  # shared file survives via dst's manifest

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    dst = cat.read(
        "dst",
        StructType(
            [StructField("id", LongType(), False), StructField("ok", BooleanType(), False)]
        ),
    )
    assert dst.count() == 10  # zero-copy data intact
