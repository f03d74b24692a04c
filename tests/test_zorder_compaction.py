"""Z-order compaction: after ``compact(zorder_by=(x, y))`` the manifest
min/max stats prune files on EITHER column, which a single-column sort
cannot do — plus exactness of the engine-shared bit math vs a Python
mirror, and read_range row-level correctness after the rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog
from swmaestro_crawler_spark.functions.zorder import (
    norm16_sql,
    spread16_sql,
    zvalue_norm_sql,
)

SCHEMA = StructType(
    [
        StructField("x", LongType(), False),
        StructField("y", LongType(), False),
        StructField("payload", LongType(), False),
    ]
)

N = 4096
FILES = 64


def _spread16_py(v: int) -> int:
    v &= 0xFFFF
    for sh, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        v = (v | (v << sh)) & mask
    return v


def _grid_df(spark):
    # the full 64x64 grid, one point per cell -> x and y independent, and
    # every unordered append file spans the full range of both
    rows = [(i % 64, (i // 64) % 64, i) for i in range(N)]
    return spark.createDataFrame(rows, SCHEMA)


def _files_matching(cat, col, lo, hi):
    return cat.prune_files("t", col, lo, hi)


def test_zorder_prunes_both_columns(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = _grid_df(spark)
    # 4 appends of unordered rows: nothing prunable before the rewrite
    for i in range(4):
        cat.append("t", df.filter(F.col("payload") % 4 == i), stat_cols=["x", "y"])
    before_x = _files_matching(cat, "x", 10, 20)
    assert len(before_x) == len(cat.data_files("t"))  # every file may match

    sid = cat.compact(
        "t", SCHEMA, target_file_rows=N // FILES, zorder_by=("x", "y")
    )
    assert sid is not None
    total = len(cat.data_files("t"))
    assert total >= FILES // 2

    # a ~1/6 band on EITHER axis must skip well over half the files
    x_files = _files_matching(cat, "x", 10, 20)
    y_files = _files_matching(cat, "y", 10, 20)
    assert len(x_files) < total / 2, (len(x_files), total)
    assert len(y_files) < total / 2, (len(y_files), total)

    # row-level correctness of the pruned scan
    got = sorted(
        r.payload
        for r in cat.read_range("t", SCHEMA, "x", 10, 20).collect()
    )
    want = sorted(r.payload for r in df.filter("x BETWEEN 10 AND 20").collect())
    assert got == want


def test_single_column_sort_cannot_prune_the_other(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", _grid_df(spark), stat_cols=["x", "y"])
    cat.compact(
        "t", SCHEMA, target_file_rows=N // FILES, cluster_by="x", stat_cols=["y"]
    )
    total = len(cat.data_files("t"))
    x_files = _files_matching(cat, "x", 10, 20)
    y_files = _files_matching(cat, "y", 10, 20)
    assert len(x_files) < total / 2  # the sorted column prunes
    assert len(y_files) == total  # the other column cannot


def test_zvalue_sql_matches_python_mirror(spark):
    expr = zvalue_norm_sql("x", "y", (0, 65535), (0, 65535), engine="spark")
    rows = [(7, 9), (0, 0), (65535, 65535), (12345, 54321), (1, 65534)]
    df = spark.createDataFrame(rows, ["x", "y"]).selectExpr(
        "x", "y", expr + " AS z"
    )
    for r in df.collect():
        assert r.z == _spread16_py(r.x) | (_spread16_py(r.y) << 1)


def test_norm16_overflow_guard():
    with pytest.raises(ValueError):
        norm16_sql("c", 0, 1 << 48, engine="spark")
    # duckdb spelling differs only in the division operator
    assert "//" in norm16_sql("c", 0, 100, engine="duckdb")
    assert "div" in norm16_sql("c", 0, 100, engine="spark")
    assert "65535" in spread16_sql("c")
