"""SCD2 apply semantics: close/open on change, no-op suppression,
insert path, multi-batch chaining, and AS-OF reconstruction."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.relational import scd2_apply

DIM = "k long, v long, valid_from int, valid_to int, is_current boolean"


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM)


def test_scd2_close_noop_insert_untouched(spark):
    dim = _dim(spark, [(1, 10, 0, None, True), (2, 20, 0, None, True),
                       (3, 30, 0, None, True)])
    changes = spark.createDataFrame(
        [(1, 11), (2, 20), (4, 40)], "k long, v long"
    )
    out = {(r.k, r.valid_from): r for r in
           scd2_apply(dim, changes, "k", ["v"], 1).collect()}
    # key 1 changed: old row closed, new row open
    assert out[(1, 0)].valid_to == 1 and not out[(1, 0)].is_current
    assert out[(1, 1)].v == 11 and out[(1, 1)].is_current
    # key 2 identical: suppressed no-op, still the original open row
    assert out[(2, 0)].valid_to is None and out[(2, 0)].is_current
    assert (2, 1) not in out
    # key 3 untouched
    assert out[(3, 0)].is_current
    # key 4 brand new
    assert out[(4, 1)].v == 40 and out[(4, 1)].is_current
    assert len(out) == 5


def test_scd2_chains_batches_and_asof_reads(spark):
    dim = _dim(spark, [(1, 10, 0, None, True)])
    dim = scd2_apply(dim, spark.createDataFrame([(1, 11)], "k long, v long"),
                     "k", ["v"], 1)
    dim = scd2_apply(dim, spark.createDataFrame([(1, 12)], "k long, v long"),
                     "k", ["v"], 2)
    rows = sorted(map(tuple, dim.collect()))
    assert rows == [
        (1, 10, 0, 1, False),
        (1, 11, 1, 2, False),
        (1, 12, 2, None, True),
    ]
    # AS-OF batch 1: the row valid at t=1 is the v=11 version
    asof = dim.filter(
        (F.col("valid_from") <= 1)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 1))
    ).collect()
    assert len(asof) == 1 and asof[0].v == 11
    # exactly one current row per key, history is contiguous
    assert dim.filter("is_current").count() == 1
