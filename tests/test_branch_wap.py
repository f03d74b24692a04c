"""Write-audit-publish branches: staged commits are invisible on main
until publish, publish fast-forwards only when main did not move (else
CommitConflict), dropped branches leave main untouched, and expire
keeps staged branch heads alive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog, CommitConflict

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("v", LongType(), False),
    ]
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_stage_audit_publish(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", _df(spark, 0, 10))
    cat.create_branch("t", "audit")
    s1 = cat.append("t", _df(spark, 10, 20), branch="audit")
    s2 = cat.append("t", _df(spark, 20, 30), branch="audit")

    # staged writes are invisible on main, visible on the branch
    assert cat.read("t", SCHEMA).count() == 10
    assert cat.read("t", SCHEMA, branch="audit").count() == 30
    assert cat.current_snapshot("t", branch="audit") == s2
    assert s2 > s1

    # audit passes -> publish fast-forwards main atomically
    head = cat.publish("t", "audit")
    assert head == s2
    assert cat.current_snapshot("t") == s2
    ks = sorted(r.k for r in cat.read("t", SCHEMA).collect())
    assert ks == list(range(30))
    with pytest.raises(KeyError):
        cat.read("t", SCHEMA, branch="audit")  # ref deleted on publish


def test_publish_conflicts_when_main_moved(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", _df(spark, 0, 10))
    cat.create_branch("t", "audit")
    cat.append("t", _df(spark, 10, 20), branch="audit")
    cat.append("t", _df(spark, 90, 95))  # main moves after the fork
    with pytest.raises(CommitConflict):
        cat.publish("t", "audit")
    # main kept its own write; the staged rows never appeared
    ks = sorted(r.k for r in cat.read("t", SCHEMA).collect())
    assert ks == list(range(10)) + list(range(90, 95))


def test_drop_branch_leaves_main_untouched(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", _df(spark, 0, 5))
    cat.create_branch("t", "audit")
    cat.append("t", _df(spark, 5, 50), branch="audit")
    cat.drop_branch("t", "audit")
    assert cat.read("t", SCHEMA).count() == 5
    with pytest.raises(KeyError):
        cat.current_snapshot("t", branch="audit")


def test_expire_keeps_staged_branch_heads(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", _df(spark, 0, 5))
    cat.create_branch("t", "audit")
    staged = cat.append("t", _df(spark, 5, 10), branch="audit")
    for i in range(4):  # churn main so expire has something to drop
        cat.append("t", _df(spark, 100 + i, 101 + i))
    cat.expire_snapshots("t", keep_last=2)
    # the staged head survives expiry and still publishes... but main
    # moved, so the publish correctly conflicts; the branch data is intact
    assert cat.read("t", SCHEMA, snapshot=staged).count() == 10
    with pytest.raises(CommitConflict):
        cat.publish("t", "audit")
