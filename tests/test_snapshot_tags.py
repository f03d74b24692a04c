"""Immutable snapshot tags: a tagged "dataset release" survives
expire_snapshots byte-for-byte until the tag is dropped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

S = StructType([StructField("k", LongType())])


def _cat(spark, tmp_path) -> Catalog:
    cat = Catalog(spark, str(tmp_path / "wh"))
    for lo in (0, 5, 10):
        cat.append("t", spark.range(lo, lo + 5).select(F.col("id").alias("k")))
    return cat


def test_tag_pins_release_across_expiry(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    sid = cat.tag("t", "release-v1", snapshot=1)  # first two batches
    assert sid == 1 and cat.resolve_tag("t", "release-v1") == 1
    cat.append("t", spark.range(100, 101).select(F.col("id").alias("k")))
    removed = cat.expire_snapshots("t", keep_last=1)
    assert removed > 0
    # the tagged snapshot survived the expiry and reads exactly
    got = sorted(r.k for r in cat.read("t", S, snapshot=1).collect())
    assert got == list(range(10))
    # untagged history is gone
    with_current = {s["id"] for s in cat._load_manifest("t")["snapshots"]}
    assert 0 not in with_current and 1 in with_current


def test_tags_are_immutable_and_validated(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.tag("t", "release-v1")
    with pytest.raises(ValueError, match="immutable"):
        cat.tag("t", "release-v1", snapshot=0)
    with pytest.raises(KeyError):
        cat.tag("t", "bad", snapshot=99)
    with pytest.raises(KeyError):
        cat.resolve_tag("t", "nope")
    # drop releases the pin: the snapshot becomes expirable
    cat.drop_tag("t", "release-v1")
    cat.append("t", spark.range(1).select(F.col("id").alias("k")))
    cat.expire_snapshots("t", keep_last=1)
    ids = {s["id"] for s in cat._load_manifest("t")["snapshots"]}
    assert ids == {3}


def test_rollback_drops_dangling_tags(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.tag("t", "late", snapshot=2)
    cat.tag("t", "early", snapshot=0)
    cat.rollback("t", 1)
    m = cat._load_manifest("t")
    assert m.get("tags", {}) == {"early": 0}
