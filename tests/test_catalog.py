from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

SCHEMA = StructType([StructField("x", LongType(), False)])


def _r(spark, n):
    return spark.range(n).select(F.col("id").alias("x"))


def test_append_overwrite_rollback_timetravel(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    assert cat.read("t", SCHEMA).count() == 0

    s1 = cat.append("t", _r(spark, 3))
    assert cat.read("t", SCHEMA).count() == 3
    s2 = cat.append("t", _r(spark, 2))
    assert cat.read("t", SCHEMA).count() == 5
    assert cat.read("t", SCHEMA, snapshot=s1).count() == 3  # time travel

    s3 = cat.overwrite("t", _r(spark, 7))
    assert cat.read("t", SCHEMA).count() == 7
    assert s3 == s2 + 1

    cat.rollback("t", s1)
    assert cat.current_snapshot("t") == s1
    assert cat.read("t", SCHEMA).count() == 3
    # appends after rollback build on the rolled-back state
    cat.append("t", _r(spark, 1))
    assert cat.read("t", SCHEMA).count() == 4
