from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from swmaestro_crawler_spark.config import CrawlConfig, spark_builder  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = spark_builder("tests", master="local[4]", shuffle_partitions=8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def small_cfg(warehouse: str, **over) -> CrawlConfig:
    base = dict(
        round_seconds=6.0,
        max_rounds=3,
        max_depth=3,
        frontier_partitions=8,
        seen_buckets=16,
        bloom_bits=1 << 18,
        synth_n_hosts=20,
        warehouse=warehouse,
    )
    base.update(over)
    return CrawlConfig(**base)


@pytest.fixture()
def cfg(tmp_path):
    return small_cfg(str(tmp_path / "wh"))
