"""Byte-identical resume + parallelism independence.

north_rule: a killed job resumes mid-round and the resulting tables are
byte-identical to an uninterrupted run; crawl results must not depend on
cluster size (sandbox proxy: different shuffle parallelism).
"""

from __future__ import annotations

import hashlib


from swmaestro_crawler_spark.plans.crawl import Crawl
from swmaestro_crawler_spark.schema import CRAWL_ORDER
from swmaestro_crawler_spark.sources.synth_web import make_seeds
from tests.conftest import small_cfg

TABLES = ("spans", "seen", "crawl_order", "dead", "pending")


def table_digest(crawl: Crawl, table: str) -> str:
    """Raw file bytes + logical content digest. Raw bytes are identical
    within one JVM; across JVMs only the parquet footer's ``encodings``
    list order (a parquet-mr hash-set artifact) can differ, which
    ``Catalog.content_digest`` is insensitive to — process-level
    kill/resume is exercised by bench/verify drivers."""
    h = hashlib.sha256()
    for path in crawl.cat.data_files(table):
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest() + ":" + crawl.cat.content_digest(table)


def test_resume_is_byte_identical(spark, tmp_path):
    cfg_a = small_cfg(str(tmp_path / "a"), synth_fail_prob=0.15)
    cfg_b = small_cfg(str(tmp_path / "b"), synth_fail_prob=0.15)
    seeds_rows = make_seeds(cfg_a, 40)
    seeds = spark.createDataFrame(seeds_rows)

    a = Crawl(spark, cfg_a)
    a.run(seeds, rounds=3)

    b = Crawl(spark, cfg_b)
    b.run(seeds, rounds=2)
    # simulate a crash mid-round-2: some tables committed, checkpoint not
    junk = spark.createDataFrame([("http://x/", [], 99, "x")],
                                 "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, round int, host string")
    b.cat.append("spans", junk)
    b.cat.append("crawl_order", b.cat.read("crawl_order", CRAWL_ORDER).limit(1))
    # resume: must roll back the partial round and re-run it deterministically
    b2 = Crawl(spark, cfg_b)
    b2.run(seeds, rounds=3)

    for t in TABLES:
        assert table_digest(a, t) == table_digest(b2, t), t


def test_results_independent_of_parallelism(spark, tmp_path):
    """Same crawl at shuffle parallelism 3 vs 8 -> byte-identical tables
    (the sandbox stand-in for identical results at N vs 4N executors)."""
    seeds = None
    digests = {}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for par in ("3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", par)
            cfg = small_cfg(str(tmp_path / f"p{par}"), synth_fail_prob=0.15)
            if seeds is None:
                seeds = spark.createDataFrame(make_seeds(cfg, 40))
            c = Crawl(spark, cfg)
            c.run(seeds, rounds=2)
            digests[par] = [table_digest(c, t) for t in TABLES]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert digests["3"] == digests["8"]
