"""Bookkeeping/fetch overlap (VERDICT r2 item 5): round r's deferred
commits (crawl_order, dead, metrics, lineage, checkpoint) run under
round r+1's fetch. Correctness bar: every table's content digest is
IDENTICAL with overlap on and off, and the checkpoint written for each
round pins that round's snapshot ids even though later rounds had
already committed by the time it was written.
"""

from __future__ import annotations

import json
import os

from tests.conftest import small_cfg
from swmaestro_crawler_spark.catalog import Catalog
from swmaestro_crawler_spark.plans.crawl import TABLES, Crawl
from swmaestro_crawler_spark.sources.synth_web import make_seeds


def _run(spark, wh: str, overlap: bool):
    cfg = small_cfg(wh, overlap_bookkeeping=overlap, synth_fail_prob=0.15)
    c = Crawl(spark, cfg)
    results = c.run(spark.createDataFrame(make_seeds(cfg, 40)), rounds=3)
    return c, results


def test_overlap_digests_identical(spark, tmp_path):
    c_on, res_on = _run(spark, str(tmp_path / "on"), True)
    c_off, res_off = _run(spark, str(tmp_path / "off"), False)
    assert [r.round for r in res_on] == [r.round for r in res_off]
    for a, b in zip(res_on, res_off):
        assert (a.admitted, a.fetched_ok, a.failed, a.deferred, a.new_links,
                a.excluded, a.pending_next) == (
            b.admitted, b.fetched_ok, b.failed, b.deferred, b.new_links,
            b.excluded, b.pending_next)
    for t in TABLES:
        assert c_on.cat.content_digest(t) == c_off.cat.content_digest(t), t


def test_checkpoint_pins_per_round_sids(spark, tmp_path):
    """The final checkpoint must record round-2 snapshot ids captured at
    round 2 (not whatever was current when the deferred finish ran)."""
    c, results = _run(spark, str(tmp_path / "wh"), True)
    assert len(results) == 3
    with open(os.path.join(c.cat.warehouse, "_crawl_checkpoint.json")) as f:
        ckpt = json.load(f)
    assert ckpt["round"] == 2
    for t in TABLES:
        assert ckpt["snapshots"][t] == c.cat.current_snapshot(t), t


def test_overlap_resume_equivalence(spark, tmp_path):
    """An overlap run resumed from any committed checkpoint reconverges:
    rerunning the finished warehouse runs zero extra rounds."""
    c, results = _run(spark, str(tmp_path / "wh"), True)
    cfg = small_cfg(str(tmp_path / "wh"), overlap_bookkeeping=True, synth_fail_prob=0.15)
    c2 = Crawl(spark, cfg)
    again = c2.run(spark.createDataFrame(make_seeds(cfg, 40)), rounds=3)
    assert again == []
    cat = Catalog(spark, str(tmp_path / "wh"))
    for t in TABLES:
        assert cat.current_snapshot(t) == c.cat.current_snapshot(t), t
