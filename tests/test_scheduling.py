"""Recrawl scheduler + quality-classifier semantics and plan shapes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.curation import (
    QC_BIAS,
    QC_WSPAN,
    q_quality_classifier,
)
from swmaestro_crawler_spark.operators.scheduling import (
    MAX_INTERVAL_US,
    MIN_INTERVAL_US,
    q_recrawl_schedule,
)
from tests.test_plans import SF_DIR, plan_of


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_recrawl_interval_estimates(spark, tmp_path):
    t0 = dt.datetime(2025, 1, 1)
    hours = dt.timedelta(hours=1)
    rows = []
    # user 1: never changes over 10 days -> MAX interval, overdue vs REF
    for i in range(4):
        rows.append((i, t0 + i * 80 * hours, 1, "e", 5.0, None))
    # user 2: changes every observation, observed hourly -> clamps to MIN
    for i in range(5):
        rows.append((100 + i, t0 + i * hours, 2, "e", float(i), None))
    # user 3: 2 changes over 100 hours -> span/2 = 50h estimate
    for i, v in enumerate([1.0, 1.0, 2.0, 3.0]):
        rows.append((200 + i, t0 + [0, 40, 70, 100][i] * hours, 3, "e", v, None))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in q_recrawl_schedule(spark, sf).collect()}

    assert out[1]["n_changes"] == 0
    assert out[1]["interval_us"] == MAX_INTERVAL_US
    assert out[1]["due_now"] == 1
    assert out[2]["n_changes"] == 4
    assert out[2]["interval_us"] == MIN_INTERVAL_US
    assert out[3]["n_changes"] == 2
    assert out[3]["interval_us"] == 100 * 3_600_000_000 // 2
    last_us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) + 100 * 3_600_000_000
    assert out[3]["next_due_us"] == last_us + out[3]["interval_us"]


def test_recrawl_plan_one_exchange_no_join(spark):
    import re

    plan = plan_of(q_recrawl_schedule(spark, SF_DIR))
    # window partitioning on user_id is reused by the groupBy — one
    # shuffle total, and the estimator never joins
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan


def test_quality_classifier_zero_shuffle_plan(spark):
    plan = plan_of(q_quality_classifier(spark, SF_DIR))
    assert "Exchange" not in plan  # pure projection, embarrassingly parallel
    assert "Join" not in plan
    # only the two consumed columns reach the scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_quality_classifier_bounds_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    # reuse the scorer via a temp dir is overkill — apply the same columns
    from swmaestro_crawler_spark.functions.text import words
    from swmaestro_crawler_spark.operators import curation

    ws = words(F.col("text"))
    logit = F.aggregate(
        ws, F.lit(0).cast("long"),
        lambda acc, w: acc + curation._qc_weight(w) + F.lit(QC_BIAS),
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", F.size(ws).alias("n"), logit.alias("logit")
    ).collect()}
    wmax = (QC_WSPAN - 1) // 2 + abs(QC_BIAS)
    assert rows[1]["logit"] != 0 and abs(rows[1]["logit"]) <= 4 * wmax
    assert rows[2]["n"] == 0 and rows[2]["logit"] == 0
    assert rows[3]["n"] == 0 and rows[3]["logit"] == 0
