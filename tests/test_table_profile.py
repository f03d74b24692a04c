"""Table profiling: null counting, exact distincts, and the engine-portable
min/max rendering (ints as decimal strings, doubles as floored cents,
timestamps via an explicit format)."""

from __future__ import annotations

import pandas as pd

from swmaestro_crawler_spark.operators.relational import (
    _PROFILE_COLS,
    q_table_profile,
)

SF_DIR = "/root/testdata/sf0.001"


def test_profile_counts_and_nulls(spark, monkeypatch, tmp_path):
    from swmaestro_crawler_spark.operators import relational

    pdf = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 10, None, 20],
            "o_orderstatus": ["O", "F", "O", None],
            "o_totalprice": [10.115, 2.5, None, 99.99],
            "o_orderdate": pd.to_datetime(
                ["2024-01-02 03:04:05", "2024-06-01", None, "2023-12-31"],
                format="mixed",
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    df = spark.createDataFrame(pdf)
    monkeypatch.setattr(relational, "load", lambda s, d, t: df)
    out = {r.column_name: r for r in q_table_profile(spark, str(tmp_path)).collect()}
    assert set(out) == {c for c, _ in _PROFILE_COLS}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["o_custkey"].n_nulls == 1 and out["o_custkey"].n_distinct == 2
    assert out["o_orderstatus"].n_distinct == 2  # NULL not counted
    assert out["o_orderkey"].min_s == "1" and out["o_orderkey"].max_s == "4"
    # doubles render as floored cents of the IEEE product (identical in
    # Spark and DuckDB): 2.5*100 = 250.0 exactly; 99.99*100 rounds to
    # exactly 9999.0 (not 9998.999...), so floor gives 9999
    assert out["o_totalprice"].min_s == "250"
    assert out["o_totalprice"].max_s == "9999"
    assert out["o_orderdate"].min_s == "2023-12-31 00:00:00"
    assert out["o_orderdate"].max_s == "2024-06-01 00:00:00"
    assert out["o_orderpriority"].n_distinct == 1


def test_profile_single_pass_plan(spark):
    """One wide aggregate + unpivot — the plan must contain no Union of
    per-column re-scans of the table."""
    plan = (
        q_table_profile(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") <= 1
