"""Table profiling: null counting, the engine-portable min/max rendering
(ints as decimal strings, doubles as floored cents, timestamps via an
explicit format), and the HLL-register distinct estimate (raw integer
estimate + regs_hit; the driver-side linear-counting correction is the
consumer's job, exactly as with q_hll_distinct)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.relational import (
    _PROFILE_COLS,
    q_table_profile,
)

SF_DIR = "/root/testdata/sf0.001"


def _corrected(row) -> float:
    """Driver-side linear-counting correction (same as the HLL contract
    consumer): raw estimate unless the small-range regime applies."""
    from swmaestro_crawler_spark.operators import sketches

    m = sketches.HLL_M
    zero = m - row.regs_hit
    est = float(row.n_distinct_est)
    if zero > 0 and est < 2.5 * m:
        return m * math.log(m / zero)
    return est


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
    assert out["o_custkey"].n_nulls == 1
    # tiny cardinalities sit deep in the linear-counting regime where the
    # corrected estimate is near-exact (NULLs never hashed)
    assert round(_corrected(out["o_custkey"])) == 2
    assert round(_corrected(out["o_orderstatus"])) == 2
    assert round(_corrected(out["o_orderpriority"])) == 1
    assert out["o_orderkey"].min_s == "1" and out["o_orderkey"].max_s == "4"
    # doubles render as floored cents of the IEEE product (identical in
    # Spark and DuckDB): 2.5*100 = 250.0 exactly; 99.99*100 rounds to
    # exactly 9999.0 (not 9998.999...), so floor gives 9999
    assert out["o_totalprice"].min_s == "250"
    assert out["o_totalprice"].max_s == "9999"
    assert out["o_orderdate"].min_s == "2023-12-31 00:00:00"
    assert out["o_orderdate"].max_s == "2024-06-01 00:00:00"


def test_profile_distinct_estimates_track_exact(spark):
    """Corrected estimates stay within HLL m=64 error bounds (~13% std
    error, allow 3 sigma) of the true per-column distinct counts."""
    from swmaestro_crawler_spark.sources.testdata import load

    o = load(spark, SF_DIR, "orders")
    out = {r.column_name: r for r in q_table_profile(spark, SF_DIR).collect()}
    for c, _kind in _PROFILE_COLS:
        # exact distinct of the same canonical rendering the profile hashes
        from swmaestro_crawler_spark.operators.relational import _profile_val_spark

        kind = dict(_PROFILE_COLS)[c]
        exact = (
            o.selectExpr(f"{_profile_val_spark(c, kind)} AS v")
            .filter(F.col("v").isNotNull())
            .distinct()
            .count()
        )
        est = _corrected(out[c])
        assert abs(est - exact) / max(exact, 1) < 0.40, (c, est, exact)


def test_profile_two_scans_no_expand(spark):
    """One wide non-distinct aggregate + one HLL-register scan — never a
    per-column re-scan union, never an Expand multiply (VERDICT r4 #1)."""
    plan = (
        q_table_profile(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") <= 2
    assert "Expand" not in plan
