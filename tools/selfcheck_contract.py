"""Self-check of the driver contract: run every ``queries()`` entry on
Spark at sf0.01 and its ``oracle_sql()`` twin on DuckDB over the same
parquet tables; compare row count, sorted-column schema, and exact values
(rows sorted by all columns, columns sorted by name) — a local replica of
the driver's CORRECTNESS gate.

Usage: python tools/selfcheck_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    probs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        probs.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return probs
    if len(sdf) != len(odf):
        probs.append(f"rows: spark={len(sdf)} oracle={len(odf)}")
        return probs
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~((av == bv) | (av.isna() & bv.isna()))
            if bad.any():
                i = bad.idxmax()
                probs.append(
                    f"col {c}: {int(bad.sum())} mismatches, first @{i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r} (maxdiff={(av-bv).abs().max()})"
                )
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                probs.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first @{i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}"
                )
    return probs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from swmaestro_crawler_spark.config import spark_builder

    spark = spark_builder(
        "selfcheck", master="local[8]", shuffle_partitions=16
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised\n{traceback.format_exc()}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle sql raised\n{traceback.format_exc()}")
            failures += 1
            continue
        probs = compare(name, sdf, odf)
        if probs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(probs))
        else:
            print(f"ok   {name}: {len(sdf)} rows exact-match")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
