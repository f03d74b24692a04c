"""Field-id schema registry (catalog.rename_column/add_column/
drop_column) — the Iceberg schema-update semantics name-based implicit
evolution (tests/test_schema_evolution.py) cannot express:

- RENAME without rewriting a byte: old files keep their bytes and are
  name-mapped at read through the stable field id.
- Drop then re-add the SAME name: the new column gets a fresh field id,
  so the old values must NOT resurrect (Iceberg add-after-drop).
- Registry tables reject writes whose column set drifts from the
  current schema version (loud, inside the commit lock).
- Maintenance ops (compact, delete_where, merge, read_range/read_point
  pruning) resolve per-file write-time names through the registry.

Reference parity: the reference's only schema-change story is a
hand-run ALTER TABLE against its Postgres store (db_connector usage in
New_YouTube_Crawler.py); here the change is a metadata-only commit over
an immutable file log.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from swmaestro_crawler_spark.catalog import Catalog

CUR = StructType(
    [
        StructField("k", LongType()),
        StructField("total", LongType()),
        StructField("channel", StringType()),
    ]
)


def _evolved_cat(spark, tmp_path) -> Catalog:
    """v0 append under (k, price); rename price->total; add channel;
    v1 append under (k, total, channel)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append(
        "t",
        spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("price")),
        stat_cols=["k", "price"],
        bloom_cols=["k"],
    )
    assert cat.rename_column("t", "price", "total") == 1
    assert cat.add_column("t", "channel") == 2
    cat.append(
        "t",
        spark.range(5, 8).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("total"),
            F.lit("web").alias("channel"),
        ),
        stat_cols=["k", "total"],
        bloom_cols=["k"],
    )
    return cat


def test_rename_maps_old_files_without_rewrite(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    m = cat._load_manifest("t")
    rows = {r.k: r for r in cat.read("t", CUR).collect()}
    assert len(rows) == 8
    assert [rows[k].total for k in range(8)] == [k * 10 for k in range(8)]
    # pre-evolution files: added column reads NULL; post: real values
    assert all(rows[k].channel is None for k in range(5))
    assert all(rows[k].channel == "web" for k in range(5, 8))
    # v0 files were never rewritten: their stats still live under 'price'
    old_stats = [s for s in m["file_stats"].values() if "price" in s]
    assert old_stats, "old files keep write-time stat names"


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    cat.drop_column("t", "channel")
    cat.add_column("t", "channel")
    rows = cat.read("t", CUR).collect()
    assert len(rows) == 8
    assert all(r.channel is None for r in rows)  # fresh field id
    # and a subsequent write under the re-added name reads back
    cat.append(
        "t",
        spark.range(8, 9).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("total"),
            F.lit("app").alias("channel"),
        ),
    )
    got = {r.k: r.channel for r in cat.read("t", CUR).collect()}
    assert got[8] == "app" and got[7] is None


def test_write_validation_rejects_stale_columns(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    with pytest.raises(ValueError, match="evolve the schema"):
        cat.append(
            "t",
            spark.range(2).select(
                F.col("id").alias("k"), (F.col("id")).alias("price")
            ),
        )
    # the failed write never published
    assert cat.read("t", CUR).count() == 8


def test_rename_rejects_unknown_and_taken_names(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    with pytest.raises(KeyError):
        cat.rename_column("t", "nope", "x")
    with pytest.raises(ValueError):
        cat.rename_column("t", "total", "k")
    with pytest.raises(ValueError):
        cat.add_column("t", "total")
    with pytest.raises(KeyError):
        cat.drop_column("t", "nope")


def test_evolve_empty_table_raises(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="empty"):
        cat.rename_column("missing", "a", "b")


def test_time_travel_reads_through_current_schema(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    # snapshot 0 = the v0 append only; current names still resolve
    rows = sorted(cat.read("t", CUR, snapshot=0).collect())
    assert [r.k for r in rows] == list(range(5))
    assert [r.total for r in rows] == [k * 10 for k in range(5)]
    assert all(r.channel is None for r in rows)


def test_range_scan_prunes_via_write_time_stat_names(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    n_all = len(cat.data_files("t"))
    # 'total' stats live under 'price' for v0 files — pruning still works
    pruned = cat.prune_files("t", "total", lo=60, hi=70)
    assert 0 < len(pruned) < n_all
    got = sorted(r.k for r in cat.read_range("t", CUR, "total", 60, 70).collect())
    assert got == [6, 7]
    # point lookup on the ADDED column: every pre-evolution file is
    # provably null-only -> skipped without needing stats; files written
    # after the add are conservatively kept
    m = cat._load_manifest("t")
    kept = {
        p.split("/")[-1] for p in cat.prune_files_point("t", "channel", 1)
    }
    v0 = {f.split("/")[-1] for f, v in m["file_schema"].items() if v == 0}
    assert kept and not (kept & v0)


def test_point_lookup_on_renamed_key(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    got = cat.read_point("t", CUR, "k", 3).collect()
    assert len(got) == 1 and got[0].total == 30


def test_compact_folds_old_versions_forward(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    before = sorted(cat.read("t", CUR).collect())
    sid = cat.compact("t", CUR, target_file_rows=100, stat_cols=["k", "total"])
    assert sid is not None
    assert sorted(cat.read("t", CUR).collect()) == before
    # rewritten files are stamped with the CURRENT schema version
    m = cat._load_manifest("t")
    cur_files = [s for s in m["snapshots"] if s["id"] == sid][0]["files"]
    assert all(m["file_schema"][f] == m["schema"]["ver"] for f in cur_files)
    # and their stats are recorded under the CURRENT names
    assert any("total" in m["file_stats"].get(f, {}) for f in cur_files)


def test_delete_where_on_evolved_table(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    # keyed delete on the RENAMED column: v0 files' stats (under 'price')
    # still prune the rewrite set
    cat.delete_where(
        "t", CUR, "total IN (10, 60)", key="total", key_values=[10, 60],
        stat_cols=["k", "total"],
    )
    got = sorted(r.total for r in cat.read("t", CUR).collect())
    assert got == [0, 20, 30, 40, 50, 70]
    # keyed delete on the ADDED column: pre-evolution files provably
    # survive (field postdates them) — zero rewrites for them
    m0 = cat._load_manifest("t")
    sid = cat.delete_where(
        "t", CUR, "k = 999999 AND channel IS NOT NULL", key="channel",
        key_values=["web"],
    )
    meta = cat.snapshot_meta("t", sid)
    assert meta["files_kept"] >= 1  # at least the null-only files carried


def test_merge_on_evolved_table(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    updates = spark.range(4, 6).select(
        F.col("id").alias("k"),
        F.lit(777).alias("total"),
        F.lit("upd").alias("channel"),
    )
    cat.merge("t", CUR, updates, key="k", stat_cols=["k"])
    rows = {r.k: r for r in cat.read("t", CUR).collect()}
    assert rows[4].total == 777 and rows[4].channel == "upd"
    assert rows[5].total == 777
    assert rows[3].total == 30 and rows[3].channel is None


def test_append_files_refused_on_registry_tables(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    cat.append("src", spark.range(3).select(F.col("id").alias("k")))
    with pytest.raises(ValueError, match="zero-copy"):
        cat.append_files("t", "src", 0)
    # and the converse: prop tables cannot evolve
    cat.append_files("t2", "src", 0, column_map={"kk": "k"})
    with pytest.raises(ValueError, match="prop tables"):
        cat.add_column("t2", "x")


def test_incremental_read_respects_registry(spark, tmp_path):
    cat = _evolved_cat(spark, tmp_path)
    # snapshot 1 = the v1 append; its delta must read under current names
    rows = sorted(cat.read_delta("t", CUR, snapshot=1).collect())
    assert [r.k for r in rows] == [5, 6, 7]
    assert all(r.channel == "web" for r in rows)
