"""HITS hubs/authorities: hand-checked mutual reinforcement on an
engineered graph, layout independence of the fixed-point iteration, and
the L1-normalization invariant that keeps every product int64-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.graph import (
    HITS_SCALE,
    hits,
    purchase_pairs,
    q_hits_purchase,
)

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_hits_mutual_reinforcement(spark):
    """Authority linked by every hub must outrank one linked by a single
    weak hub; the hub pointing at the strong authority outranks the hub
    pointing only at the weak one."""
    # hubs 0,2,4 ; auths 1,3.  0,2,4 -> 1 ; 4 -> 3
    hubs, auths = hits(_edges(spark, [(0, 1), (2, 1), (4, 1), (4, 3)]))
    a = {r.node: r.score for r in auths.collect()}
    h = {r.node: r.score for r in hubs.collect()}
    assert a[1] > a[3]  # 3 in-links beat 1
    assert h[4] >= h[0]  # hub 4 also points at the extra authority
    assert h[0] == h[2]  # symmetric hubs tie exactly (integer math)


def test_hits_l1_invariant(spark):
    """After every normalization the vector sums to <= HITS_SCALE (floor
    loss only) and every score is <= HITS_SCALE — the overflow contract
    the int64 fixed-point math relies on."""
    hubs, auths = hits(purchase_pairs(spark, SF_DIR))
    for vec in (hubs, auths):
        row = vec.agg(
            F.sum("score").alias("tot"),
            F.max("score").alias("mx"),
            F.min("score").alias("mn"),
        ).collect()[0]
        assert row.tot <= HITS_SCALE
        assert row.tot > HITS_SCALE // 2  # floor leaks a little, not half
        assert 0 <= row.mn and row.mx <= HITS_SCALE


def test_hits_layout_independent(spark):
    edges = purchase_pairs(spark, SF_DIR)
    h1, a1 = hits(edges)
    h2, a2 = hits(edges.repartition(13, "dst"))
    assert {(r.node, r.score) for r in h1.collect()} == {
        (r.node, r.score) for r in h2.collect()
    }
    assert {(r.node, r.score) for r in a1.collect()} == {
        (r.node, r.score) for r in a2.collect()
    }


def test_contract_query_roles(spark):
    out = q_hits_purchase(spark, SF_DIR)
    roles = {r.role for r in out.select("role").distinct().collect()}
    assert roles == {"hub", "auth"}
    # bipartite: hubs are customers (even node ids), auths suppliers (odd)
    bad = out.filter(
        ((F.col("role") == "hub") & (F.col("node_id") % 2 == 1))
        | ((F.col("role") == "auth") & (F.col("node_id") % 2 == 0))
    ).count()
    assert bad == 0


def test_hits_empty_edges_returns_empty(spark):
    """An empty edge list yields two empty (node, score) frames instead
    of a driver-side ZeroDivisionError (ADVICE r4)."""
    from swmaestro_crawler_spark.operators.graph import hits

    h, a = hits(spark.createDataFrame([], "src long, dst long"))
    assert h.count() == 0 and a.count() == 0
    assert [f.name for f in h.schema.fields] == ["node", "score"]


def test_hits_matches_driver_reference_on_random_graphs(spark):
    """Engine HITS (lazy crossjoin totals, degree-table L1 sums,
    stride-2 checkpoints) must reproduce a direct driver-side integer
    reference of the SAME spec — (raw * SCALE) div tot per half-step —
    bit-for-bit on random graphs. Guards the r5 restructuring: the
    totals' sourcing (column vs literal, degree-sum vs raw-sum) must
    never change a value."""
    import random

    from swmaestro_crawler_spark.operators.graph import HITS_ITERS

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        nodes = list(range(10))
        pairs = sorted(
            {
                (rng.choice(nodes) * 2, rng.choice(nodes) * 2 + 1)
                for _ in range(25)
            }
        )
        hubs_df, auths_df = hits(_edges(spark, pairs))

        # driver reference: same integer spec, dict arithmetic
        srcs = sorted({s for s, _ in pairs})
        h = {s: HITS_SCALE // len(srcs) for s in srcs}
        a = {}
        for _ in range(HITS_ITERS):
            raw_a = {}
            for s, d in pairs:
                raw_a[d] = raw_a.get(d, 0) + h[s]
            tot = sum(raw_a.values())
            a = {d: (v * HITS_SCALE) // tot for d, v in raw_a.items()}
            raw_h = {}
            for s, d in pairs:
                raw_h[s] = raw_h.get(s, 0) + a[d]
            tot = sum(raw_h.values())
            h = {s: (v * HITS_SCALE) // tot for s, v in raw_h.items()}

        got_h = {r.node: r.score for r in hubs_df.collect()}
        got_a = {r.node: r.score for r in auths_df.collect()}
        assert got_h == h, f"hub mismatch at seed {seed}"
        assert got_a == a, f"auth mismatch at seed {seed}"
