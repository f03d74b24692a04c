"""URL-space operators: spider-trap template mining + boilerplate
n-gram detection — invariants and physical-plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from swmaestro_crawler_spark.operators.urlspace import (
    BP_MIN_DF,
    TRAP_MIN_URLS,
    q_boilerplate_ngrams,
    q_url_trap_templates,
)
from tests.test_plans import plan_of

SF_DIR = "/root/testdata/sf0.001"


def test_trap_templates_invariants(spark):
    rows = q_url_trap_templates(spark, SF_DIR).collect()
    assert rows, "template table must be non-empty"
    for r in rows:
        # templates carry no digits — that is the definition
        assert not any(ch.isdigit() for ch in r.template), r.template
        assert "N" in r.template
        assert 0 <= r.share_permille <= 1000
        assert r.trap == (1 if r.n_urls >= TRAP_MIN_URLS else 0)
    # each host's shares must account for (almost) the whole URL space;
    # integer floor division loses at most (#templates) permille
    by_host: dict[str, int] = {}
    tpl_count: dict[str, int] = {}
    for r in rows:
        by_host[r.host] = by_host.get(r.host, 0) + r.share_permille
        tpl_count[r.host] = tpl_count.get(r.host, 0) + 1
    for h, s in by_host.items():
        assert 1000 - tpl_count[h] <= s <= 1000, (h, s)


def test_trap_templates_collapse_is_massive(spark):
    """The template table must be orders of magnitude smaller than the
    URL space — that collapse is the operator's entire scale story."""
    df = q_url_trap_templates(spark, SF_DIR)
    n_templates = df.count()
    n_urls = df.agg(F.sum("n_urls")).collect()[0][0]
    # 1000 events at sf0.001 collapse onto <=130 (host, template) rows;
    # the ratio grows linearly with SF (the template space is fixed)
    assert n_templates * 5 <= n_urls, (n_templates, n_urls)


def test_trap_templates_plan(spark):
    plan = plan_of(q_url_trap_templates(spark, SF_DIR))
    # two-phase aggregation (map-side partials) and no quadratic shapes
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # the events scan reads only the three columns the URL needs
    assert "props" not in plan and "value" not in plan.split("ReadSchema", 1)[1]


def test_boilerplate_invariants(spark):
    rows = q_boilerplate_ngrams(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_windows
        assert 0 <= r.boiler_permille <= 1000
        assert r.boiler_permille == (1000 * r.n_boiler) // r.n_windows


def test_boilerplate_gram_definition(spark):
    """A gram flagged boilerplate must actually occur in >= BP_MIN_DF
    distinct documents of its source (cross-checked per document via a
    driver-side recount on the tiny sf0.001 corpus)."""
    import collections

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    df_count: dict[tuple, set] = collections.defaultdict(set)
    windows: dict[int, list] = {}
    for d in docs:
        ws = [w for w in d.text.split(" ") if w]
        grams = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        windows[d.doc_id] = [(d.source, g) for g in grams]
        for g in set(grams):
            df_count[(d.source, g)].add(d.doc_id)
    n_docs = collections.Counter(d.source for d in docs)
    got = {r.doc_id: r for r in q_boilerplate_ngrams(spark, SF_DIR).collect()}
    for doc_id, wlist in windows.items():
        if not wlist:
            assert doc_id not in got
            continue
        boiler = sum(
            1
            for (src, g) in wlist
            if len(df_count[(src, g)]) * 1000 >= 200 * n_docs[src]
            and len(df_count[(src, g)]) >= BP_MIN_DF
        )
        assert got[doc_id].n_windows == len(wlist)
        assert got[doc_id].n_boiler == boiler


def test_boilerplate_plan(spark):
    plan = plan_of(q_boilerplate_ngrams(spark, SF_DIR))
    # the tiny per-source doc-count table is broadcast, never shuffled in
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # raw text never shuffles: gram text is hashed before any exchange
    assert plan.count("HashAggregate") >= 4  # distinct + df + final fold, partials
