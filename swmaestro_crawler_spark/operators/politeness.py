"""Per-host politeness as a relational operator.

The reference enforces politeness with wall-clock sleeps — 0.2 s before
every channels-API call (New_YouTube_Crawler.py:93) and a >=6 s + U(0,1)
jitter floor per watch page (New_YouTube_Crawler_Comment.py:443-448) —
one process at a time per identity (supervisor.py:47-67,146-160).

Set-oriented re-expression: each crawl round spans ``round_seconds`` of
budget, so host h may be fetched at most

    budget(h) = min(per_host_cap, max(1, floor(round_seconds / crawl_delay(h))))

times per round. Admission is a rank-vs-budget filter:

    row_number() OVER (PARTITION BY host ORDER BY priority) <= budget(h)

No sleeping, no per-row Python; rows over budget are deferred to the next
round (they stay pending). The priority ORDER — (depth DESC, seq ASC,
url_hash ASC) — realizes the reference's LIFO newest-first continuation
order ("Ordering matters", New_YouTube_Crawler_Comment.py:162-166) as a
pure data ordering, so crawl order is identical at any cluster size.

Robots disallow-prefix exclusion covers what the reference hardcodes as
skip-classes (private/unplayable pages, New_YouTube_Crawler_Comment.py:58-64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..config import CrawlConfig
from ..schema import ROBOTS
from ..sources import synth_web

def priority_order():
    """The engine-wide priority order: LIFO-newest-first (depth DESC), then
    discovery order within the parent page (seq ASC), then url_hash for a
    total, cluster-size-independent order."""
    return [F.col("depth").desc(), F.col("seq").asc(), F.col("url_hash").asc()]


def synth_robots(spark: SparkSession, cfg: CrawlConfig, epoch: int = 0) -> DataFrame:
    """ROBOTS dimension from RAW robots.txt bodies through the vectorized
    parser (functions/robots.py) — the end-to-end path a real crawl runs
    (fetch robots.txt like any page, parse, schedule). The sequential
    oracle consumes the structured robots_for_host directly, so the
    crawl-equality tests double as render→parse round-trip checks.
    ``epoch`` selects the TTL-revalidation policy generation
    (synth_web.robots_for_host; 0 = the bootstrap policy)."""
    from ..functions.robots import robots_table_from_bodies

    rows = [
        (h, synth_web.robots_txt_for_host(h, cfg, epoch))
        for h in synth_web.hosts(cfg.synth_n_hosts)
    ]
    bodies = spark.createDataFrame(rows, "host string, body string")
    return robots_table_from_bodies(bodies)


def _robots_rules(patterns):
    """array<string> of RAW robots patterns -> array<struct<like,spec>>:
    ``like`` is the SQL LIKE translation of the pattern (escape
    ``\\ % _``, robots ``*`` -> ``%``, a trailing ``$`` anchors the match
    instead of appending the implicit-prefix ``%``) and ``spec`` is the
    RFC 9309 specificity (octet length of the raw pattern — longest
    match wins). Evaluated on the tiny per-host dimension BEFORE the
    broadcast, never per frontier row."""
    def rule(p):
        anchored = p.endswith("$")
        raw = F.when(anchored, F.substr(p, F.lit(1), F.length(p) - 1)).otherwise(p)
        esc = F.regexp_replace(raw, r"([\\%_])", r"\\$1")
        star = F.replace(esc, F.lit("*"), F.lit("%"))
        like = F.when(anchored, star).otherwise(F.concat(star, F.lit("%")))
        return F.struct(like.alias("like"), F.length(p).alias("spec"))

    return F.transform(patterns, rule)


def _best_match_spec(rules, path):
    """Longest-match specificity of ``path`` over translated rules
    (0 = no rule matches) — codegen FILTER + AGGREGATE, no UDF."""
    return F.aggregate(
        F.filter(rules, lambda r: F.like(path, r["like"], F.lit("\\"))),
        F.lit(0),
        lambda acc, r: F.greatest(acc, r["spec"]),
    )


def split_robots_excluded(
    frontier: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(allowed, excluded, joined) after the robots exclusion check —
    RFC 9309 group-member semantics: among all ``Allow``/``Disallow``
    patterns matching the URL path, the most specific (longest) wins,
    with ``Allow`` winning ties; no matching rule means allowed.
    Patterns support the spec's ``*`` wildcard and ``$`` end anchor.

    robots is a per-host dimension — broadcast, so no shuffle of the
    frontier; pattern translation (raw robots pattern -> SQL LIKE) runs
    on the dimension side before the broadcast, and the per-URL test is
    a codegen'd FILTER/AGGREGATE over the translated arrays.
    ``joined`` is the shared parent both splits filter — the caller may
    persist it so the upstream dedup window materializes once.

    A robots frame without an ``allow_prefixes`` column (pre-RFC-9309
    checkpoints) degrades to pure disallow-prefix semantics, which this
    operator reproduces exactly for wildcard-free patterns.
    """
    allow_col = (
        F.col("allow_prefixes")
        if "allow_prefixes" in robots.columns
        else F.array().cast("array<string>")
    )
    dim = robots.select(
        "host",
        _robots_rules(F.col("disallow_prefixes")).alias("_dis_rules"),
        _robots_rules(allow_col).alias("_allow_rules"),
    )
    path = F.regexp_replace(F.col("url"), r"^[a-z][a-z0-9+.\-]*://[^/]*", "")
    joined = frontier.join(F.broadcast(dim), "host", "left").withColumn(
        "robots_blocked",
        F.coalesce(
            _best_match_spec(F.col("_dis_rules"), path)
            > _best_match_spec(F.col("_allow_rules"), path),
            F.lit(False),
        ),
    )
    allowed = joined.filter(~F.col("robots_blocked")).drop(
        "robots_blocked", "_dis_rules", "_allow_rules"
    )
    excluded = joined.filter(F.col("robots_blocked")).drop(
        "robots_blocked", "_dis_rules", "_allow_rules"
    )
    return allowed, excluded, joined


def host_budget_col(cfg: CrawlConfig):
    return F.least(
        F.lit(cfg.per_host_cap),
        F.greatest(F.lit(1), F.floor(F.lit(cfg.round_seconds) / F.col("crawl_delay_s"))),
    ).cast("int")


def host_backoff_factors(stats: DataFrame, max_exp: int = 4) -> DataFrame:
    """Per-host adaptive-backoff factor from the HOST_STATS history:
    (host, backoff_factor double).

    The reference sleeps a FIXED crawl-delay regardless of how the host
    behaves; production crawlers (Heritrix's delay-factor, Nutch's
    exponential backoff) stretch the delay when a host keeps erroring.
    Rule: a host's round is "erroring" when transient failures (HTTP
    500) are at least as many as its successes and nonzero; the factor
    is 2^min(streak, max_exp) where streak counts the host's observed
    erroring rounds since its last observed non-erroring round. Factors
    are exact powers of two (shiftleft, no float pow), so engine and
    oracle agree bit-for-bit on the effective delay.

    Scale shape: HOST_STATS is one row per (host, round) — dimension-
    sized, never frontier-sized; two small aggregations, broadcast back
    into admission."""
    err = stats.select(
        "host",
        "round",
        ((F.col("transient_n") >= F.col("ok_n")) & (F.col("transient_n") > 0)).alias("err"),
    )
    last_ok = (
        err.filter(~F.col("err"))
        .groupBy("host")
        .agg(F.max("round").alias("last_ok_round"))
    )
    streak = (
        err.filter(F.col("err"))
        .join(last_ok, "host", "left")
        .filter(F.col("round") > F.coalesce(F.col("last_ok_round"), F.lit(-1)))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("streak"))
    )
    # SQL shiftleft (the Python wrapper only takes a literal int for
    # numBits, the SQL form takes a column)
    return streak.select(
        "host",
        F.expr(
            f"cast(shiftleft(1, cast(least(streak, {int(max_exp)}) as int)) as double)"
        ).alias("backoff_factor"),
    )


def split_admitted(
    frontier: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
    order: list | None = None,
    backoff: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(admitted, deferred) under the per-host crawl-delay budget.

    Skew-safe two-phase top-k (axis B): a Zipf-hot host can hold most of
    the frontier, and a single ``Window.partitionBy(host)`` would drag all
    of its rows through one reducer. Phase 1 ranks within
    ``(host, pmod(url_hash, S))`` — S salted sub-buckets spread the hot
    host over S reducers — and keeps each sub-bucket's top ``budget``
    (any row in the host's global top-budget is necessarily in its
    sub-bucket's top-budget, so no admissible row is lost). Phase 2 ranks
    the survivors (≤ S × budget rows per host, bounded regardless of
    frontier skew) exactly. Both phases order by the engine PRIORITY key,
    so the admitted set and order equal the single-window semantics —
    tests/test_crawl_matches_oracle.py proves it against the sequential
    oracle.

    ``order`` overrides the priority key (default: the reference LIFO
    order). The phase-1 argument — any row in the host's global
    top-budget is in its sub-bucket's top-budget — holds for ANY total
    order, so score-weighted admission reuses this skew-safe shape
    unchanged (see score_admitted)."""
    if order is None:
        order = priority_order()
    salts = max(1, cfg.admission_salts)
    sub = F.pmod(F.col("url_hash"), F.lit(salts))
    w1 = Window.partitionBy("host", sub).orderBy(*order)
    joined = frontier.join(
        F.broadcast(robots.select("host", "crawl_delay_s")), "host", "left"
    ).withColumn("crawl_delay_s", F.coalesce(F.col("crawl_delay_s"), F.lit(1.0)))
    if backoff is not None:
        # adaptive backoff: stretch the effective delay for hosts with a
        # trailing streak of erroring rounds (host_backoff_factors).
        # Exact power-of-two factors keep the float arithmetic identical
        # to the oracle's.
        joined = joined.join(F.broadcast(backoff), "host", "left").withColumn(
            "crawl_delay_s",
            F.col("crawl_delay_s") * F.coalesce(F.col("backoff_factor"), F.lit(1.0)),
        ).drop("backoff_factor")
    ranked1 = joined.withColumn("host_budget", host_budget_col(cfg)).withColumn(
        "sub_rank", F.row_number().over(w1)
    )
    cand = ranked1.filter(F.col("sub_rank") <= F.col("host_budget"))
    over1 = ranked1.filter(F.col("sub_rank") > F.col("host_budget"))

    w2 = Window.partitionBy("host").orderBy(*order)
    ranked2 = cand.withColumn("host_rank", F.row_number().over(w2))
    admitted = ranked2.filter(F.col("host_rank") <= F.col("host_budget")).drop(
        "crawl_delay_s", "host_budget", "sub_rank"
    )
    over2 = ranked2.filter(F.col("host_rank") > F.col("host_budget")).drop("host_rank")
    deferred = over1.unionByName(over2).drop("crawl_delay_s", "host_budget", "sub_rank")
    return admitted, deferred


def dedup_frontier(frontier: DataFrame) -> DataFrame:
    """One row per url_hash: keep the retry with the highest attempt, then
    the best priority — deterministic total tie-break.

    Replaces per-row existence probes with a single window dedup
    (reference: ON CONFLICT DO NOTHING at view_count_crawler.py:140-147).
    """
    w = Window.partitionBy("url_hash").orderBy(
        F.col("attempt").desc(),
        F.col("depth").desc(),
        F.col("seq").asc(),
        F.col("parent").asc_nulls_first(),
    )
    return (
        frontier.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


# ---------------------------------------------------------------------------
# Spider-trap guard (opt-in; reference parity needs the cap OFF — the
# reference's curated YouTube-id frontier has no adversarial URL space)
# ---------------------------------------------------------------------------
TEMPLATE_PLACEHOLDER = "N"


def url_template(url):
    """Digit runs collapsed to a placeholder — calendar pages, session-id
    query strings, and paginated facets all collapse onto one template
    (the same definition as the offline analytics in
    operators/urlspace.py, so the trap flags that operator mines on the
    standing crawl_order table apply directly to admission)."""
    return F.regexp_replace(url, "[0-9]+", TEMPLATE_PLACEHOLDER)


def mine_trap_templates(
    crawled: DataFrame, min_urls: int = 1000
) -> DataFrame:
    """(host, template) pairs whose standing URL cardinality crossed
    ``min_urls`` — mined from any frame carrying (host, url), typically
    the crawl_order table (the engine's own history; the offline twin
    with share/trap telemetry is operators/urlspace.q_url_trap_templates).
    Feed the result to ``cap_per_template(templates=...)`` to throttle
    ONLY proven traps while every other template admits freely."""
    return (
        crawled.groupBy("host", url_template(F.col("url")).alias("template"))
        .agg(F.countDistinct("url").alias("n_urls"))
        .filter(F.col("n_urls") >= min_urls)
        .select("host", "template")
    )


def cap_per_template(
    frontier: DataFrame,
    cfg: CrawlConfig,
    order: list | None = None,
    templates: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(kept, overflow): at most ``cfg.trap_template_cap`` frontier rows
    per (host, URL template) proceed to politeness admission per round;
    the overflow stays pending (it is re-considered next round, so a
    mis-flagged template is throttled, never dropped — and a true trap
    is bounded to cap x rounds URLs instead of devouring the frontier).

    Skew-safety is the split_admitted two-phase shape verbatim: a trap
    template IS the hot key by definition, so phase 1 ranks within
    (host, template, salt-sub-bucket) — spreading the trap over
    ``admission_salts`` reducers — and phase 2 ranks only the bounded
    survivors exactly. Ordering is the engine priority key, so the kept
    set is deterministic at any cluster size.

    With ``templates`` (a (host, template) frame, e.g. from
    ``mine_trap_templates`` over the crawl history), ONLY flagged
    templates are capped: unflagged rows bypass both windows entirely
    (a left-semi/anti split on the broadcast flag table — the mined
    trap list is tiny by construction), so the steady-state cost of the
    guard is one broadcast probe, not a frontier-wide window."""
    if order is None:
        order = priority_order()
    cap = F.lit(int(cfg.trap_template_cap))
    tpl = url_template(F.col("url"))
    if templates is not None:
        flagged = F.broadcast(templates.select("host", F.col("template")))
        keyed = frontier.withColumn("_tpl", tpl)
        guarded = keyed.join(
            flagged,
            (keyed["host"] == flagged["host"]) & (keyed["_tpl"] == flagged["template"]),
            "left_semi",
        ).drop("_tpl")
        bypass = keyed.join(
            flagged,
            (keyed["host"] == flagged["host"]) & (keyed["_tpl"] == flagged["template"]),
            "left_anti",
        ).drop("_tpl")
        kept, overflow = cap_per_template(guarded, cfg, order=order)
        return bypass.unionByName(kept), overflow
    sub = F.pmod(F.col("url_hash"), F.lit(max(1, cfg.admission_salts)))
    w1 = Window.partitionBy("host", tpl, sub).orderBy(*order)
    ranked1 = frontier.withColumn("_trank1", F.row_number().over(w1))
    cand = ranked1.filter(F.col("_trank1") <= cap)
    over1 = ranked1.filter(F.col("_trank1") > cap).drop("_trank1")

    w2 = Window.partitionBy("host", tpl).orderBy(*order)
    ranked2 = cand.withColumn("_trank2", F.row_number().over(w2))
    kept = ranked2.filter(F.col("_trank2") <= cap).drop("_trank1", "_trank2")
    over2 = ranked2.filter(F.col("_trank2") > cap).drop("_trank1", "_trank2")
    return kept, over1.unionByName(over2)


# ---------------------------------------------------------------------------
# Importance-weighted admission (opt-in; reference parity needs LIFO)
# ---------------------------------------------------------------------------
def url_graph(crawled: DataFrame) -> DataFrame:
    """(src, dst) int64 edge list of the discovered parent->url link graph,
    from any frame carrying (url, parent) — pending, crawl_order, or their
    union. Node ids are xxhash64(url), the engine's standing URL key."""
    return (
        crawled.filter(F.col("parent").isNotNull())
        .select(
            F.xxhash64(F.col("parent")).alias("src"),
            F.xxhash64(F.col("url")).alias("dst"),
        )
        .distinct()
    )


def frontier_scores(crawled: DataFrame, iters: int = 1) -> DataFrame:
    """(url_hash, score) — link-importance score over the discovered
    parent->url graph. The score a 10^10-URL frontier spends its
    per-host politeness budget by: fetch the most-linked pages first
    instead of LIFO. int64-exact, so admission stays deterministic and
    layout-independent.

    iters=1 (default) is the OPIC-shaped fast path: score(url) =
    Σ_{p->url} PR_SCALE div outdeg(p) — outdegree-normalized in-link
    mass, the classic online frontier-importance estimator. Its ORDERING
    is provably identical to one full PageRank superstep (rank =
    PR_BASE + (85·inbox) div 100 is monotone in inbox, and unranked
    URLs coalesce to 0 below every ranked one in score_admitted), but
    the plan needs only 3 shuffles of the edge list — no 2·|E|-row
    node-list distinct, no final left join — and fuses into the
    admission job (tests/test_score_admission.py pins the equivalence).

    iters ≥ 2 runs true PageRank supersteps via the LAZY pagerank form
    (materialize=False): no eager per-superstep jobs; for iters > 4
    pagerank falls back to the eager checkpointed form itself."""
    from .graph import PR_SCALE, pagerank

    edges = url_graph(crawled)
    if iters <= 1:
        outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        return (
            edges.join(outdeg, "src")
            .select("dst", F.expr(f"{PR_SCALE} div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("score"))
            .select(F.col("dst").alias("url_hash"), "score")
        )
    return pagerank(edges, iters=iters, materialize=False).select(
        F.col("node").alias("url_hash"), F.col("rank").alias("score")
    )


def score_admitted(
    frontier: DataFrame,
    scores: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
    backoff: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """split_admitted with importance-first ordering: (score DESC, then
    the LIFO key as total tie-break). OPT-IN — the default crawl keeps
    the reference's LIFO order (crawl-order parity is a correctness
    criterion); this is the scheduler a production frontier would run.
    Never-scored URLs (no inlinks yet) rank below any scored URL at
    score 0. The scores join is a hash join on url_hash — broadcast
    when small, shuffle otherwise; the skew-safe two-phase top-k is
    reused unchanged."""
    scored = frontier.join(
        scores.select("url_hash", "score"), "url_hash", "left"
    ).withColumn("score", F.coalesce(F.col("score"), F.lit(0).cast("long")))
    admitted, deferred = split_admitted(
        scored, robots, cfg, order=[F.col("score").desc(), *priority_order()],
        backoff=backoff,
    )
    return admitted.drop("score"), deferred.drop("score")
