"""Relational operator battery over the driver test tables.

Each query re-expresses one reference operator family (SURVEY.md §2) as a
declarative Spark plan with a DuckDB oracle:

- frontier scans with pushed predicates (S1-S3, P1-P3)
- FK lookup joins the reference runs as per-row subqueries (J1-J3)
- anti/semi-join dedup and set ops (J4-J7, U1-U3)
- relevance-ordered top-k per group (O1, A4)
- hash aggregation / metrics time series (A1-A5, K2, C8)
- scalar string/date/int surgery (F5, F8, F10, F13, F14)
- the politeness budget rank-vs-quota operator on a generic table (C1)

Numeric policy for bit-exact oracle agreement: money/quantity columns are
2dp-exact — each element is cast to DECIMAL before SUM (exact integer
arithmetic in BOTH engines), the final value cast back to DOUBLE and
rounded; no float accumulation order can flake the compare. Timestamps are
emitted as formatted strings so session-timezone conventions can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.testdata import load


def _dec(c, scale=2):
    return c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# A1/A2 — pricing summary (hash agg with map-side partials; TPC-H Q1 shape)
# ---------------------------------------------------------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec(F.col("l_quantity"))).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(
                F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# S3/P3 — recency-horizon frontier scan (reference: videos <= 1 month old,
# sendToRabbitMQ.py:37-41) with the horizon anchored to max(o_orderdate)
# so the query is reproducible
# ---------------------------------------------------------------------------
def q_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    horizon = orders.agg(
        F.date_sub(F.max("o_orderdate").cast("date"), 30).alias("h")
    )
    return (
        orders.crossJoin(F.broadcast(horizon))
        .filter(F.col("o_orderdate").cast("date") >= F.col("h"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
    )


SQL_RECENT_ORDERS = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
FROM orders
WHERE CAST(o_orderdate AS DATE) >=
      (SELECT CAST(max(o_orderdate) AS DATE) - INTERVAL 30 DAY FROM orders)
"""


# ---------------------------------------------------------------------------
# J1/J3 — FK lookup join chain (reference: per-row
# ``(SELECT idx FROM channel WHERE channel_id=...)``,
# New_YouTube_Crawler.py:133-135) as broadcast hash joins
# ---------------------------------------------------------------------------
def q_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec(F.col("o_totalprice"))).cast("double"), 2).alias("revenue"),
        )
    )


SQL_REVENUE_PER_NATION = """
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# J4/J5/U1 — anti-join dedup (reference: set difference before insert,
# Utils/Insert_Nox_Data_to_DB.py:52; existence probe,
# New_YouTube_Crawler_Comment.py:414-426)
# ---------------------------------------------------------------------------
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# J7/U2 — semi-join overlap (reference: set intersection dup count,
# Utils/Insert_Nox_Data_to_DB.py:62)
def q_parts_both_suppliers_and_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    has_li = p.join(li, p.p_partkey == li.l_partkey, "left_semi")
    return has_li.select("p_partkey", "p_brand")


SQL_PARTS_BOTH = """
SELECT p_partkey, p_brand FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
"""


# U1/U3 — set ops: nations with customers but no suppliers, via EXCEPT
def q_nations_cust_minus_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).exceptAll(
        s.select(F.col("s_nationkey").alias("nationkey"))
    ).distinct()


SQL_NATIONS_CUST_MINUS_SUPP = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier)
"""


def q_party_counts_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    u = c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")).unionByName(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"))
    )
    return u.groupBy("nationkey", "kind").agg(F.count(F.lit(1)).alias("n"))


SQL_PARTY_COUNTS_UNION = """
SELECT nationkey, kind, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier)
GROUP BY nationkey, kind
"""


# ---------------------------------------------------------------------------
# O1/A4 — relevance-ordered top-k per group (reference: top-100 comments
# per video, New_YouTube_Crawler_Comment.py:184-187)
# ---------------------------------------------------------------------------
def q_top5_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rnk")
    )


SQL_TOP5_ORDERS_PER_PRIORITY = """
SELECT o_orderpriority, o_orderkey, rnk FROM (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders) WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# K2/C8/A3 — metrics time series: daily observation counts (reference:
# video_views/channel_subscriber appends keyed by check_time,
# New_YouTube_Crawler.py:132-135)
# ---------------------------------------------------------------------------
def q_daily_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(_dec(F.col("value"), 4)).cast("double"), 2).alias("sum_value"),
        )
    )


SQL_DAILY_EVENT_METRICS = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# window lag: inter-event gap per user (streaming sessionization primitive)
def q_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # microsecond-exact epoch (ts is TIMESTAMP_NTZ; session tz pinned UTC),
    # matching DuckDB's epoch_us — whole-second casts would round vs
    # truncate differently across engines
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    return (
        e.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .select("event_id", "user_id", "gap_us")
    )


SQL_USER_EVENT_GAPS = """
SELECT event_id, user_id, gap_us FROM (
  SELECT event_id, user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
  FROM events) WHERE gap_us IS NOT NULL
"""


# ---------------------------------------------------------------------------
# BATCH sessionization (the offline twin of the streaming
# applyInPandasWithState sessionizer): gap > 30 min opens a new session;
# session id = running count of opens per user. Both windows are
# user-partitioned — ONE hash shuffle on user_id, per-user sorts inside
# partitions, no global sort; the closing aggregate reuses the same
# partitioning. Microsecond-integer epochs keep the twin bit-exact.
# ---------------------------------------------------------------------------
SESSION_GAP_US = 30 * 60 * 1_000_000


def q_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    opens = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.select(
        "user_id",
        epoch.alias("ep"),
        F.sum(opens).over(run).alias("session_seq"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ep").alias("session_start_us"),
        F.max("ep").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_BATCH_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ep,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
              IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
              > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS opens
  FROM events),
numbered AS (
  SELECT user_id, ep,
         CAST(sum(opens) OVER (PARTITION BY user_id
              ORDER BY ep ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM marked)
SELECT user_id, session_seq,
       CAST(min(ep) AS BIGINT) AS session_start_us,
       CAST(max(ep) AS BIGINT) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# F5/F8/F10/F13/F14 — scalar surgery: comma-grouped int parse
# (New_YouTube_Crawler_Comment.py:93-118), date diff arithmetic
# (New_YouTube_Crawler.py:249-262), truncation
# (YouTube_Crawler.py:428-429), id-from-string (Nox_Crawler.py:86-87)
# ---------------------------------------------------------------------------
def q_scalar_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey).filter(
        F.col("l_linenumber") == 1
    )
    # floor (not round) before comma-grouping: double->int rounding is
    # HALF_UP in Spark but banker's in DuckDB; floor agrees everywhere
    commas = F.format_number(F.floor(F.col("o_totalprice")).cast("long"), 0)
    return j.select(
        "l_orderkey",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_ship"
        ),
        F.substring(F.col("o_orderpriority"), 1, 3).alias("prio_code"),
        F.regexp_replace(commas, ",", "").cast("long").alias("price_reparsed"),
        F.element_at(F.split(F.col("o_orderpriority"), "-"), -1).alias("prio_word"),
    )


SQL_SCALAR_SURGERY = """
SELECT l_orderkey,
       datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS days_to_ship,
       substr(o_orderpriority, 1, 3) AS prio_code,
       CAST(replace(format('{:,}', CAST(floor(o_totalprice) AS BIGINT)), ',', '') AS BIGINT)
         AS price_reparsed,
       list_extract(string_split(o_orderpriority, '-'), -1) AS prio_word
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_linenumber = 1
"""


# F8/F9/F11 — datetime surgery: ISO-8601 round-trip
# (strptime('%Y-%m-%dT%H:%M:%SZ'), New_YouTube_Crawler.py:235-241),
# epoch->timestamp (to_timestamp(time.time()), :133-135), fixed +9h KST
# shift (Selenium_YouTube_Crawler/YouTube_Crawler.py:532,549; Seoul has no
# DST, so the zone shift equals the reference's interval arithmetic)
def q_datetime_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    iso = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    reparsed = F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    epoch_s = F.unix_micros(ts) - F.pmod(F.unix_micros(ts), F.lit(1_000_000))
    return e.select(
        "event_id",
        iso.alias("iso"),
        F.date_format(reparsed, "yyyy-MM-dd HH:mm:ss").alias("reparsed"),
        F.date_format(
            F.timestamp_micros(epoch_s), "yyyy-MM-dd HH:mm:ss"
        ).alias("from_epoch"),
        F.date_format(
            F.from_utc_timestamp(ts, "Asia/Seoul"), "yyyy-MM-dd HH:mm:ss"
        ).alias("kst"),
    )


SQL_DATETIME_SURGERY = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
       strftime(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                         '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%d %H:%M:%S') AS reparsed,
       strftime(to_timestamp(epoch_us(ts) // 1000000), '%Y-%m-%d %H:%M:%S') AS from_epoch,
       strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M:%S') AS kst
FROM events
"""


# F6 — JSON payload field extraction (reference: Data-API JSON traversal,
# New_YouTube_Crawler.py:101-105)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy((k % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.max(k).alias("max_k")
    )


SQL_JSON_EXTRACT = """
SELECT (json_extract_string(props, '$.k')::BIGINT) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       max(json_extract_string(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# C1 — the politeness budget operator applied to a generic stream: admit
# at most budget(type) earliest events per (day, event_type); quota by
# type mirrors crawl_delay -> budget (New_YouTube_Crawler.py:93)
# ---------------------------------------------------------------------------
BUDGETS = {"click": 50, "view": 30, "purchase": 5, "signup": 5, "error": 1}


def q_budget_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    budget = F.coalesce(
        *[F.when(F.col("event_type") == t, F.lit(b)) for t, b in BUDGETS.items()],
        F.lit(10),
    )
    w = Window.partitionBy(F.date_format("ts", "yyyy-MM-dd"), F.col("event_type")).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= budget)
        .select("event_id", "event_type", "rnk")
    )


def _sql_budget_admission() -> str:
    cases = " ".join(f"WHEN event_type = '{t}' THEN {b}" for t, b in BUDGETS.items())
    return f"""
SELECT event_id, event_type, rnk FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), event_type
                            ORDER BY ts ASC, event_id ASC) AS rnk
  FROM events)
WHERE rnk <= (CASE {cases} ELSE 10 END)
"""


SQL_BUDGET_ADMISSION = _sql_budget_admission()


# span explode — the interleaved-document TVF shape (X1-X6 analog):
# word spans with dense offsets from the flat documents precursor
def q_span_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import words

    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(words(F.col("text"))).alias("offset", "span_text"))
        .filter(F.col("offset") < 8)
        .withColumn("kind", F.lit("text"))
        .select("doc_id", "offset", "kind", "span_text")
    )


SQL_SPAN_EXPLODE = """
SELECT doc_id, CAST(o - 1 AS INT) AS offset, 'text' AS kind, w AS span_text
FROM (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w,
         generate_subscripts(list_filter(string_split(text, ' '), w -> w <> ''), 1) AS o
  FROM documents)
WHERE o <= 8
"""

# ---------------------------------------------------------------------------
# P4 staleness: the channel_updater re-enqueues channels whose LATEST
# upload is old (staleness = now - max(upload) per channel; the reference
# keeps videos within interval_day of now, New_YouTube_Crawler.py:259-263,
# and updates channels on a recency horizon). Horizon here = the table's
# own max ts (deterministic, no wall clock); outputs are integer days.
# ---------------------------------------------------------------------------
STALE_DAYS_MIN = 1  # testdata events span ~3 days; >=1 day = 'stale' subset


def q_channel_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    per_user = e.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .withColumn("stale_days", F.datediff(F.col("h"), F.col("last_day")).cast("int"))
        .filter(F.col("stale_days") >= STALE_DAYS_MIN)
        .select("user_id", "stale_days", "n_events")
    )


SQL_CHANNEL_STALENESS = f"""
WITH h AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
per_user AS (
  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(date_diff('day', last_day, (SELECT h FROM h)) AS INT) AS stale_days,
       n_events
FROM per_user
WHERE date_diff('day', last_day, (SELECT h FROM h)) >= {STALE_DAYS_MIN}
"""


# ---------------------------------------------------------------------------
# A-family breadth: ROLLUP (grouping-sets) metrics — per (day, type),
# per day, and grand total in ONE pass (map-side partials per grouping
# set; the OLAP shape of the reference's layered count queries)
# ---------------------------------------------------------------------------
def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.rollup(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_DAILY_ROLLUP = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY ROLLUP (1, 2)
"""


def q_cube_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the corpus dimensions: every (source, lang) combination
    plus both marginals and the grand total in one pass — the OLAP
    summary a curation dashboard reads (all-integer measures, so the
    grouping-set expansion is engine-exact)."""
    d = load(spark, sf_dir, "documents")
    return d.cube("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


SQL_CUBE_SOURCE_LANG = """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY CUBE (1, 2)
"""


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot the event log to one row per user with a count column per
    event type (explicit value list — no extra distinct pass, and the
    output schema is static as a contract query needs). Spark's pivot
    yields NULL for absent cells; coalesced to 0 to match the FILTER
    aggregation the oracle uses."""
    e = load(spark, sf_dir, "events")
    p = e.groupBy("user_id").pivot("event_type", PIVOT_EVENT_TYPES).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_EVENT_TYPES],
    )


SQL_PIVOT_EVENT_TYPE_COUNTS = "SELECT user_id, " + ", ".join(
    f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
    for t in PIVOT_EVENT_TYPES
) + " FROM events GROUP BY user_id"


# ---------------------------------------------------------------------------
# as-of join (round 3) — the classic operator Spark's DataFrame API lacks
# as a primitive: for every purchase, the user's LATEST click at or
# before the purchase time (ad-attribution shape). Implemented the
# distributed way: tag both sides, union, ONE shuffle+sort on
# (user_id; ts, kind, tie), then a running last-non-null carry — never a
# per-row probe, never a nested loop. Cost is one shuffle of the union,
# identical to a plain keyed join; hot users are the skew axis (salt the
# user key and merge carries if one user exceeds a partition). Oracle is
# DuckDB's native ASOF JOIN over a tie-collapsed right side.
# ---------------------------------------------------------------------------


def q_asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    # right side: clicks, collapsed to max event_id per (user, ts) so the
    # at-tie winner is deterministic in both engines
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", ep.alias("t_us"))
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "t_us",
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.struct(F.col("t_us").alias("c_us"), F.col("click_id").alias("cid")).alias("carry"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        ep.alias("t_us"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("struct<c_us:long,cid:long>").alias("carry"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("carry", ignorenulls=True).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("cw", carried)
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("cw.cid"), F.lit(-1)).alias("last_click_id"),
            F.coalesce(F.col("t_us") - F.col("cw.c_us"), F.lit(-1)).alias("lag_us"),
        )
    )


SQL_ASOF_JOIN_ATTRIBUTION = """
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS c_us, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
purchases AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
       coalesce(c.click_id, -1) AS last_click_id,
       coalesce(p.t_us - c.c_us, -1) AS lag_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.t_us >= c.c_us
"""


# ---------------------------------------------------------------------------
# banded range join (round 3): purchase/error event pairs within
# RANGE_BAND_US of each other GLOBALLY (no key equality available — the
# worst case for a range join). The scalable plan quantizes time into
# RANGE_BAND_US buckets and equi-joins each left row against buckets
# {b-1, b, b+1} (right side exploded 3x), so candidates are only the
# rows that can possibly match — never a CartesianProduct/BNLJ, which is
# what a naive |t1-t2| <= band predicate compiles to. Bucket population
# is bounded by event rate x band, independent of corpus size.
# ---------------------------------------------------------------------------
RANGE_BAND_US = 600_000_000  # 10 min (non-empty down to sf0.001 densities)


def q_range_join_time_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        ep.alias("p_us"),
        F.floor(ep / RANGE_BAND_US).alias("b"),
    )
    err = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            ep.alias("e_us"),
            F.explode(
                F.array(
                    F.floor(ep / RANGE_BAND_US) - 1,
                    F.floor(ep / RANGE_BAND_US),
                    F.floor(ep / RANGE_BAND_US) + 1,
                )
            ).alias("b"),
        )
    )
    return (
        purch.join(err, "b")
        .filter(F.abs(F.col("p_us") - F.col("e_us")) <= RANGE_BAND_US)
        .select("purchase_id", "error_id", (F.col("e_us") - F.col("p_us")).alias("delta_us"))
        .distinct()
    )


SQL_RANGE_JOIN_TIME_BAND = f"""
SELECT DISTINCT p.event_id AS purchase_id, x.event_id AS error_id,
       epoch_us(x.ts) - epoch_us(p.ts) AS delta_us
FROM events p JOIN events x
  ON abs(epoch_us(p.ts) - epoch_us(x.ts)) <= {RANGE_BAND_US}
WHERE p.event_type = 'purchase' AND x.event_type = 'error'
"""


# ---------------------------------------------------------------------------
# K3/K4 at file granularity — catalog copy-on-write MERGE (upsert). The
# reference upserts row-at-a-time (ON CONFLICT per execute,
# New_YouTube_Crawler.py:210-275); a lakehouse nightly delta is the same
# semantics as ONE snapshot commit that rewrites only the data files whose
# key stats intersect the delta (catalog.Catalog.merge).
# ---------------------------------------------------------------------------
def q_catalog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a deterministic orders delta into a catalog table and read
    the merged snapshot back: keys ≡3 (mod 7) get doubled prices
    (matched → replace), negated keys ≡5 (mod 101) are brand-new rows
    (not matched → insert). All arithmetic is exact in binary64 (×2 is
    an exponent bump, +1 a single correctly-rounded add), so the DuckDB
    twin is bit-identical. The base is range-partitioned on the key so
    file min/max stats are tight — the COW property (untouched files
    carried over by name) is pinned by tests/test_catalog_merge.py."""
    import tempfile

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..catalog import Catalog

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderstatus", StringType()),
        ]
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="merge_wh_"))
    cat.append(
        "orders_m",
        orders.repartitionByRange(8, "o_orderkey"),
        stat_cols=["o_orderkey"],
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 3)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 101 == 5).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                (F.col("o_totalprice") + 1).alias("o_totalprice"),
                F.lit("NEW").alias("o_orderstatus"),
            )
        )
    )
    cat.merge("orders_m", schema, updates, key="o_orderkey", stat_cols=["o_orderkey"])
    return cat.read("orders_m", schema)


SQL_CATALOG_MERGE_UPSERT = """
SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey % 7 = 3
UNION ALL
SELECT -o_orderkey, o_totalprice + 1, 'NEW'
FROM orders WHERE o_orderkey % 101 = 5
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey % 7 <> 3
"""


# ---------------------------------------------------------------------------
# Point lookup over an append log via manifest blooms. The reference answers
# "have I seen this id?" with a SELECT on an indexed Postgres column
# (New_YouTube_Crawler.py seen checks); the lakehouse equivalent of that
# index is a per-file bloom in the manifest — min/max stats are useless on
# a hash-keyed log (every file spans the full range), the bloom still
# prunes to ~1 file per probe (tests/test_manifest_bloom.py).
# ---------------------------------------------------------------------------
def q_catalog_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an orders log of 4 hash-interleaved appends (nothing
    min/max-prunable), bloom the key column, then answer five fixed
    point lookups (the smallest keys ≡11 mod 97) plus one known-missing
    key through read_point — driver-side file pruning, row-level
    equality inside the surviving files."""
    import functools
    import tempfile

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..catalog import Catalog

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="point_wh_"))
    for i in range(4):
        cat.append(
            "o",
            orders.filter(F.col("o_orderkey") % 4 == i),
            stat_cols=["o_orderkey"],
            bloom_cols=["o_orderkey"],
        )
    keys = [
        r[0]
        for r in orders.filter("o_orderkey % 97 = 11")
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    ]
    parts = [cat.read_point("o", schema, "o_orderkey", k) for k in keys]
    parts.append(cat.read_point("o", schema, "o_orderkey", -12345))
    return functools.reduce(DataFrame.unionByName, parts)


SQL_CATALOG_POINT_LOOKUP = """
WITH k AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 11
  ORDER BY o_orderkey LIMIT 5)
SELECT o.o_orderkey, o.o_totalprice, o.o_orderpriority
FROM orders o JOIN k USING (o_orderkey)
"""


# ---------------------------------------------------------------------------
# Corpus takedown — catalog copy-on-write DELETE (catalog.Catalog.delete_where).
# The training-corpus operation the reference expresses as per-row SQL
# DELETEs (psycopg2 loop shape): purge every document from a host
# (right-to-be-forgotten / robots retro-compliance), then purge an explicit
# doc_id list (DMCA notice). At 100 TB only the files whose manifest stats
# intersect the predicate are rewritten; tests/test_catalog_delete.py pins
# the untouched-files-carry-by-name property.
# ---------------------------------------------------------------------------
def q_catalog_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two COW deletes against a documents catalog table: (1) every doc
    from the lexicographically smallest source — source-range-partitioned
    layout, so file min/max stats prune the rewrite to the files holding
    that host; (2) an explicit doc_id list (keys ≡3 mod 997) —
    bloom-prunable point deletes. Returns the surviving table."""
    import tempfile

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..catalog import Catalog

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("lang", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="takedown_wh_"))
    cat.append(
        "docs_t",
        docs.repartitionByRange(8, "source", "doc_id"),
        stat_cols=["source", "doc_id"],
        bloom_cols=["doc_id"],
    )
    target = docs.agg(F.min("source")).collect()[0][0]
    cat.delete_where(
        "docs_t",
        schema,
        f"source = '{target}'",
        key="source",
        key_values=[target],
        stat_cols=["source", "doc_id"],
    )
    # delete_where's contract is a BOUNDED key list (a takedown notice,
    # not a predicate over the corpus); model that bound in the demo —
    # the collect is capped and the cap is loud, never silent truncation
    ids = sorted(
        r[0]
        for r in docs.filter(F.col("doc_id") % 997 == 3)
        .select("doc_id")
        .limit(1001)
        .collect()
    )
    if len(ids) > 1000:
        raise ValueError(
            "takedown demo key list exceeded the 1000-key bound; "
            "delete_where expects a bounded takedown list"
        )
    if ids:
        cat.delete_where(
            "docs_t",
            schema,
            "doc_id IN (" + ", ".join(str(i) for i in ids) + ")",
            key="doc_id",
            key_values=ids,
            stat_cols=["source", "doc_id"],
        )
    return cat.read("docs_t", schema)


SQL_CATALOG_TAKEDOWN = """
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE source <> (SELECT min(source) FROM documents)
  AND doc_id % 997 <> 3
"""


# ---------------------------------------------------------------------------
# Time travel + CDC/incremental read — the two snapshot-consumer faces of
# the catalog as driver-checked contract queries. Both build a 3-batch
# append history (doc_id mod 3 splits the documents table), then a COW
# delete on top; the time-travel read targets the pre-delete snapshot
# (reads must see deleted rows again), the incremental read returns only
# snapshot 2's added files (the Iceberg changelog shape a downstream
# trainer tails instead of rescanning the corpus). Nothing here rescans:
# time travel is a plain file-list read of an older manifest entry;
# read_delta scans only the delta files (file-pruning is structural, not
# statistical). tests/test_catalog*.py pin the mechanics; these queries
# make them driver-visible.
# ---------------------------------------------------------------------------
def _batched_docs_catalog(spark: SparkSession, sf_dir: str):
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ..catalog import Catalog

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    cat = Catalog(spark, tempfile.mkdtemp(prefix="ttcdc_wh_"))
    for k in range(3):
        cat.append(
            "docs_h",
            docs.filter(F.col("doc_id") % 3 == k).repartition(4, "doc_id"),
            stat_cols=["doc_id"],
        )
    return cat, schema


def q_catalog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF read: after 3 appends (snapshots 0,1,2) and a COW delete of
    doc_id%7==0 (snapshot 3), read snapshot 1 (first two batches,
    pre-delete) — deleted rows must reappear, batch 3 must not exist
    yet."""
    cat, schema = _batched_docs_catalog(spark, sf_dir)
    cat.delete_where(
        "docs_h", schema, "doc_id % 7 = 0", stat_cols=["doc_id"]
    )
    return cat.read("docs_h", schema, snapshot=1)


SQL_CATALOG_TIME_TRAVEL = """
SELECT doc_id, source, n_chars
FROM documents
WHERE doc_id % 3 IN (0, 1)
"""


def q_catalog_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog read: only the rows snapshot 2 APPENDED (the third
    batch, doc_id%3 == 2), scanning only that snapshot's added files."""
    cat, schema = _batched_docs_catalog(spark, sf_dir)
    return cat.read_delta("docs_h", schema, snapshot=2)


SQL_CATALOG_INCREMENTAL_READ = """
SELECT doc_id, source, n_chars
FROM documents
WHERE doc_id % 3 = 2
"""


# ---------------------------------------------------------------------------
# Table profiling: per-column (rows, nulls, distinct estimate, min, max)
# — the stats-collection primitive behind query planning (ANALYZE
# TABLE), data-quality monitoring, and schema-drift alerts on a standing
# crawl corpus. Two scans, both scale-shaped:
#
#   pass 1 — nulls/min/max/count for all columns in ONE wide aggregate:
#     every agg is non-distinct so the state is constant-size and
#     map-side combinable (no Expand — the r4 form's six exact
#     count_distincts in one agg made Catalyst Expand each input row
#     ×7 BEFORE the shuffle, a full-table multiply-then-shuffle;
#     VERDICT r4 "What's wrong" #1);
#   pass 2 — per-column distinct ESTIMATES via the engine-exact HLL
#     register math of operators/sketches.py: stack() the six columns
#     into (column_name, canonical_value) rows — a ×6 Generate, but it
#     feeds straight into groupBy(column_name, register).max(rho) whose
#     partial aggregation condenses each map partition to ≤ 6×64
#     register rows, so the shuffle is constant-size regardless of row
#     count. The estimate is the same all-integer raw-HLL formula the
#     hll_distinct contract pins (linear-counting correction is applied
#     driver-side by consumers via regs_hit, as there; est is raw).
#
# Distinctness is counted over the column's CANONICAL RENDERING (ints
# as decimal strings, doubles as floor-cents, timestamps via a fixed
# strftime) — the same engine-portable forms min/max use, so both
# engines hash identical bytes. plan test: tests/test_plans.py asserts
# no Expand node anywhere in the physical plan.
# ---------------------------------------------------------------------------
_PROFILE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _profile_fmt_spark(c: str, kind: str, agg: str):
    x = getattr(F, agg)(F.col(c))
    if kind == "int":
        return x.cast("string")
    if kind == "num":
        return F.floor(x * 100).cast("long").cast("string")
    if kind == "ts":
        return F.date_format(x, "yyyy-MM-dd HH:mm:ss")
    return x


def _profile_val_spark(c: str, kind: str) -> str:
    """Canonical per-value rendering (Spark SQL) — the bytes both engines
    hash for the HLL distinct estimate; same forms as min/max."""
    if kind == "int":
        return f"CAST({c} AS STRING)"
    if kind == "num":
        return f"CAST(CAST(floor({c} * 100) AS BIGINT) AS STRING)"
    if kind == "ts":
        return f"date_format({c}, 'yyyy-MM-dd HH:mm:ss')"
    return c


def _profile_val_duck(c: str, kind: str) -> str:
    if kind == "int":
        return f"CAST({c} AS VARCHAR)"
    if kind == "num":
        return f"CAST(CAST(floor({c} * 100) AS BIGINT) AS VARCHAR)"
    if kind == "ts":
        return f"strftime({c}, '%Y-%m-%d %H:%M:%S')"
    return c


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import HLL_ALPHA_NUM, HLL_M, HLL_S, _rho_sql

    o = load(spark, sf_dir, "orders")
    # pass 1: one wide non-distinct aggregate (constant state, no Expand)
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            _profile_fmt_spark(c, kind, "min").alias(f"{c}__min"),
            _profile_fmt_spark(c, kind, "max").alias(f"{c}__max"),
        ]
    row = o.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__min, {c}__max" for c, _ in _PROFILE_COLS
    )
    base = row.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (column_name, n_nulls, min_s, max_s)",
    )
    # pass 2: per-column HLL registers in one scan; shuffle is at most
    # n_cols × HLL_M register rows after map-side max(rho)
    val_args = ", ".join(
        f"'{c}', {_profile_val_spark(c, kind)}" for c, kind in _PROFILE_COLS
    )
    obs = (
        o.selectExpr(
            f"stack({len(_PROFILE_COLS)}, {val_args}) AS (column_name, val)"
        )
        .filter(F.col("val").isNotNull())
        .selectExpr("column_name", "md5(val) AS hx")
        .selectExpr(
            "column_name",
            f"CAST(conv(substring(hx, 1, 8), 16, 10) AS BIGINT) % {HLL_M} AS reg",
            _rho_sql("substring(hx, 9, 8)") + " AS rho",
        )
    )
    per = (
        obs.groupBy("column_name", "reg")
        .agg(F.max("rho").alias("rho"))
        .groupBy("column_name")
        .agg(
            F.count("*").alias("regs_hit"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_S} - rho)")
            ).alias("denom_obs"),
        )
    )
    est = per.select(
        "column_name",
        "regs_hit",
        F.expr(
            f"CAST({HLL_ALPHA_NUM} AS BIGINT) div "
            f"(denom_obs + ({HLL_M} - regs_hit) * CAST({1 << HLL_S} AS BIGINT))"
        ).alias("n_distinct_est"),
    )
    return (
        base.join(F.broadcast(est), "column_name", "left")
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            F.coalesce("n_distinct_est", F.lit(0)).cast("long").alias(
                "n_distinct_est"
            ),
            F.coalesce("regs_hit", F.lit(0)).cast("long").alias("regs_hit"),
            "min_s",
            "max_s",
        )
    )


def _profile_fmt_duck(c: str, kind: str, agg: str) -> str:
    if kind == "int":
        return f"CAST({agg}({c}) AS VARCHAR)"
    if kind == "num":
        return f"CAST(CAST(floor({agg}({c}) * 100) AS BIGINT) AS VARCHAR)"
    if kind == "ts":
        return f"strftime({agg}({c}), '%Y-%m-%d %H:%M:%S')"
    return f"{agg}({c})"


_SQL_PROFILE_BASE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       {_profile_fmt_duck(c, kind, 'min')} AS min_s,
       {_profile_fmt_duck(c, kind, 'max')} AS max_s
FROM orders"""
    for c, kind in _PROFILE_COLS
)

_SQL_PROFILE_VALS = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column_name, {_profile_val_duck(c, kind)} AS val"
    f" FROM orders WHERE {c} IS NOT NULL"
    for c, kind in _PROFILE_COLS
)


def _sql_table_profile() -> str:
    from .sketches import HLL_ALPHA_NUM, HLL_M, HLL_S, _rho_sql

    return f"""
WITH base AS (
{_SQL_PROFILE_BASE}),
vals AS (
{_SQL_PROFILE_VALS}),
obs AS (
  SELECT column_name,
         ('0x' || substr(md5(val), 1, 8))::BIGINT % {HLL_M} AS reg,
         {_rho_sql("substr(md5(val), 9, 8)")} AS rho
  FROM vals),
regs AS (
  SELECT column_name, reg, max(rho) AS rho FROM obs GROUP BY column_name, reg),
per AS (
  SELECT column_name, CAST(count(*) AS BIGINT) AS regs_hit,
         CAST(sum(1::BIGINT << ({HLL_S} - rho)) AS BIGINT) AS denom_obs
  FROM regs GROUP BY column_name),
est AS (
  SELECT column_name, regs_hit,
         {HLL_ALPHA_NUM}::BIGINT
           // (denom_obs + ({HLL_M} - regs_hit) * {1 << HLL_S}::BIGINT)
           AS n_distinct_est
  FROM per)
SELECT b.column_name, n_rows, n_nulls,
       CAST(COALESCE(n_distinct_est, 0) AS BIGINT) AS n_distinct_est,
       CAST(COALESCE(regs_hit, 0) AS BIGINT) AS regs_hit,
       min_s, max_s
FROM base b LEFT JOIN est USING (column_name)
"""


SQL_TABLE_PROFILE = _sql_table_profile()


# ---------------------------------------------------------------------------
# Field-id schema evolution as a driver-checked contract query
# (catalog.rename_column/add_column): a standing 100-TB corpus lives
# through schema changes, and rewriting the table for a RENAME is not an
# option. v0 batch lands under (okey, cents); the column is renamed to
# total_cents and a channel column is added — both metadata-only commits
# (zero bytes rewritten, pinned by tests/test_schema_registry.py); the v1
# batch lands under the new schema. The mixed-version read resolves each
# file's write-time names through stable field ids (old files' `cents`
# bytes serve `total_cents`; their `channel` is NULL-filled), then one
# aggregate proves values AND null-semantics exactly against an oracle
# that replays the same union in plain SQL. Prices travel as floor-cents
# BIGINT so the cross-engine sums compare exactly. The reference's only
# schema-change story is a hand-run ALTER TABLE on its Postgres store.
# ---------------------------------------------------------------------------
def q_catalog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ..catalog import Catalog

    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    cat = Catalog(spark, tempfile.mkdtemp(prefix="schemaevo_wh_"))
    cat.append(
        "orders_e",
        o.filter(F.col("o_orderkey") % 3 == 0).select(
            F.col("o_orderkey").alias("okey"), cents.alias("cents")
        ),
        stat_cols=["okey"],
    )
    cat.rename_column("orders_e", "cents", "total_cents")
    cat.add_column("orders_e", "channel")
    cat.append(
        "orders_e",
        o.filter(F.col("o_orderkey") % 3 == 1).select(
            F.col("o_orderkey").alias("okey"),
            cents.alias("total_cents"),
            F.when(F.col("o_orderkey") % 2 == 0, "web")
            .otherwise("app")
            .alias("channel"),
        ),
        stat_cols=["okey"],
    )
    schema = StructType(
        [
            StructField("okey", LongType()),
            StructField("total_cents", LongType()),
            StructField("channel", StringType()),
        ]
    )
    return (
        cat.read("orders_e", schema)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("total_cents").alias("sum_cents"),
            F.sum("okey").alias("sum_okey"),
        )
    )


SQL_CATALOG_SCHEMA_EVOLUTION = """
WITH unified AS (
    SELECT o_orderkey AS okey,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(NULL AS VARCHAR) AS channel
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100) AS BIGINT),
           CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'app' END
    FROM orders WHERE o_orderkey % 3 = 1
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(total_cents) AS BIGINT) AS sum_cents,
       CAST(sum(okey) AS BIGINT) AS sum_okey
FROM unified
GROUP BY channel
"""


# ---------------------------------------------------------------------------
# SCD2 (slowly-changing-dimension type 2) apply — the versioned-dimension
# maintenance pattern: an incoming change batch CLOSES the current row of
# every key whose tracked value actually changed (valid_to = batch) and
# INSERTS the new version (valid_from = batch, open); identical incoming
# values are suppressed as no-ops; untouched keys carry through. The
# reference's analogue is its status-flag UPDATE loop (one row per key,
# history lost); SCD2 keeps the full history queryable AS-OF any batch.
# Scale shape: one full-outer hash join of the current slice with the
# change batch on the key (change batches are dimension-sized — Spark
# broadcasts when small), then pure projections; no window, no repeated
# scans. Values travel as floor-cents BIGINT so the engines compare
# exactly.
# ---------------------------------------------------------------------------
def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    batch_id: int,
) -> DataFrame:
    """Apply one change batch to a versioned dimension. ``dim`` rows:
    key, tracked..., valid_from, valid_to (null = open), is_current.
    ``changes`` rows: key, tracked... Returns the new full dimension."""
    closed_hist = dim.filter(~F.col("is_current"))
    cur = dim.filter(F.col("is_current"))
    ch = changes.select(
        F.col(key).alias("_k"), *[F.col(c).alias(f"_n_{c}") for c in tracked]
    )
    j = cur.join(ch, cur[key] == ch["_k"], "full_outer")
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"_n_{c}"))
    untouched = j.filter(F.col("_k").isNull() | same).select(dim.columns)
    closing = j.filter(F.col("_k").isNotNull() & F.col(key).isNotNull() & ~same)
    closed = closing.select(
        key,
        *tracked,
        "valid_from",
        F.lit(batch_id).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = closing.select(
        F.col("_k").alias(key),
        *[F.col(f"_n_{c}").alias(c) for c in tracked],
        F.lit(batch_id).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    inserts = j.filter(F.col(key).isNull()).select(
        F.col("_k").alias(key),
        *[F.col(f"_n_{c}").alias(c) for c in tracked],
        F.lit(batch_id).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_hist.unionByName(untouched).unionByName(closed).unionByName(
        opened
    ).unionByName(inserts)


def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: customers as an SCD2 dimension through one change
    batch — keys ≡0 mod 7 arrive with a new balance EXCEPT keys ≡0
    mod 21, which arrive unchanged (no-op suppression), plus one brand-
    new key beyond the current max (insert path)."""
    c = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100).cast("long")
    dim = c.select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        cents.alias("bal_cents"),
        F.lit(0).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    max_key = c.agg(F.max("c_custkey")).collect()[0][0]
    changes = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            F.col("c_custkey").cast("long").alias("custkey"),
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.when(F.col("c_custkey") % 21 == 0, cents)
            .otherwise(cents + 1000)
            .alias("bal_cents"),
        )
        .unionByName(
            spark.createDataFrame(
                [(int(max_key) + 1, 0, 12345)],
                "custkey long, nationkey long, bal_cents long",
            )
        )
    )
    return scd2_apply(
        dim, changes, "custkey", ["nationkey", "bal_cents"], batch_id=1
    )


SQL_SCD2_DIMENSION = """
WITH dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS custkey,
         CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer),
changed AS (
  SELECT custkey FROM dim
  WHERE custkey % 7 = 0 AND custkey % 21 <> 0)
SELECT custkey, nationkey, bal_cents,
       0 AS valid_from,
       CASE WHEN custkey IN (SELECT custkey FROM changed)
            THEN 1 ELSE NULL END AS valid_to,
       custkey NOT IN (SELECT custkey FROM changed) AS is_current
FROM dim
UNION ALL
SELECT custkey, nationkey, bal_cents + 1000, 1, NULL, TRUE
FROM dim WHERE custkey IN (SELECT custkey FROM changed)
UNION ALL
SELECT (SELECT max(custkey) FROM dim) + 1, 0, 12345, 1, NULL, TRUE
"""


QUERIES = {
    "pricing_summary_agg": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "recent_orders_scan": (q_recent_orders, SQL_RECENT_ORDERS),
    "revenue_per_nation_join": (q_revenue_per_nation, SQL_REVENUE_PER_NATION),
    "customers_without_orders_anti": (q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS),
    "parts_with_lineitems_semi": (q_parts_both_suppliers_and_lineitems, SQL_PARTS_BOTH),
    "nations_cust_minus_supp_except": (q_nations_cust_minus_supp, SQL_NATIONS_CUST_MINUS_SUPP),
    "party_counts_union": (q_party_counts_union, SQL_PARTY_COUNTS_UNION),
    "top5_orders_per_priority": (q_top5_orders_per_priority, SQL_TOP5_ORDERS_PER_PRIORITY),
    "daily_event_metrics": (q_daily_event_metrics, SQL_DAILY_EVENT_METRICS),
    "user_event_gaps_window": (q_user_event_gaps, SQL_USER_EVENT_GAPS),
    "batch_sessionize": (q_batch_sessionize, SQL_BATCH_SESSIONIZE),
    "scalar_surgery": (q_scalar_surgery, SQL_SCALAR_SURGERY),
    "datetime_surgery": (q_datetime_surgery, SQL_DATETIME_SURGERY),
    "json_extract_agg": (q_json_extract, SQL_JSON_EXTRACT),
    "budget_admission": (q_budget_admission, SQL_BUDGET_ADMISSION),
    "span_explode": (q_span_explode, SQL_SPAN_EXPLODE),
    "channel_staleness": (q_channel_staleness, SQL_CHANNEL_STALENESS),
    "daily_rollup": (q_daily_rollup, SQL_DAILY_ROLLUP),
    "cube_source_lang": (q_cube_source_lang, SQL_CUBE_SOURCE_LANG),
    "pivot_event_type_counts": (
        q_pivot_event_type_counts,
        SQL_PIVOT_EVENT_TYPE_COUNTS,
    ),
    "asof_join_attribution": (q_asof_join_attribution, SQL_ASOF_JOIN_ATTRIBUTION),
    "range_join_time_band": (q_range_join_time_band, SQL_RANGE_JOIN_TIME_BAND),
    "catalog_merge_upsert": (q_catalog_merge_upsert, SQL_CATALOG_MERGE_UPSERT),
    "catalog_point_lookup": (q_catalog_point_lookup, SQL_CATALOG_POINT_LOOKUP),
    "catalog_takedown": (q_catalog_takedown, SQL_CATALOG_TAKEDOWN),
    "catalog_schema_evolution": (
        q_catalog_schema_evolution,
        SQL_CATALOG_SCHEMA_EVOLUTION,
    ),
    "scd2_dimension": (q_scd2_dimension, SQL_SCD2_DIMENSION),
    "catalog_time_travel": (q_catalog_time_travel, SQL_CATALOG_TIME_TRAVEL),
    "catalog_incremental_read": (
        q_catalog_incremental_read,
        SQL_CATALOG_INCREMENTAL_READ,
    ),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
}
