"""Relational operators from SURVEY.md §2 over the driver test tables,
each paired with its DuckDB oracle SQL.

Float discipline: sums over doubles are order-dependent across engines, so
every money/quantity aggregate is computed over per-row values rounded and
cast to decimal (exact, associative) and only then cast back to double —
both in Spark and in the oracle SQL. Timestamps are rendered to strings on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _utc(spark: SparkSession) -> None:
    """Pin the session timezone: parquet timestamps are UTC-normalized and
    the DuckDB oracle renders them naively, so a non-UTC driver session
    would shift every date_format/date_trunc result."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# -- A5: kind histogram (reference export_inspect.py:83-85) -------------------

def kind_histogram(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


KIND_HISTOGRAM_SQL = """
SELECT event_type, count(*) AS n
FROM events GROUP BY event_type ORDER BY n DESC, event_type
"""


# -- A3: group → sorted collected set (reference apis_report.py:184-245) ------

def collect_sources(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.concat_ws(
                ",",
                F.transform(F.array_sort(F.collect_set("user_id")),
                            lambda x: x.cast("string")),
            ).alias("user_ids")
        )
        .orderBy("event_type")
    )


COLLECT_SOURCES_SQL = """
SELECT event_type,
       array_to_string(list(DISTINCT user_id ORDER BY user_id), ',') AS user_ids
FROM events GROUP BY event_type ORDER BY event_type
"""


# -- A8: first-seen ordered dedupe (reference cli.py:496, exporters :45-54) ---

def first_seen(spark, sf_dir):
    _utc(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
        .orderBy("user_id")
    )


FIRST_SEEN_SQL = """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
"""


# -- A4: prefer-first pick per key (reference apis_report.py:189-204) ---------

def latest_pick(spark, sf_dir):
    _utc(spark)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


LATEST_PICK_SQL = """
SELECT user_id, event_id, event_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
"""


# -- P8/J1: resume anti-join (reference done/failed skip, crawl.py:938-939) ---

def anti_join_resume(spark, sf_dir):
    """Resume semantics: orders placed before 1996 stand in for the
    "already processed" set; pending customers are those with no
    processed order. (The date gate exists so the pending set is
    NON-empty at every sf — a 0-vs-0 oracle row would also pass with a
    broken join key, proving nothing.)"""
    customer = _t(spark, sf_dir, "customer")
    done = (_t(spark, sf_dir, "orders")
            .filter(F.col("o_orderdate") < F.lit("1996-01-01"))
            .select(F.col("o_custkey").alias("c_custkey")))
    return (
        customer.join(done, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ANTI_JOIN_RESUME_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate < DATE '1996-01-01')
ORDER BY c_custkey
"""


# -- P9 + P14: status-range gate + truncation (crawl.py:311-318, 61-64) -------

def gate_truncate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    truncated = F.when(
        F.length("text") > 300,
        F.concat(F.substring("text", 1, 300), F.lit("[TRUNCATED]")),
    ).otherwise(F.col("text"))
    return (
        docs.filter(F.col("n_chars").between(200, 2000))
        .select(F.col("doc_id"), truncated.alias("out_text"))
        .orderBy("doc_id")
    )


GATE_TRUNCATE_SQL = """
SELECT doc_id,
       CASE WHEN length(text) > 300
            THEN substring(text, 1, 300) || '[TRUNCATED]'
            ELSE text END AS out_text
FROM documents WHERE n_chars BETWEEN 200 AND 2000 ORDER BY doc_id
"""


# -- S8/P16: content-addressed dedupe (reference _store_raw crawl.py:850-867) -

def sha_dedupe(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("sha", F.substring(F.sha2("text", 256), 1, 16))
        .groupBy("sha")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("sha")
    )


SHA_DEDUPE_SQL = """
SELECT substring(sha256(text), 1, 16) AS sha,
       count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 ORDER BY sha
"""


# -- O6/E15: top-1 preference pick (reference fetch_latest_docs.py:63-82) -----

def top1_pick(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    pref = F.when(F.col("p_name").contains("green"), 0).otherwise(1)
    return (
        part.orderBy(pref, F.length("p_name"), "p_name", "p_partkey")
        .select("p_partkey", "p_name")
        .limit(1)
    )


TOP1_PICK_SQL = """
SELECT p_partkey, p_name FROM part
ORDER BY (CASE WHEN p_name LIKE '%green%' THEN 0 ELSE 1 END),
         length(p_name), p_name, p_partkey
LIMIT 1
"""


# -- E15 (full): ZIP single-HTML member pick over a synthetic listing ----------
# Reference docs/pyUSPTO/fetch_latest_docs.py:63-74: .html members only,
# prefer names containing "index", then shortest name. The kernel-side
# byte-level pick lives in kernels/zipkit.pick_single_html; this query is
# the same ordering as a relational operator over (archive, member, size)
# listings — one window pick per archive, no driver involvement.

def zip_member_pick(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    member = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("site/page-"), did, F.lit(".html")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("assets/style-"), did, F.lit(".css")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("deep/nested/article-"), did, F.lit(".html")))
        .when(F.col("doc_id") % 8 == 3,
              F.concat(F.lit("idx/index-"), did, F.lit(".html")))
        .otherwise(F.concat(F.lit("img/pic-"), did, F.lit(".png")))
    )
    listing = docs.select(
        (F.col("doc_id") % 50).alias("archive_id"),
        member.alias("member"),
        F.col("n_chars").cast("long").alias("member_size"),
    ).filter(F.lower("member").endswith(".html"))
    w = Window.partitionBy("archive_id").orderBy(
        F.when(F.lower("member").contains("index"), 0).otherwise(1),
        F.length("member"), F.col("member"))
    return (
        listing.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("archive_id", "member", "member_size")
        .orderBy("archive_id")
    )


ZIP_MEMBER_PICK_SQL = """
WITH listing AS (
  SELECT doc_id % 50 AS archive_id,
         CASE WHEN doc_id % 4 = 0 THEN 'site/page-' || doc_id || '.html'
              WHEN doc_id % 4 = 1 THEN 'assets/style-' || doc_id || '.css'
              WHEN doc_id % 4 = 2 THEN 'deep/nested/article-' || doc_id || '.html'
              WHEN doc_id % 8 = 3 THEN 'idx/index-' || doc_id || '.html'
              ELSE 'img/pic-' || doc_id || '.png' END AS member,
         CAST(n_chars AS BIGINT) AS member_size
  FROM documents
), html AS (
  SELECT *, row_number() OVER (
      PARTITION BY archive_id
      ORDER BY (CASE WHEN lower(member) LIKE '%index%' THEN 0 ELSE 1 END),
               length(member), member) AS rn
  FROM listing WHERE lower(member) LIKE '%.html'
)
SELECT archive_id, member, member_size FROM html WHERE rn = 1
ORDER BY archive_id
"""


# -- JSON path extraction + aggregate (reference E9/A6 shapes) -----------------

def json_props_agg(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


JSON_PROPS_AGG_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# -- J3/J5: broadcast dimension joins (reference url→path map join) -----------

def join_enrich(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
                / 100.0 / F.count("*"), 6).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


JOIN_ENRICH_SQL = """
SELECT r_name, count(*) AS n_customers,
       round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0
             / count(*), 6) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# -- TPC-H Q1-style pricing summary (flagship relational aggregate) -----------

def pricing_summary(spark, sf_dir):
    _utc(spark)
    # All money columns carry 2-decimal precision: scale each factor to an
    # exact integer (×100) before multiplying/summing, so both engines sum
    # identical longs — no per-row double-rounding divergence.
    li = _t(spark, sf_dir, "lineitem")
    pe = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    pq = F.round(F.col("l_quantity") * 100, 0).cast("long")
    pd_ = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    pt = F.round((1 + F.col("l_tax")) * 100, 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(pq) / 100.0).alias("sum_qty"),
            (F.sum(pe) / 100.0).alias("sum_base_price"),
            (F.sum(pe * pd_) / 10000.0).alias("sum_disc_price"),
            (F.sum(pe * pd_ * pt) / 1000000.0).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)
           * CAST(round((1 + l_tax) * 100, 0) AS BIGINT)) / 1000000.0 AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- Streaming-analog tumbling-window aggregate (batch semantics) -------------

def windowed_event_counts(spark, sf_dir):
    _utc(spark)
    events = _t(spark, sf_dir, "events")
    return (
        events.withColumn(
            "hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0)
            .alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


WINDOWED_EVENT_COUNTS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n,
       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


SESSION_GAP_MIN = 30


def session_counts(spark, sf_dir):
    """Per-user activity sessions (30-minute inactivity gap) via Spark's
    native ``session_window`` — the same session assignment Structured
    Streaming would produce on this event stream (here in batch, where the
    whole timeline is known). Output: one row per session with its start,
    event count, and active span in seconds (last − first event, i.e. the
    window minus the trailing gap, which is engine-independent).

    Scale shape: session_window is a single shuffle on user_id followed by
    a per-key in-order merge — no self-join, no O(events²)."""
    _utc(spark)
    events = _t(spark, sf_dir, "events")
    win = F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    return (
        events.groupBy("user_id", win)
        .agg(
            F.count("*").alias("n_events"),
            # microsecond math: unix_timestamp() truncates each endpoint
            # to seconds, which disagrees with truncating the *difference*
            # when events carry sub-second precision
            ((F.unix_micros(F.max("ts").cast("timestamp"))
              - F.unix_micros(F.min("ts").cast("timestamp")))
             / 1_000_000).cast("long").alias("active_sec"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            "n_events", "active_sec",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_COUNTS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), isl AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS active_sec
FROM isl GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


QUERIES = {
    "kind_histogram": kind_histogram,
    "collect_sources": collect_sources,
    "first_seen": first_seen,
    "latest_pick": latest_pick,
    "anti_join_resume": anti_join_resume,
    "gate_truncate": gate_truncate,
    "sha_dedupe": sha_dedupe,
    "top1_pick": top1_pick,
    "zip_member_pick": zip_member_pick,
    "json_props_agg": json_props_agg,
    "join_enrich": join_enrich,
    "pricing_summary": pricing_summary,
    "windowed_event_counts": windowed_event_counts,
    "session_counts": session_counts,
}

ORACLES = {
    "kind_histogram": KIND_HISTOGRAM_SQL,
    "collect_sources": COLLECT_SOURCES_SQL,
    "first_seen": FIRST_SEEN_SQL,
    "latest_pick": LATEST_PICK_SQL,
    "anti_join_resume": ANTI_JOIN_RESUME_SQL,
    "gate_truncate": GATE_TRUNCATE_SQL,
    "sha_dedupe": SHA_DEDUPE_SQL,
    "top1_pick": TOP1_PICK_SQL,
    "zip_member_pick": ZIP_MEMBER_PICK_SQL,
    "json_props_agg": JSON_PROPS_AGG_SQL,
    "join_enrich": JOIN_ENRICH_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
    "windowed_event_counts": WINDOWED_EVENT_COUNTS_SQL,
    "session_counts": SESSION_COUNTS_SQL,
}



def _rev_cbp():
    """The ONE exact revenue definition (cents-basis-points:
    round(price*100) * (10000 - round(discount*10000))) shared by every
    TPC-H-flavored query — per the tok_array anti-drift convention."""
    return (F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(10000)
               - F.round(F.col("l_discount") * 10000).cast("long")))


# the SQL twin of _rev_cbp, interpolated into every oracle
REV_CBP_SQL = ("CAST(round(l_extendedprice*100) AS BIGINT) "
               "* (10000 - CAST(round(l_discount*10000) AS BIGINT))")


# -- TPC-H Q3-style shipping-priority revenue ---------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"   # mid-range of the synthetic order/ship dates
Q3_TOP = 10


def top_orders_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 re-expressed exact: top unshipped-revenue orders for one
    market segment (orders placed before the cutoff, revenue from line
    items shipped after it). Revenue is integer 'cents-basis-points'
    (round(price*100) * (10000 - round(discount*10000))) so the sum is
    associative — the float l_extendedprice*(1-l_discount) sum of the
    original is partition-order-dependent and could never hash-match.

    Scale shape: the classic selective-join pyramid Catalyst handles —
    segment filter pushes into the customer scan, the date filters push
    into orders/lineitem scans (PushedFilters), customer⋈orders shuffles
    on custkey, ⋈lineitem on orderkey, and the top-10 is a TakeOrdered,
    never a global sort of the aggregate."""
    _utc(spark)
    cut = F.lit(Q3_CUTOFF).cast("timestamp")
    cust = (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == Q3_SEGMENT)
            .select("c_custkey"))
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < cut)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    rev = _rev_cbp()
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cut)
          .select("l_orderkey", rev.alias("rev")))
    return (orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
            .join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum("rev").alias("revenue_cbp"))
            .orderBy(F.desc("revenue_cbp"), "o_orderkey")
            .limit(Q3_TOP))


TOP_ORDERS_REVENUE_SQL = f"""
WITH li AS (
  SELECT l_orderkey,
         {REV_CBP_SQL} AS rev
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
)
SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(sum(li.rev) AS BIGINT) AS revenue_cbp
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN li ON li.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cbp DESC, o.o_orderkey
LIMIT {Q3_TOP}
"""

QUERIES["top_orders_revenue"] = top_orders_revenue_query
ORACLES["top_orders_revenue"] = TOP_ORDERS_REVENUE_SQL


# -- Regional revenue rollup (TPC-H Q5-flavored) ------------------------------

def regional_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by customer region and order year — the Q5-flavored
    dimensional rollup exercising the full region->nation->customer
    snowflake (the canonical small-dim broadcast pyramid: region 5 rows,
    nation 25, customer corpus-scaled). Revenue in exact integer
    cents-basis-points (the top_orders_revenue rule).

    Scale shape: region/nation broadcast into the customer scan, the
    customer⋈orders shuffle is on custkey, lineitem⋈orders on orderkey;
    the distinct order count rides the same aggregate via expand. The
    (region, year) result is 35 rows at any corpus size."""
    _utc(spark)
    rev = _rev_cbp()
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey",
                                              rev.alias("rev"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                           F.year("o_orderdate")
                                           .cast("int").alias("order_year"))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (o.join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("r_name", "order_year")
            .agg(F.sum("rev").alias("revenue_cbp"),
                 F.countDistinct("o_orderkey").alias("n_orders"))
            .orderBy("r_name", "order_year"))


REGIONAL_REVENUE_SQL = f"""
WITH rev AS (
  SELECT l_orderkey,
         {REV_CBP_SQL} AS rev
  FROM lineitem
)
SELECT r.r_name, CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(sum(rev.rev) AS BIGINT) AS revenue_cbp,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
JOIN rev ON rev.l_orderkey = o.o_orderkey
GROUP BY r.r_name, year(o.o_orderdate)
ORDER BY r_name, order_year
"""

QUERIES["regional_revenue"] = regional_revenue_query
ORACLES["regional_revenue"] = REGIONAL_REVENUE_SQL


# -- Promo revenue share (TPC-H Q14-flavored) ----------------------------------

PROMO_TYPE = "PROMO"
PROMO_BP = 10_000


def promo_revenue_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly promo revenue share (TPC-H Q14 re-expressed exact): per
    ship month, promo vs total revenue in cents-basis-points and the
    share as an exact integer-bp division — Q14's 100*sum(CASE)/sum()
    float form can't hash-match across engines; this can.

    Scale shape: ONE lineitem⋈part equi join (partkey) feeding one
    month-keyed conditional aggregate — both the promo and total sums
    partial-combine; no second scan, no window."""
    _utc(spark)
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == PROMO_TYPE).alias("promo"))
    rev = _rev_cbp()
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", rev.alias("rev"),
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("month"))
    return (li.join(p, li["l_partkey"] == p["p_partkey"])
            .groupBy("month")
            .agg(F.sum(F.when(F.col("promo"), F.col("rev")).otherwise(0))
                 .alias("promo_cbp"),
                 F.sum("rev").alias("total_cbp"))
            .select("month", "promo_cbp", "total_cbp",
                    # promo_cbp * 10000 is the one corpus-sized-aggregate
                    # multiply in the repo: int64 wraps silently past
                    # ~9.2e14 monthly cbp (≈ sf 0.2+), so refuse loudly
                    # there instead of diverging from the oracle (which
                    # sums in HUGEINT and would error, not wrap)
                    F.when(F.col("promo_cbp") <= (2**63 - 1) // PROMO_BP,
                           F.expr(f"promo_cbp * {PROMO_BP} div total_cbp"))
                    .otherwise(F.raise_error(F.lit(
                        "promo_revenue_share: monthly promo revenue "
                        "overflows the bp multiply; switch the share to "
                        "DECIMAL arithmetic at this scale")))
                    .alias("promo_share_bp"))
            .orderBy("month"))


PROMO_REVENUE_SHARE_SQL = f"""
WITH lp AS (
  SELECT date_trunc('month', l.l_shipdate) AS month,
         {REV_CBP_SQL} AS rev,
         p.p_type = '{PROMO_TYPE}' AS promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT CAST(month AS DATE) AS month,
       CAST(sum(CASE WHEN promo THEN rev ELSE 0 END) AS BIGINT)
         AS promo_cbp,
       CAST(sum(rev) AS BIGINT) AS total_cbp,
       CAST(sum(CASE WHEN promo THEN rev ELSE 0 END) AS BIGINT)
         * {PROMO_BP} // CAST(sum(rev) AS BIGINT) AS promo_share_bp
FROM lp GROUP BY month ORDER BY month
"""

QUERIES["promo_revenue_share"] = promo_revenue_share_query
ORACLES["promo_revenue_share"] = PROMO_REVENUE_SHARE_SQL


# -- Large-volume customers (TPC-H Q18-flavored) -------------------------------

Q18_QTY = 210
Q18_TOP = 20


def large_orders_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 re-expressed exact: the top orders whose total line
    quantity clears Q18_QTY, with customer name and the order total in
    exact cents. Quantities are whole numbers in this corpus, so
    round->BIGINT sums are exact; the HAVING-over-aggregate becomes a
    filter on the pre-aggregated per-order quantity table.

    Scale shape: the qty rollup partial-aggregates per order BEFORE the
    join (the aggregate-then-join form — joining first would carry every
    line item through the customer join); the selective qty filter then
    prunes the join input, and the top-20 is a TakeOrdered."""
    _utc(spark)
    oq = (_t(spark, sf_dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(F.sum(F.round("l_quantity").cast("long"))
               .alias("total_qty"))
          .filter(F.col("total_qty") > Q18_QTY))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("totalprice_cents"))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (o.join(oq, o["o_orderkey"] == oq["l_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .select("c_name", "o_orderkey", "o_orderdate",
                    "totalprice_cents", "total_qty")
            .orderBy(F.desc("totalprice_cents"), "o_orderkey")
            .limit(Q18_TOP))


LARGE_ORDERS_SQL = f"""
WITH oq AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > {Q18_QTY}
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice*100) AS BIGINT) AS totalprice_cents,
       oq.total_qty
FROM orders o JOIN oq ON oq.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice_cents DESC, o.o_orderkey
LIMIT {Q18_TOP}
"""

QUERIES["large_orders"] = large_orders_query
ORACLES["large_orders"] = LARGE_ORDERS_SQL


# -- Late-shipment order priorities (TPC-H Q4-flavored semi join) --------------

Q4_START = "1997-07-01"
Q4_END = "1997-10-01"
Q4_LATE_DAYS = 60


def order_priority_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted to this corpus (lineitem carries no
    commit/receipt dates, so "late" = a line shipped more than
    Q4_LATE_DAYS after the order date): per order priority, how many
    orders in one quarter had at least one late line. The EXISTS
    subquery is expressed as a LEFT SEMI join — the one join type the
    registry didn't exercise yet — so each order is counted once no
    matter how many of its lines were late.

    Scale shape: the quarter filter pushes into the orders scan
    (PushedFilters), the semi join shuffles both sides on orderkey and
    emits AT MOST one row per order (never a multiplied join), and the
    mixed equi + inequality condition stays JVM-side (the date
    comparison rides the join as a post-condition, not a Python
    filter). The 5-row result aggregates with map-side combine."""
    _utc(spark)
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp")))
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"]
           > o["o_orderdate"] + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS"))
    )
    return (o.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


ORDER_PRIORITY_COUNTS_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_START}'
  AND o.o_orderdate <  TIMESTAMP '{Q4_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES["order_priority_counts"] = order_priority_counts_query
ORACLES["order_priority_counts"] = ORDER_PRIORITY_COUNTS_SQL


# -- Disjunctive brand/size/quantity pricing (TPC-H Q19-flavored) --------------

# (brand, size_lo, size_hi, qty_lo, qty_hi) — three OR'd branches, as in
# Q19's shipping-container clauses
Q19_BRANCHES = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 10, 30, 10, 35),
    ("Brand#3", 20, 50, 20, 50),
)


def disjunctive_pricing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 re-expressed exact: revenue from line items matching
    any of three OR'd brand/size/quantity branches, reported per branch
    (Q19's single scalar hides which clause fired; the per-branch rollup
    is strictly more informative and still 3 rows at any scale).

    Scale shape: a disjunction can't push down as-is, so the common
    superset IS hoisted by hand — the part scan carries
    ``p_brand IN (branch brands)`` (prunes ~22/25 of parts BEFORE the
    join; Catalyst keeps it in PushedFilters) and the partkey equi join
    runs on the pruned dim. Branch assignment is a JVM CASE on the
    joined row; first matching branch wins (branches here are
    brand-disjoint anyway). Revenue in exact cents-basis-points."""
    _utc(spark)
    brands = [b for b, *_ in Q19_BRANCHES]
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_brand").isin(brands))
         .select("p_partkey", "p_brand", "p_size"))
    rev = _rev_cbp()
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.round("l_quantity").cast("long").alias("qty"),
        rev.alias("rev"))
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    branch = F.lit(None).cast("int")
    for i, (b, slo, shi, qlo, qhi) in reversed(
            list(enumerate(Q19_BRANCHES, start=1))):
        branch = F.when(
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("qty").between(qlo, qhi),
            F.lit(i)).otherwise(branch)
    return (joined.withColumn("branch", branch)
            .filter(F.col("branch").isNotNull())
            .groupBy("branch")
            .agg(F.sum("rev").alias("revenue_cbp"),
                 F.count("*").alias("n_lines"))
            .orderBy("branch"))


def _q19_case_sql() -> str:
    whens = "\n    ".join(
        f"WHEN p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND qty BETWEEN {qlo} AND {qhi} THEN {i}"
        for i, (b, slo, shi, qlo, qhi) in enumerate(Q19_BRANCHES, start=1))
    return f"CASE\n    {whens}\n    END"


DISJUNCTIVE_PRICING_SQL = f"""
WITH lp AS (
  SELECT p.p_brand, p.p_size,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         {REV_CBP_SQL} AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand IN ({", ".join(f"'{b}'" for b, *_ in Q19_BRANCHES)})
)
SELECT branch, CAST(sum(rev) AS BIGINT) AS revenue_cbp,
       count(*) AS n_lines
FROM (SELECT {_q19_case_sql()} AS branch, rev FROM lp)
WHERE branch IS NOT NULL
GROUP BY branch ORDER BY branch
"""

QUERIES["disjunctive_pricing"] = disjunctive_pricing_query
ORACLES["disjunctive_pricing"] = DISJUNCTIVE_PRICING_SQL


# -- Salted skew join (hot-key fact ⋈ dim with explicit salt) ------------------

SALT_BUCKETS = 16
# per-returnflag handling fee in basis points — the 3-row dim
SALT_DIM = (("A", 25), ("N", 5), ("R", 40))


def salted_skew_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual skew-salting pattern with a correctness proof: the
    fact side (every line item) joins a per-returnflag dim on a key with
    THREE distinct values — the worst-case hot-key shape, where a plain
    shuffle join puts a third of the corpus in one task. The fact side
    salts the key with ``l_orderkey % SALT_BUCKETS`` and the dim side
    explodes each row into all SALT_BUCKETS salts, so the shuffle
    spreads each hot key over SALT_BUCKETS tasks; the join result is
    salt-invariant, which the plain-join oracle proves.

    At THIS dim size you'd broadcast and be done — the pattern is for
    the regime where the dim is too big to broadcast but the fact key is
    Zipfian (per-host metadata against a crawl corpus); the salt column
    and exploded dim are exactly what you'd ship there, and the plan
    keeps the salt in the join key (pinned in test_plan_shapes)."""
    _utc(spark)
    rev = _rev_cbp()
    fact = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", rev.alias("rev"),
        (F.col("l_orderkey") % SALT_BUCKETS).alias("salt"))
    dim = spark.createDataFrame(
        list(SALT_DIM), ["flag", "fee_bp"]).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    return (fact.join(dim, (fact["l_returnflag"] == dim["flag"])
                      & (fact["salt"] == dim["salt"]))
            .groupBy("flag", "fee_bp")
            .agg(F.sum("rev").alias("revenue_cbp"),
                 F.count("*").alias("n_lines"))
            .orderBy("flag"))


SALTED_SKEW_JOIN_SQL = f"""
WITH dim(flag, fee_bp) AS (VALUES {", ".join(f"('{f}', {bp})"
                                             for f, bp in SALT_DIM)})
SELECT dim.flag, CAST(dim.fee_bp AS BIGINT) AS fee_bp,
       CAST(sum({REV_CBP_SQL}) AS BIGINT) AS revenue_cbp,
       count(*) AS n_lines
FROM lineitem l JOIN dim ON dim.flag = l.l_returnflag
GROUP BY dim.flag, dim.fee_bp
ORDER BY dim.flag
"""

QUERIES["salted_skew_join"] = salted_skew_join_query
ORACLES["salted_skew_join"] = SALTED_SKEW_JOIN_SQL


# -- RFM customer segmentation (integer-tercile scoring) -----------------------

RFM_BUCKETS = 3


def _rfm_bucket(rank_col, n_col):
    """Exact integer tercile: floor((rank-1)*B/n) + 1 — engine-invariant
    by construction (ntile's remainder spread is also deterministic, but
    this form is pure integer arithmetic both sides)."""
    return ((rank_col - 1) * RFM_BUCKETS / n_col).cast("long") + 1


def rfm_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days from last
    order to the corpus max date), frequency (order count) and monetary
    (exact cents) each score 1-3 by integer tercile rank, and the
    output is the 27-cell segment rollup (count + total monetary).
    Every step is integer-exact — datediff days, row_number ranks with
    full custkey tiebreaks, tercile = floor((r-1)*3/n)+1 — so the
    rollup hash-matches at any scale.

    Scale shape: one orders scan → custkey-keyed aggregate; the three
    rank windows run over the CUSTOMER-cardinality aggregate (not the
    order rows), partitioned ONCE (no per-window reshuffle: all three
    windows share the single-partition frame only at the rank step,
    which at 10^9 customers would switch to the range-rank form used by
    length_quantiles); final rollup is ≤27 rows."""
    _utc(spark)
    o = _t(spark, sf_dir, "orders")
    corpus_max = o.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count("*").alias("n_orders"),
                     F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                     .alias("cents")))
    per_cust = per_cust.crossJoin(F.broadcast(corpus_max)).withColumn(
        "recency_days", F.datediff("mx", "last_order").cast("long"))
    wr = Window.orderBy("recency_days", "o_custkey")
    wf = Window.orderBy(F.desc("n_orders"), "o_custkey")
    wm = Window.orderBy(F.desc("cents"), "o_custkey")
    n = Window.partitionBy()
    scored = (per_cust
              .withColumn("nn", F.count("*").over(n))
              .withColumn("r_score",
                          _rfm_bucket(F.row_number().over(wr), F.col("nn")))
              .withColumn("f_score",
                          _rfm_bucket(F.row_number().over(wf), F.col("nn")))
              .withColumn("m_score",
                          _rfm_bucket(F.row_number().over(wm), F.col("nn"))))
    return (scored
            .groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").alias("n_customers"),
                 F.sum("cents").alias("total_cents"))
            .orderBy("r_score", "f_score", "m_score"))


RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', max(o_orderdate),
                  (SELECT max(o_orderdate) FROM orders)) AS recency_days,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT *,
         count(*) OVER () AS nn,
         row_number() OVER (ORDER BY recency_days, o_custkey) AS rr,
         row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS rf,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rm
  FROM per_cust
)
SELECT (rr-1)*{RFM_BUCKETS}//nn + 1 AS r_score,
       (rf-1)*{RFM_BUCKETS}//nn + 1 AS f_score,
       (rm-1)*{RFM_BUCKETS}//nn + 1 AS m_score,
       count(*) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["rfm_segments"] = rfm_segments_query
ORACLES["rfm_segments"] = RFM_SEGMENTS_SQL


# -- Customer order-count distribution (TPC-H Q13-flavored) --------------------

Q13_PRIORITY = "1-URGENT"
Q13_SINCE = "1999-01-01"


def cust_order_distribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 re-expressed: distribution of per-customer counts of
    qualifying orders (urgent orders placed since the cutoff), INCLUDING
    the zero-order customers — the left-outer-join-preserves-zeros shape
    the inner-join form silently drops (710 of 1500 customers land in
    the zero bucket at sf0.01, so a dropped bucket cannot hash-match).

    Scale shape: orders are aggregated to per-customer counts FIRST
    (one custkey shuffle over the filtered fact, with the priority and
    date predicates pushed into the scan), and only the slim
    (custkey, n) aggregate joins customer — never customer attributes
    through the fact join. The second aggregate runs over
    customer-cardinality rows and the result is O(max orders/customer)
    rows at any scale."""
    _utc(spark)
    oc = (_t(spark, sf_dir, "orders")
          .filter((F.col("o_orderpriority") == Q13_PRIORITY)
                  & (F.col("o_orderdate")
                     >= F.lit(Q13_SINCE).cast("timestamp")))
          .groupBy("o_custkey")
          .agg(F.count("*").alias("n")))
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    return (cust.join(oc, cust["c_custkey"] == oc["o_custkey"], "left")
            .select(F.coalesce(F.col("n"), F.lit(0)).alias("order_count"))
            .groupBy("order_count")
            .agg(F.count("*").alias("n_customers"))
            .orderBy(F.desc("n_customers"), F.desc("order_count")))


CUST_ORDER_DISTRIBUTION_SQL = f"""
WITH oc AS (
  SELECT o_custkey, count(*) AS n FROM orders
  WHERE o_orderpriority = '{Q13_PRIORITY}'
    AND o_orderdate >= TIMESTAMP '{Q13_SINCE}'
  GROUP BY o_custkey
)
SELECT coalesce(oc.n, 0) AS order_count,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
GROUP BY coalesce(oc.n, 0)
ORDER BY n_customers DESC, order_count DESC
"""

QUERIES["cust_order_distribution"] = cust_order_distribution_query
ORACLES["cust_order_distribution"] = CUST_ORDER_DISTRIBUTION_SQL


# -- Returned-item top customers (TPC-H Q10-flavored) --------------------------

Q10_QSTART = "1997-01-01"
Q10_QEND = "1997-04-01"
Q10_TOP = 20


def returned_top_customers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 re-expressed exact: top customers by revenue lost to
    returned line items ('R' flag) on orders placed in one quarter.
    Revenue is the shared cents-basis-points integer; acctbal renders
    as exact cents so no float reaches the hash.

    Scale shape: both selective predicates (quarter window on orders,
    return flag on lineitem) push into their scans; the fact⋈fact join
    shuffles on orderkey carrying only (orderkey, rev); customer joins
    the already-small per-order slice on custkey; nation (25 rows)
    broadcasts; the top-20 is a TakeOrdered over the per-customer
    aggregate, never a global sort."""
    _utc(spark)
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", _rev_cbp().alias("rev")))
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(Q10_QSTART).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(Q10_QEND).cast("timestamp")))
         .select("o_orderkey", "o_custkey"))
    c = (_t(spark, sf_dir, "customer")
         .select("c_custkey", "c_name", "c_nationkey",
                 F.round(F.col("c_acctbal") * 100).cast("long")
                 .alias("acctbal_cents")))
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("c_custkey", "c_name", "n_name", "acctbal_cents")
            .agg(F.sum("rev").alias("revenue_cbp"))
            .orderBy(F.desc("revenue_cbp"), "c_custkey")
            .limit(Q10_TOP))


RETURNED_TOP_CUSTOMERS_SQL = f"""
WITH li AS (
  SELECT l_orderkey, {REV_CBP_SQL} AS rev
  FROM lineitem WHERE l_returnflag = 'R'
)
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(round(c.c_acctbal*100) AS BIGINT) AS acctbal_cents,
       CAST(sum(li.rev) AS BIGINT) AS revenue_cbp
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN li ON li.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '{Q10_QSTART}'
  AND o.o_orderdate < TIMESTAMP '{Q10_QEND}'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_cbp DESC, c.c_custkey
LIMIT {Q10_TOP}
"""

QUERIES["returned_top_customers"] = returned_top_customers_query
ORACLES["returned_top_customers"] = RETURNED_TOP_CUSTOMERS_SQL


# -- Cross-nation trade volume (TPC-H Q7-flavored) -----------------------------

Q7_START = "1997-01-01"
Q7_END = "1999-01-01"


def nation_trade_volume_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 re-expressed: shipped revenue between every DISTINCT
    (supplier nation, customer nation) pair by ship year, over a
    two-year window. Exercises the one dimension table playing two
    roles (nation joins the flow twice under different keys) — the
    aliasing trap Catalyst handles only if the two legs are genuinely
    distinct plans.

    Scale shape: the ship-date window pushes into the lineitem scan;
    supplier⋈lineitem on suppkey (supplier is the small side — AQE
    broadcasts it at test scale, at 10^8 suppliers it degrades to a
    shuffle join on an already date-pruned fact); orders⋈lineitem on
    orderkey; customer on custkey; both nation legs broadcast (25
    rows). Output is bounded by nations² × years regardless of corpus
    size."""
    _utc(spark)
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(Q7_START).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q7_END).cast("timestamp")))
          .select("l_orderkey", "l_suppkey", _rev_cbp().alias("rev"),
                  F.year("l_shipdate").cast("int").alias("ship_year")))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ns = (_t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("ns_key"),
                  F.col("n_name").alias("supp_nation")))
    nc = (_t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("nc_key"),
                  F.col("n_name").alias("cust_nation")))
    return (li.join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
            .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
            .filter(F.col("ns_key") != F.col("nc_key"))
            .groupBy("supp_nation", "cust_nation", "ship_year")
            .agg(F.sum("rev").alias("volume_cbp"),
                 F.count("*").alias("n_lines"))
            .orderBy("supp_nation", "cust_nation", "ship_year"))


NATION_TRADE_VOLUME_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey, {REV_CBP_SQL} AS rev,
         CAST(year(l_shipdate) AS INT) AS ship_year
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q7_START}'
    AND l_shipdate < TIMESTAMP '{Q7_END}'
)
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, li.ship_year,
       CAST(sum(li.rev) AS BIGINT) AS volume_cbp,
       CAST(count(*) AS BIGINT) AS n_lines
FROM li
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN orders o ON o.o_orderkey = li.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_nationkey <> nc.n_nationkey
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, ship_year
"""

QUERIES["nation_trade_volume"] = nation_trade_volume_query
ORACLES["nation_trade_volume"] = NATION_TRADE_VOLUME_SQL


# -- Small-quantity revenue (TPC-H Q17-flavored) --------------------------------

Q17_BRAND = "Brand#1"
Q17_MAX_SIZE = 15


def small_qty_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 re-expressed exact and single-scan: revenue from line
    items whose quantity is under 0.4x the part's average quantity, for
    one brand. The correlated avg(l_quantity) subquery becomes a window
    over partkey, and the float threshold becomes the integer
    cross-multiplication 5*qty*n < 2*sum(qty) (quantities are
    integer-valued), so the filter is engine-exact.

    Scale shape: the brand/size predicate reduces part to a tiny set
    that BROADCASTS into the lineitem scan (a semi-join shape — only
    qualifying parts' lines survive); the per-part count/sum then run
    as ONE window over the already-reduced slice, never a second
    lineitem scan like the textbook self-join form; the final aggregate
    is a single row."""
    _utc(spark)
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") == Q17_BRAND)
                 & (F.col("p_size") <= Q17_MAX_SIZE))
         .select("p_partkey", "p_brand"))
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  F.round("l_quantity").cast("long").alias("qty"),
                  F.round(F.col("l_extendedprice") * 100).cast("long")
                  .alias("price_cents")))
    w = Window.partitionBy("l_partkey")
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .withColumn("n", F.count("*").over(w))
            .withColumn("sq", F.sum("qty").over(w))
            .filter(F.lit(5) * F.col("qty") * F.col("n")
                    < F.lit(2) * F.col("sq"))
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_small_lines"),
                 F.sum("price_cents").alias("revenue_cents")))


SMALL_QTY_REVENUE_SQL = f"""
WITH pl AS (
  SELECT l.l_partkey, p.p_brand,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice*100) AS BIGINT) AS price_cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = '{Q17_BRAND}' AND p.p_size <= {Q17_MAX_SIZE}
), st AS (
  SELECT *, count(*) OVER (PARTITION BY l_partkey) AS n,
         sum(qty) OVER (PARTITION BY l_partkey) AS sq
  FROM pl
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small_lines,
       CAST(sum(price_cents) AS BIGINT) AS revenue_cents
FROM st WHERE 5 * qty * n < 2 * sq
GROUP BY p_brand
"""

QUERIES["small_qty_revenue"] = small_qty_revenue_query
ORACLES["small_qty_revenue"] = SMALL_QTY_REVENUE_SQL


# -- Only-late supplier on multi-supplier orders (TPC-H Q21-flavored) ----------

Q21_LATE_DAYS = 150
Q21_TOP = 25


def late_only_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 re-expressed without self-joins: suppliers who were the
    ONLY late supplier (shipped >150 days after the order date) on an
    order involving at least two suppliers. The textbook EXISTS /
    NOT-EXISTS pair of lineitem self-joins becomes one per-(order,
    supplier) aggregate plus two windows over the order — the oracle
    keeps the EXISTS form, so driver equality re-proves the rewrite.

    Scale shape: lineitem⋈orders shuffles on orderkey carrying only
    (orderkey, suppkey, late-flag); the per-(order,supplier) groupBy
    and both windows share that same orderkey clustering (one
    exchange); supplier names broadcast; the top-25 is a TakeOrdered
    over the per-supplier aggregate."""
    _utc(spark)
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    osl = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .groupBy("l_orderkey", "l_suppkey")
           .agg(F.max(
               (F.col("l_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY"))
               .cast("int")).alias("late")))
    w = Window.partitionBy("l_orderkey")
    flagged = (osl
               .withColumn("n_supp", F.count("*").over(w))
               .withColumn("n_late", F.sum("late").over(w)))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (flagged
            .filter((F.col("late") == 1) & (F.col("n_supp") > 1)
                    & (F.col("n_late") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(Q21_TOP))


LATE_ONLY_SUPPLIER_SQL = f"""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late t JOIN supplier s ON s.s_suppkey = t.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = t.l_orderkey
              AND l2.l_suppkey <> t.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late t2 WHERE t2.l_orderkey = t.l_orderkey
                  AND t2.l_suppkey <> t.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOP}
"""

QUERIES["late_only_supplier"] = late_only_supplier_query
ORACLES["late_only_supplier"] = LATE_ONLY_SUPPLIER_SQL


# -- Dormant above-average customers (TPC-H Q22-flavored) ----------------------

Q22_CODES = (0, 2)
Q22_MOD = 5
Q22_DORMANT_SINCE = "2001-01-01"


def dormant_rich_customers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 re-expressed exact: customers in a nation-code subset
    whose balance beats the subset's positive-balance average and who
    placed NO order since the cutoff, rolled up per code. The scalar
    avg subquery becomes the integer cross-multiplication
    bal*n_pos > sum_pos (exact cents — no float average exists
    anywhere), and the NOT EXISTS becomes a left-anti join against the
    date-filtered orders.

    Scale shape: the code predicate pushes into the customer scan; the
    single-row positive-balance stats broadcast via crossJoin; the
    anti-join's right side is only the orders AFTER the cutoff (the
    date filter lands in the scan) keyed on custkey; output is one row
    per code."""
    _utc(spark)
    eligible = (_t(spark, sf_dir, "customer")
                .filter((F.col("c_nationkey") % Q22_MOD)
                        .isin(list(Q22_CODES))
                        & (F.col("c_acctbal") > 0))
                .select("c_custkey",
                        (F.col("c_nationkey") % Q22_MOD).alias("cntrycode"),
                        F.round(F.col("c_acctbal") * 100).cast("long")
                        .alias("bal_cents")))
    stats = eligible.agg(F.count("*").alias("n_pos"),
                         F.sum("bal_cents").alias("sum_pos"))
    recent = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate")
                      >= F.lit(Q22_DORMANT_SINCE).cast("timestamp"))
              .select("o_custkey"))
    return (eligible.crossJoin(F.broadcast(stats))
            .filter(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos"))
            .join(recent, eligible["c_custkey"] == recent["o_custkey"],
                  "left_anti")
            .groupBy("cntrycode")
            .agg(F.count("*").alias("n_customers"),
                 F.sum("bal_cents").alias("total_cents"))
            .orderBy("cntrycode"))


DORMANT_RICH_CUSTOMERS_SQL = f"""
WITH eligible AS (
  SELECT c_custkey, c_nationkey % {Q22_MOD} AS cntrycode,
         CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
  FROM customer
  WHERE c_nationkey % {Q22_MOD} IN {Q22_CODES} AND c_acctbal > 0
), stats AS (
  SELECT count(*) AS n_pos, sum(bal_cents) AS sum_pos FROM eligible
)
SELECT e.cntrycode, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(e.bal_cents) AS BIGINT) AS total_cents
FROM eligible e, stats
WHERE e.bal_cents * stats.n_pos > stats.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{Q22_DORMANT_SINCE}')
GROUP BY e.cntrycode ORDER BY e.cntrycode
"""

QUERIES["dormant_rich_customers"] = dormant_rich_customers_query
ORACLES["dormant_rich_customers"] = DORMANT_RICH_CUSTOMERS_SQL


# -- Data-quality constraint suite (Deequ-style validation) --------------------

DQ_MAX_QTY = 40


def _dq_struct(tbl: str, check: str, violations, checked):
    return F.struct(
        F.lit(tbl).alias("tbl"), F.lit(check).alias("check_name"),
        violations.cast("long").alias("violations"),
        checked.cast("long").alias("checked"))


def data_quality_checks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality suite: uniqueness,
    completeness, range, accepted-values and referential-integrity
    constraints over three tables, emitted as one (table, check,
    violations, checked, passed) report. The quantity<=40 check FAILS
    by design so the report always exercises both verdicts.

    Scale shape: every lineitem check INCLUDING the referential one
    rides ONE fact scan — the fact left-joins the slim distinct orders
    key column and a single aggregate computes all four violation
    counts (orphan = null probe side), instead of the textbook
    one-anti-join-per-constraint which re-scans the fact per check.
    Orders and events each take one aggregate scan (conditional sums +
    the distinct-count riding the same aggregate). The report is a
    constant ~8 rows at any corpus size."""
    _utc(spark)
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")

    def vio(cond):
        # coalesce: sum over ZERO rows is NULL, but the oracle's
        # count(*) FILTER is 0 — an empty table must read "0 violations,
        # passed", not NULL (a data-quality suite meets empty tables)
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0))

    o_row = o.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        vio(F.col("o_custkey").isNull()).alias("null_cust"),
        vio(F.col("o_totalprice") <= 0).alias("nonpos_price"))
    o_checks = o_row.select(F.explode(F.array(
        _dq_struct("orders", "o_custkey_complete",
                   F.col("null_cust"), F.col("n")),
        _dq_struct("orders", "o_orderkey_unique",
                   F.col("dup_keys"), F.col("n")),
        _dq_struct("orders", "o_totalprice_positive",
                   F.col("nonpos_price"), F.col("n")),
    )).alias("c"))

    o_keys = o.select(F.col("o_orderkey").alias("ref_key")).distinct()
    li_row = (li.join(o_keys, li["l_orderkey"] == o_keys["ref_key"], "left")
              .agg(
        F.count("*").alias("n"),
        vio((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
        .alias("disc_out"),
        vio(F.col("l_quantity") > DQ_MAX_QTY).alias("qty_over"),
        vio(~F.col("l_returnflag").isin("A", "N", "R")).alias("bad_flag"),
        vio(F.col("ref_key").isNull()).alias("orphans")))
    li_checks = li_row.select(F.explode(F.array(
        _dq_struct("lineitem", "l_discount_in_0_1",
                   F.col("disc_out"), F.col("n")),
        _dq_struct("lineitem", "l_orderkey_references_orders",
                   F.col("orphans"), F.col("n")),
        _dq_struct("lineitem", f"l_quantity_le_{DQ_MAX_QTY}",
                   F.col("qty_over"), F.col("n")),
        _dq_struct("lineitem", "l_returnflag_accepted",
                   F.col("bad_flag"), F.col("n")),
    )).alias("c"))

    ev_checks = ev.agg(
        F.count("*").alias("n"),
        vio(F.col("ts").isNull()).alias("null_ts")).select(
        F.explode(F.array(
            _dq_struct("events", "ts_complete",
                       F.col("null_ts"), F.col("n")),
        )).alias("c"))

    return (o_checks.unionByName(li_checks).unionByName(ev_checks)
            .select("c.tbl", "c.check_name", "c.violations", "c.checked",
                    (F.col("c.violations") == 0).alias("passed"))
            .orderBy("tbl", "check_name"))


DATA_QUALITY_CHECKS_SQL = f"""
WITH checks AS (
  SELECT 'orders' AS tbl, 'o_custkey_complete' AS check_name,
         CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS violations,
         CAST(count(*) AS BIGINT) AS checked FROM orders
  UNION ALL
  SELECT 'orders', 'o_orderkey_unique',
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'orders', 'o_totalprice_positive',
         CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'lineitem', 'l_discount_in_0_1',
         CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'l_quantity_le_{DQ_MAX_QTY}',
         CAST(count(*) FILTER (l_quantity > {DQ_MAX_QTY}) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'l_returnflag_accepted',
         CAST(count(*) FILTER (l_returnflag NOT IN ('A','N','R')) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'l_orderkey_references_orders',
         CAST(count(*) FILTER (NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS BIGINT),
         CAST(count(*) AS BIGINT) FROM lineitem l
  UNION ALL
  SELECT 'events', 'ts_complete',
         CAST(count(*) FILTER (ts IS NULL) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM events
)
SELECT tbl, check_name, violations, checked,
       violations = 0 AS passed
FROM checks ORDER BY tbl, check_name
"""

QUERIES["data_quality_checks"] = data_quality_checks_query
ORACLES["data_quality_checks"] = DATA_QUALITY_CHECKS_SQL


# -- Market share (TPC-H Q8-flavored) -------------------------------------------

# NATION_8 has suppliers at every test SF (NATION_0 has none at
# sf0.001, which would make the conditional numerator vacuously 0=0)
Q8_NATION = "NATION_8"
Q8_REGION = "ASIA"


def market_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 re-expressed exact: one supplier nation's share of the
    revenue on orders from customers in one region, by order year. Both
    numerator (conditional) and denominator sum in exact integer
    cents-basis-points; the share is the ONE float op — a single
    correctly-rounded division of two exact BIGINTs — so round(6) is
    engine-invariant (no float accumulation order exists).

    Scale shape: the region predicate prunes through the broadcast
    region→nation→customer dimension chain before the custkey shuffle;
    lineitem⋈orders on orderkey; the supplier-nation tag rides a
    broadcast nation leg; numerator and denominator share ONE aggregate
    (a conditional sum, never two plans over the fact)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_cbp().alias("rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = (_t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("ns_key"),
                  F.col("n_name").alias("supp_nation")))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.year("o_orderdate").cast("int").alias("order_year"))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = (_t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("nc_key"),
                  F.col("n_regionkey").alias("nc_region")))
    r = (_t(spark, sf_dir, "region")
         .filter(F.col("r_name") == Q8_REGION).select("r_regionkey"))
    nation_rev = F.sum(F.when(F.col("supp_nation") == Q8_NATION,
                              F.col("rev")).otherwise(F.lit(0)))
    # prune customers through the broadcast dims FIRST: ~4/5 of
    # customers drop before the custkey shuffle ever sees the fact
    c_in_region = (c
                   .join(F.broadcast(nc),
                         c["c_nationkey"] == nc["nc_key"])
                   .join(F.broadcast(r),
                         F.col("nc_region") == r["r_regionkey"])
                   .select("c_custkey"))
    return (li.join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c_in_region, o["o_custkey"] == F.col("c_custkey"))
            .groupBy("order_year")
            .agg(nation_rev.alias("nation_cbp"),
                 F.sum("rev").alias("total_cbp"))
            .select("order_year", "nation_cbp", "total_cbp",
                    F.round(F.col("nation_cbp").cast("double")
                            / F.col("total_cbp").cast("double"), 6)
                    .alias("share"))
            .orderBy("order_year"))


MARKET_SHARE_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey, {REV_CBP_SQL} AS rev
  FROM lineitem
)
SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(sum(CASE WHEN ns.n_name = '{Q8_NATION}' THEN li.rev
                     ELSE 0 END) AS BIGINT) AS nation_cbp,
       CAST(sum(li.rev) AS BIGINT) AS total_cbp,
       round(CAST(sum(CASE WHEN ns.n_name = '{Q8_NATION}' THEN li.rev
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(li.rev) AS DOUBLE), 6) AS share
FROM li
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = li.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = nc.n_regionkey
WHERE r.r_name = '{Q8_REGION}'
GROUP BY 1 ORDER BY 1
"""

QUERIES["market_share"] = market_share_query
ORACLES["market_share"] = MARKET_SHARE_SQL


# -- TPC-H completion block (Q6 / Q15 / Q9 / Q2 / Q11 / Q16 adapted) ----------
#
# The testdata has no partsupp table and lineitem carries no
# shipmode/commitdate, so the four queries that need them are adapted to
# equivalent plan shapes over lineitem (the adaptation is stated per
# query); money stays in the shared exact cents-basis-points unit
# (_rev_cbp) so every aggregate is associative and hash-checkable.

Q6_YEAR_LO = "1996-01-01"
Q6_YEAR_HI = "1997-01-01"
Q6_DISC_LO_BP = 300   # discount window in exact basis points
Q6_DISC_HI_BP = 700
Q6_MAX_QTY = 24


def revenue_delta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 re-expressed exact: forecast revenue change from
    dropping mid-range discounts in one ship year — a pure
    filter-and-sum whose whole point is pushdown (all three predicates
    land in the lineitem FileScan as PushedFilters; no join, one
    map-side-combinable aggregate, ReadSchema is 4 columns). Revenue
    delta = sum(price_cents * discount_bp), exact BIGINT."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    disc_bp = F.round(F.col("l_discount") * 10000).cast("long")
    delta = (F.round(F.col("l_extendedprice") * 100).cast("long")
             * disc_bp)
    return (li.filter(
                (F.col("l_shipdate") >= F.lit(Q6_YEAR_LO).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(Q6_YEAR_HI).cast("timestamp"))
                & (F.col("l_quantity") < Q6_MAX_QTY))
            .filter(disc_bp.between(Q6_DISC_LO_BP, Q6_DISC_HI_BP))
            .agg(F.sum(delta).alias("revenue_delta_cbp"),
                 F.count("*").alias("n_items")))


REVENUE_DELTA_SQL = f"""
SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * CAST(round(l_discount*10000) AS BIGINT)) AS BIGINT)
         AS revenue_delta_cbp,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR_HI}'
  AND l_quantity < {Q6_MAX_QTY}
  AND CAST(round(l_discount*10000) AS BIGINT)
        BETWEEN {Q6_DISC_LO_BP} AND {Q6_DISC_HI_BP}
"""

QUERIES["revenue_delta"] = revenue_delta_query
ORACLES["revenue_delta"] = REVENUE_DELTA_SQL


Q15_QTR_LO = "1996-01-01"
Q15_QTR_HI = "1996-04-01"


def top_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 re-expressed exact: the supplier(s) with maximum
    revenue over one ship quarter — ALL ties at the max are returned
    (the view+subquery original's semantics), via a whole-frame max
    window over the per-supplier aggregate. That single-partition window
    runs over SUPPLIER-cardinality rows (a dimension, not the corpus),
    so it is not a scale hazard; the corpus-side work is one pushed-down
    scan and one partial aggregate on suppkey."""
    _utc(spark)
    rev = _rev_cbp()
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit(Q15_QTR_LO).cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit(Q15_QTR_HI).cast("timestamp")))
          .select("l_suppkey", rev.alias("rev")))
    per = li.groupBy("l_suppkey").agg(F.sum("rev").alias("total_rev_cbp"))
    mx = per.withColumn(
        "mx", F.max("total_rev_cbp").over(
            Window.partitionBy(F.lit(1))))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (mx.filter(F.col("total_rev_cbp") == F.col("mx"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_rev_cbp")
            .orderBy("s_suppkey"))


TOP_SUPPLIER_SQL = f"""
WITH per AS (
  SELECT l_suppkey, CAST(sum({REV_CBP_SQL}) AS BIGINT) AS total_rev_cbp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_QTR_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_QTR_HI}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, per.total_rev_cbp
FROM per JOIN supplier s ON s.s_suppkey = per.l_suppkey
WHERE per.total_rev_cbp = (SELECT max(total_rev_cbp) FROM per)
ORDER BY s.s_suppkey
"""

QUERIES["top_supplier"] = top_supplier_query
ORACLES["top_supplier"] = TOP_SUPPLIER_SQL


Q9_PTYPE = "STANDARD"
Q9_COST_BP = 5500  # supply cost proxy: 55% of retail, in basis points


def product_profit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp in this corpus): profit per
    supplier nation per order year for one product type, where supply
    cost is a deterministic proxy — Q9_COST_BP basis points of the
    part's retail price per unit — so profit stays an exact BIGINT:
    profit_cbp = rev_cbp − retail_cents · qty · Q9_COST_BP.

    Scale shape: the p_type filter pushes into the part scan and that
    slim dimension side broadcasts; supplier/nation broadcast likewise;
    the only corpus-sized shuffle is the final (nation, year)
    aggregate, which partial-aggregates map-side."""
    _utc(spark)
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_type") == Q9_PTYPE)
            .select("p_partkey",
                    F.round(F.col("p_retailprice") * 100).cast("long")
                    .alias("retail_cents")))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        _rev_cbp().alias("rev"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"))
    profit = (F.col("rev")
              - F.col("retail_cents") * F.col("qty") * Q9_COST_BP)
    return (li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
            .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
            .join(F.broadcast(nat),
                  sup["s_nationkey"] == nat["n_nationkey"])
            .join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("n_name", "o_year")
            .agg(F.sum(profit).alias("profit_cbp"))
            .orderBy("n_name", F.desc("o_year")))


PRODUCT_PROFIT_SQL = f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum({REV_CBP_SQL}
                - CAST(round(p.p_retailprice*100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT) * {Q9_COST_BP})
            AS BIGINT) AS profit_cbp
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = '{Q9_PTYPE}'
GROUP BY n.n_name, o_year
ORDER BY n.n_name, o_year DESC
"""

QUERIES["product_profit"] = product_profit_query
ORACLES["product_profit"] = PRODUCT_PROFIT_SQL


Q2_PTYPE = "LARGE"


def min_cost_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp): for every part of one type, the
    supplier observed offering the minimum unit price in lineitem —
    unit price = price_cents / quantity as IEEE double (division of
    identical operands is correctly rounded in both engines, so the
    sort key is engine-invariant; ties break on suppkey). The original's
    correlated min-subquery becomes one (part, supp) pre-aggregate plus
    a per-part row_number — the standard Catalyst argmin shape, no
    correlated re-scan.

    Scale: lineitem aggregates on (partkey, suppkey) — partial agg +
    one shuffle; the argmin window partitions by partkey (part
    cardinality ≪ corpus); part/supplier/nation dims broadcast."""
    _utc(spark)
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_type") == Q2_PTYPE)
            .select("p_partkey", "p_brand"))
    unit = (F.round(F.col("l_extendedprice") * 100).cast("long")
            .cast("double") / F.col("l_quantity"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", unit.alias("unit_cents"))
    per = (li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
           .groupBy("p_partkey", "p_brand", "l_suppkey")
           .agg(F.min("unit_cents").alias("min_unit")))
    w = Window.partitionBy("p_partkey").orderBy("min_unit", "l_suppkey")
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (per.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
            .join(F.broadcast(nat),
                  sup["s_nationkey"] == nat["n_nationkey"])
            .select("p_partkey", "p_brand", "s_name", "n_name",
                    F.round("min_unit", 4).alias("best_unit_cents"))
            .orderBy("p_partkey"))


MIN_COST_SUPPLIER_SQL = f"""
WITH per AS (
  SELECT p.p_partkey, p.p_brand, l.l_suppkey,
         min(CAST(round(l.l_extendedprice*100) AS BIGINT) / l.l_quantity)
           AS min_unit
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = '{Q2_PTYPE}'
  GROUP BY 1, 2, 3
), pick AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY min_unit, l_suppkey) AS rn
  FROM per
)
SELECT k.p_partkey, k.p_brand, s.s_name, n.n_name,
       round(k.min_unit, 4) AS best_unit_cents
FROM pick k
JOIN supplier s ON s.s_suppkey = k.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE k.rn = 1
ORDER BY k.p_partkey
"""

QUERIES["min_cost_supplier"] = min_cost_supplier_query
ORACLES["min_cost_supplier"] = MIN_COST_SUPPLIER_SQL


Q11_MEAN_NUM, Q11_MEAN_DEN = 10, 11  # keep parts with value > (10/11)x the
                                     # per-part mean — scale-invariant split


def important_parts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp): parts whose total lineitem
    revenue exceeds (Q11_MEAN_NUM/Q11_MEAN_DEN)x the per-part MEAN
    revenue. Q11 itself scales its fraction with 1/SF precisely so the
    gate stays non-degenerate as the catalog grows; comparing against
    the mean bakes that in (a fixed fraction of CORPUS revenue selects
    0 rows once the catalog is 10x bigger — the r4 weak-oracle lesson,
    re-learned at sf0.1 this round). The split is ~1300/2000 at sf0.01
    and stays a real subset at every sf. The one-row (total, n_parts)
    scalar joins back by broadcast-nested-loop (never a driver
    collect); the comparison is exact integer cross-multiplication
    (value · n · DEN > total · NUM) carried in decimal(38,0) so the
    triple product can't overflow BIGINT at large catalogs (HUGEINT on
    the DuckDB side)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", _rev_cbp().alias("rev"))
    per = li.groupBy("l_partkey").agg(F.sum("rev").alias("value_cbp"))
    total = per.agg(F.sum("value_cbp").alias("total_cbp"),
                    F.count("*").alias("n_parts"))
    lhs = (F.col("value_cbp").cast("decimal(38,0)")
           * F.col("n_parts") * Q11_MEAN_DEN)
    rhs = F.col("total_cbp").cast("decimal(38,0)") * Q11_MEAN_NUM
    return (per.crossJoin(F.broadcast(total))
            .filter(lhs > rhs)
            .select("l_partkey", "value_cbp")
            .orderBy(F.desc("value_cbp"), "l_partkey"))


IMPORTANT_PARTS_SQL = f"""
WITH per AS (
  SELECT l_partkey, CAST(sum({REV_CBP_SQL}) AS BIGINT) AS value_cbp
  FROM lineitem GROUP BY l_partkey
),
tot AS (
  SELECT CAST(sum(value_cbp) AS HUGEINT) AS total_cbp,
         count(*) AS n_parts
  FROM per
)
SELECT l_partkey, value_cbp
FROM per, tot
WHERE CAST(value_cbp AS HUGEINT) * n_parts * {Q11_MEAN_DEN}
      > total_cbp * {Q11_MEAN_NUM}
ORDER BY value_cbp DESC, l_partkey
"""

QUERIES["important_parts"] = important_parts_query
ORACLES["important_parts"] = IMPORTANT_PARTS_SQL


Q16_EXCL_BRAND = "Brand#1"


def parts_supplier_counts_query(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct-supplier counts per (brand, type,
    size) from lineitem part-supplier observations, excluding one brand
    and excluding 'complaint' suppliers (proxy: negative account
    balance — the original greps s_comment). Plan shape preserved:
    broadcast anti-join against the tiny excluded-supplier list, then
    count(distinct) keyed by the dimension triple."""
    bad = (_t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_brand") != Q16_EXCL_BRAND)
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(F.broadcast(bad),
                    li["l_suppkey"] == bad["s_suppkey"], "left_anti")
            .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                     "p_size"))


PARTS_SUPPLIER_COUNTS_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand != '{Q16_EXCL_BRAND}'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

QUERIES["parts_supplier_counts"] = parts_supplier_counts_query
ORACLES["parts_supplier_counts"] = PARTS_SUPPLIER_COUNTS_SQL


# -- Late-line priority mix (TPC-H Q12-flavored conditional aggregate) ---------

Q12_START = "1997-01-01"
Q12_END = "1998-01-01"
Q12_LATE_DAYS = 45
Q12_HIGH = ("1-URGENT", "2-HIGH")


def late_ship_priority_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (lineitem carries no shipmode/commit/receipt
    dates): per l_returnflag — the 3-value line classifier standing in
    for shipmode — count lines shipped inside one year that went out
    more than Q12_LATE_DAYS after their order date, split into
    high-priority (Q12_HIGH) vs lower-priority orders. Q12's point
    survives the adaptation: ONE fact→orders equi join whose payload is
    the two-branch conditional aggregate (CASE WHEN ... THEN 1 ELSE 0
    pair), never two separate scans per branch.

    Scale shape: the ship-window predicate pushes into the lineitem
    scan (PushedFilters, pinned) and the projection prunes to 3 fact
    columns; the join shuffles on orderkey (orders is corpus-sized at
    target scale — no broadcast hint; AQE may still pick one at test
    sf); the late-days inequality rides the join output as a JVM
    filter; the 3-key aggregate collapses map-side before the final
    exchange."""
    _utc(spark)
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(Q12_START).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q12_END).cast("timestamp")))
          .select("l_orderkey", "l_returnflag", "l_shipdate"))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate")
                    + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_count"),
                 F.sum(F.when(high, 0).otherwise(1)).cast("long")
                 .alias("low_count"))
            .orderBy("l_returnflag"))


_Q12_HIGH_SQL = ", ".join(f"'{p}'" for p in Q12_HIGH)

LATE_SHIP_PRIORITY_SQL = f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ({_Q12_HIGH_SQL})
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ({_Q12_HIGH_SQL})
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{Q12_START}'
  AND l.l_shipdate <  TIMESTAMP '{Q12_END}'
  AND l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""

QUERIES["late_ship_priority"] = late_ship_priority_query
ORACLES["late_ship_priority"] = LATE_SHIP_PRIORITY_SQL


# -- Dominant part suppliers (TPC-H Q20-flavored correlated share gate) --------

Q20_PREFIX = "small"
Q20_START = "1997-01-01"
Q20_END = "1998-01-01"
# a supplier qualifies when it shipped a strict majority of some
# prefix-named part's annual volume: qty_supp/qty_part > NUM/DEN
Q20_SHARE_NUM, Q20_SHARE_DEN = 1, 2


def dominant_suppliers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp/availqty): suppliers who shipped
    a strict majority (> Q20_SHARE_NUM/Q20_SHARE_DEN) of some
    Q20_PREFIX-named part's total volume inside one year. The
    original's nested correlated subqueries (availqty > 0.5x the
    quantity shipped of that part) become: one (part, supplier)
    aggregate over the pruned facts, the per-part total as a WINDOW
    over that aggregate (a join-back would re-execute the aggregate —
    the markov_transitions lesson; the window reuses the result
    frame), an exact integer cross-multiplied share gate
    (qty_supp·DEN > qty_part·NUM — no float share), and a semi join up
    to supplier names.

    Scale shape: the name-prefix part filter broadcast-prunes the fact
    scan before any shuffle; the aggregate shuffles once on (partkey,
    suppkey); the share window's partkey exchange carries only the
    pre-aggregated rows (O(catalog · suppliers-per-part), not corpus);
    the qualifying-supplier set is bounded by |supplier| and
    broadcast-semi-joins. Split stays live at every sf (6/100 at
    sf0.001, 52/100 at sf0.01, 530/1000 at sf0.1)."""
    _utc(spark)
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_name").startswith(Q20_PREFIX))
            .select("p_partkey"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(Q20_START).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q20_END).cast("timestamp")))
          .select("l_partkey", "l_suppkey",
                  F.round("l_quantity").cast("long").alias("qty")))
    ps = (li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("qty").alias("qty_supp")))
    w = Window.partitionBy("l_partkey")
    qual = (ps.withColumn("qty_part", F.sum("qty_supp").over(w))
            .filter(F.col("qty_supp") * Q20_SHARE_DEN
                    > F.col("qty_part") * Q20_SHARE_NUM)
            .select("l_suppkey"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (sup.join(F.broadcast(qual),
                     sup["s_suppkey"] == qual["l_suppkey"], "left_semi")
            .orderBy("s_name", "s_suppkey"))


DOMINANT_SUPPLIERS_SQL = f"""
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty_supp
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '{Q20_PREFIX}%'
    AND l.l_shipdate >= TIMESTAMP '{Q20_START}'
    AND l.l_shipdate <  TIMESTAMP '{Q20_END}'
  GROUP BY 1, 2
),
shr AS (
  SELECT *, CAST(sum(qty_supp) OVER (PARTITION BY l_partkey) AS BIGINT)
              AS qty_part
  FROM ps
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM shr
  WHERE qty_supp * {Q20_SHARE_DEN} > qty_part * {Q20_SHARE_NUM})
ORDER BY s.s_name, s.s_suppkey
"""

QUERIES["dominant_suppliers"] = dominant_suppliers_query
ORACLES["dominant_suppliers"] = DOMINANT_SUPPLIERS_SQL


# --- Partial-aggregate merge (incremental rollup maintenance) ---------------

def partial_agg_merge_query(spark, sf_dir):
    """The incremental-view-maintenance invariant as a checked query:
    per-key aggregate states computed on two DISJOINT slices of the fact
    table (event_id parity stands in for yesterday's rollup + today's
    delta), then MERGED state-wise — count by sum, sum by sum, min by
    min, max by max — must equal the direct aggregate over the union.
    The oracle computes the direct aggregate, so the hash comparison IS
    the invariant. This is the pattern that lets a 10^12-doc nightly
    rollup absorb a daily delta without rereading history: every state
    here is mergeable, which is exactly what Spark's own partial
    aggregation exploits map-side.

    Sums use exact cents; timestamps render to strings (engine TZ
    discipline)."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")

    def partial(pred):
        return (ev.filter(pred)
                .select("event_type", cents.alias("c"), "ts")
                .groupBy("event_type")
                .agg(F.count("*").alias("n"), F.sum("c").alias("sum_c"),
                     F.min("ts").alias("min_ts"),
                     F.max("ts").alias("max_ts")))

    halves = partial(F.col("event_id") % 2 == 0).unionAll(
        partial(F.col("event_id") % 2 == 1))
    return (
        halves.groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_c").alias("sum_cents"),
             F.date_format(F.min("min_ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("first_ts"),
             F.date_format(F.max("max_ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("last_ts"))
        .orderBy("event_type")
    )


PARTIAL_AGG_MERGE_SQL = """
SELECT event_type, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["partial_agg_merge"] = partial_agg_merge_query
ORACLES["partial_agg_merge"] = PARTIAL_AGG_MERGE_SQL
