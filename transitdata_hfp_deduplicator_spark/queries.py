"""The declared query registry — driver contract (SURVEY.md §2 Part B).

Every entry is a named query ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle string over the same parquet tables.
Registered via the ``@query`` decorator; ``__spark_entry__.py`` re-exports
``QUERIES`` / ``ORACLES``.

Determinism rules (the driver hash-compares values, order-insensitive,
columns matched by name):

* Every aggregate / computed column is aliased identically in Spark and
  SQL.
* Sums/avgs over ``double`` columns go through ``DECIMAL`` so the result
  is independent of partial-aggregation order (double addition is not
  associative; Spark and DuckDB would otherwise differ in the last ulp).
  Helper: ``dsum`` / its SQL macro ``DSUM``.
* Timestamps are emitted as epoch integers (``unix_millis`` /
  ``epoch_ms``) or formatted strings — never raw timestamp columns.
* Every window ``ORDER BY`` and every ``LIMIT`` has a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from transitdata_hfp_deduplicator_spark import tables
from transitdata_hfp_deduplicator_spark.operators.dedup import (
    dedup_exact,
    dup_stats_tumbling,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# the reference's dedup identity = canonical payload bytes
# (Deduplicator.java:69-106); on the synthetic `events` table the
# payload-analog is (user_id, event_type, props) — `value`/`ts`/`key`
# vary per duplicate just like eventTime/key in ITDeduplicatorTest.java:37-42.
EVENT_IDENTITY = ["user_id", "event_type", "props"]
EVENT_ORDER = ["ts", "event_id"]


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent sum of a double expression (via decimal)."""
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")


def davg(col: Column, count: Column, scale: int = 4) -> Column:
    return dsum(col, scale) / count


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference core, batch (SURVEY.md §2 A3-A5, A9-A10)
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
    SELECT event_id, user_id, event_type, value, props, epoch_ms(ts) AS ts_ms
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type, props ORDER BY ts, event_id) = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence-wins dedup of `events` (Deduplicator.java:43-66)."""
    ev = _t(spark, sf_dir, "events")
    out = dedup_exact(ev, EVENT_IDENTITY, EVENT_ORDER)
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.unix_millis("ts").alias("ts_ms"),
    )


@query(
    "q_dup_stats",
    oracle="""
    WITH tagged AS (
        SELECT ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type, props
                   ORDER BY ts, event_id) AS rn,
               epoch_ms(ts) - min(epoch_ms(ts)) OVER (
                   PARTITION BY user_id, event_type, props) AS delay_ms
        FROM events
    )
    SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS window_start,
           count(*) FILTER (rn = 1) AS primes,
           count(*) FILTER (rn > 1) AS duplicates,
           CAST(sum(delay_ms) FILTER (rn > 1) AS BIGINT) AS sum_delay_ms,
           round(count(*) FILTER (rn > 1)
                 / nullif(count(*) FILTER (rn = 1), 0), 6) AS dup_ratio,
           round(round(count(*) FILTER (rn > 1)
                 / nullif(count(*) FILTER (rn = 1), 0), 6) * 100, 4) AS dup_pct,
           round(CAST(sum(delay_ms) FILTER (rn > 1) AS DOUBLE)
                 / nullif(count(*) FILTER (rn > 1), 0), 4) AS avg_delay_ms
    FROM tagged
    GROUP BY 1
    """,
)
def q_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute duplicate-ratio analytics (Analytics.java:47-67, batch)."""
    ev = _t(spark, sf_dir, "events")
    return dup_stats_tumbling(ev, EVENT_IDENTITY, EVENT_ORDER, "1 minute")


# ---------------------------------------------------------------------------
# Relational core (SURVEY.md §7 step 2)
# ---------------------------------------------------------------------------


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection; Catalyst prunes the read schema."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "disc_price"
        ),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate <  DATE '1996-01-01'
      AND l_returnflag IN ('R', 'A')
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity IS NOT NULL
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + IN + BETWEEN + null predicates, pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & F.col("l_returnflag").isin("R", "A")
        & F.col("l_discount").between(0.02, 0.08)
        & F.col("l_quantity").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        "l_discount",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@query(
    "q_agg_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final HashAggregate (map-side combine)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            F.round(davg(F.col("l_quantity"), n), 6).alias("avg_qty"),
            F.round(davg(F.col("l_extendedprice"), n), 6).alias("avg_price"),
            F.round(davg(F.col("l_discount"), n, 6), 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_custs,
           count(DISTINCT o_orderstatus) AS n_statuses,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject (no global sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q_set_ops",
    oracle="""
    SELECT c_custkey AS custkey, 'both' AS tag
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
      AND c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey AS custkey, 'no_orders' AS tag
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over key sets."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    custs = c.select(F.col("c_custkey").alias("custkey"))
    order_custs = o.select(F.col("o_custkey").alias("custkey"))
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    both = building.intersect(order_custs).withColumn("tag", F.lit("both"))
    no_orders = custs.exceptAll(order_custs).withColumn("tag", F.lit("no_orders"))
    return both.unionAll(no_orders)


@query(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 8) AS name8,
           length(p_name) AS name_len,
           instr(p_type, 'BRASS') AS brass_pos,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(replace(p_name, 'a', ' ')) AS name_repl,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           split_part(p_type, ' ', 1) AS first_tok
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (mirrors topic parsing, A12)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.instr(F.col("p_type"), "BRASS").cast("bigint").alias("brass_pos"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.replace(F.col("p_name"), F.lit("a"), F.lit(" "))).alias("name_repl"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        F.split(F.col("p_type"), " ").getItem(0).alias("first_tok"),
    )


@query(
    "q_scalar_datetime",
    oracle="""
    SELECT event_id,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(dayofweek(ts) AS BIGINT) AS dow,
           epoch_ms(ts) AS ts_ms,
           CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-01-01') * -1 AS BIGINT) AS days_since,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (mirrors HFP tst/tsi duality)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.unix_millis("ts").alias("ts_ms"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("bigint").alias("days_since"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4) AS adj,
           round(power(l_quantity, 2), 4) AS qty_sq,
           round(ln(l_extendedprice + 1), 8) AS log_price,
           round(sqrt(l_extendedprice), 8) AS sqrt_price,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
           l_linenumber % 3 AS ln_mod
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface (mirrors A9 derived-metric arithmetic)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("adj"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 8).alias("log_price"),
        F.round(F.sqrt("l_extendedprice"), 8).alias("sqrt_price"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        (F.col("l_linenumber") % 3).alias("ln_mod"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (mirrors the HFP VP payload decode, §1.3)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id", k.alias("k_val"), (k % 10).alias("k_mod")
    ).filter(F.col("k_val").isNotNull())


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §7 step 3)
# ---------------------------------------------------------------------------


@query(
    "q_join_broadcast",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice, n.n_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim) ⋈ broadcast(dim): no shuffle of the fact
    side — the plan must show BroadcastHashJoin (tested in
    tests/test_plans.py)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice", "n_name")
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join, dims broadcast, one shuffle for the
    final aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, 'has_urgent' AS tag
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, c_name, 'no_orders' AS tag
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) + left_anti (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("tag", F.lit("has_urgent"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("tag", F.lit("no_orders"))
    )
    return semi.unionAll(anti)


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           CAST(coalesce(SUM(CAST(o.o_totalprice AS DECIMAL(30,4))), 0) AS DOUBLE) AS total_spend
    FROM customer c
    LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched customers (count=0 rows)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


@query(
    "q_join_theta_range",
    oracle="""
    SELECT e1.event_id AS purchase_id, e2.event_id AS error_id,
           e1.user_id, epoch_ms(e2.ts) - epoch_ms(e1.ts) AS gap_ms
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
    WHERE e1.event_type = 'purchase' AND e2.event_type = 'error'
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with an equi prefix: errors within 30min after a
    purchase, per user. The equi key keeps the plan a hash join with a
    range residual — never a nested loop."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    return (
        p.join(
            e,
            (p.user_id == e.e_user_id)
            & (e.e_ts > p.p_ts)
            & (e.e_ts <= p.p_ts + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "purchase_id",
            "error_id",
            "user_id",
            (F.unix_millis("e_ts") - F.unix_millis("p_ts")).alias("gap_ms"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         s AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           s.event_id AS signup_event_id,
           epoch_ms(s.ts) AS signup_ms
    FROM p LEFT JOIN s ON s.user_id = p.user_id AND s.ts <= p.ts
    QUALIFY row_number() OVER (
        PARTITION BY p.event_id
        ORDER BY s.ts DESC NULLS LAST, s.event_id DESC) = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: latest signup at-or-before each purchase,
    per user — union+running-last, linear (operators/joins.asof_join)."""
    from transitdata_hfp_deduplicator_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id"),
        F.col("ts").alias("s_ts"),
    )
    joined = asof_join(
        p, s, ["user_id"], "ts", "s_ts", ["signup_event_id", "s_ts"], suffix=""
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("signup_event_id"),
        F.unix_millis("s_ts").alias("signup_ms"),
    )


# ---------------------------------------------------------------------------
# Windows & grouping (SURVEY.md §7 step 4)
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions over a total order."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           first_value(event_id) OVER w AS first_event,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms,
           CAST(SUM(CAST(value AS DECIMAL(30,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first + running sum with an explicit frame."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        (F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)).alias("gap_ms"),
        F.sum(F.col("value").cast("decimal(30,4)"))
        .over(wrun)
        .cast("double")
        .alias("running_value"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 5
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (window rank ≤ k; AQE prunes the sort per group)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS returnflag,
           coalesce(l_linestatus, '(all)') AS linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id — Expand + single-pass aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "gid",
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Text analysis (north star; SURVEY.md §7 step 6)
# ---------------------------------------------------------------------------


@query(
    "q_text_tokens",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
        FROM documents
    )
    SELECT token,
           count(*) AS tf,
           count(DISTINCT doc_id) AS df
    FROM tok
    WHERE token <> ''
    GROUP BY token
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequency via tokenize + explode."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(TXT.tokenize(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(lower(trim(text)), ' '))) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        n.alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(TXT.token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
        F.round(F.sum("n_chars") / n, 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q_text_quality",
    oracle="""
    WITH q AS (
        SELECT doc_id, lang,
               len(string_split(lower(trim(text)), ' ')) AS n_tok,
               length(text) AS n_ch,
               length(regexp_replace(text, '[^A-Za-zÀ-ÿ]', '', 'g')) AS n_alpha,
               len(list_filter(string_split(lower(trim(text)), ' '),
                   t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS sw_hits
        FROM documents
    )
    SELECT doc_id, lang, n_tok,
           round(CAST(n_alpha AS DOUBLE) / nullif(n_ch, 0), 6) AS alpha_ratio,
           round(CAST(sw_hits AS DOUBLE) / nullif(n_tok, 0), 6) AS stopword_ratio,
           round(0.3 * (CASE WHEN n_tok BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.25 END)
                 + 0.3 * coalesce(CAST(n_alpha AS DOUBLE) / nullif(n_ch, 0), 0.0)
                 + 0.2 * (CASE WHEN CAST(n_ch AS DOUBLE) / nullif(n_tok, 0)
                               BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.25 END)
                 + 0.2 * (CASE WHEN CAST(sw_hits AS DOUBLE) / nullif(n_tok, 0) > 0.01
                               THEN 1.0 ELSE 0.5 END), 6) AS quality
    FROM q
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (length/alpha/stopword heuristics)."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    toks = TXT.tokenize(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.round(
            F.length(F.regexp_replace("text", r"[^A-Za-zÀ-ÿ]", ""))
            / F.nullif(F.length("text"), F.lit(0)),
            6,
        ).alias("alpha_ratio"),
        F.round(TXT.stopword_ratio(toks, "en"), 6).alias("stopword_ratio"),
        TXT.quality_score(F.col("text")).alias("quality"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT md5(text) AS fp, count(*) AS n_docs, min(doc_id) AS first_doc
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting + exact-duplicate grouping on the digest —
    the documents-table analog of the reference's payload hash (A4)."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(TXT.fingerprint(F.col("text"), "md5").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "q_text_scrub",
    oracle="""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com via https://ex.org/d/'
                  || CAST(doc_id AS VARCHAR) || '?u=a@b.co or +3581234'
                  || CAST(doc_id AS VARCHAR) AS dirty
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(dirty, 'https?://[^\\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+[0-9]{7,14}', '<PHONE>', 'g') AS clean,
           length(dirty) AS n_dirty
    FROM dirty
    """,
)
def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus PII scrubbing (URL/email/intl-phone → placeholder
    tokens) — a pure regexp_replace chain, whole-stage codegen, no
    Python.  The corpus is synthetic word-soup with no organic PII, so
    the query plants deterministic doc_id-derived PII (an email inside
    a URL query string among it — the case that forces URL-before-email
    scrub order) and hash-checks the scrubbed text against DuckDB
    running the same RE2-compatible patterns."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), sid,
        F.lit("@mail.example.com via https://ex.org/d/"), sid,
        F.lit("?u=a@b.co or +3581234"), sid,
    )
    return d.select(
        "doc_id",
        TXT.scrub_pii(dirty).alias("clean"),
        F.length(dirty).cast("long").alias("n_dirty"),
    )


@query(
    "q_doc_chunks",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN length(text) <= 200 THEN 1
                  ELSE CAST(ceil((length(text) - 200) / 150.0) AS BIGINT) + 1
             END AS nc
      FROM documents
    )
    , ex AS (
      SELECT doc_id, text, unnest(range(0, nc)) AS i FROM base
    )
    SELECT doc_id,
           i AS chunk_idx,
           substr(text, CAST(i * 150 + 1 AS BIGINT), 200) AS chunk,
           length(substr(text, CAST(i * 150 + 1 AS BIGINT), 200)) AS n_chars
    FROM ex
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width document chunking (window 200 chars,
    stride 150) — the LLM-training document-splitting primitive.  One
    array-build + posexplode per doc, O(n_chunks) substring copies, all
    in codegen; the chunk table inherits the scan's partitioning (no
    shuffle at any scale)."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(TXT.chunk_text(F.col("text"), 200, 150)).alias(
            "chunk_idx", "chunk"
        ),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        F.length("chunk").cast("long").alias("n_chars"),
    )


@query(
    "q_corpus_prep",
    oracle="""
    WITH q AS (
        SELECT doc_id, lang, text,
               len(string_split(lower(trim(text)), ' ')) AS n_tok,
               length(text) AS n_ch,
               length(regexp_replace(text, '[^A-Za-zÀ-ÿ]', '', 'g')) AS n_alpha,
               len(list_filter(string_split(lower(trim(text)), ' '),
                   t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS sw_hits
        FROM documents
    ), scored AS (
        SELECT doc_id, lang, text,
               round(0.3 * (CASE WHEN n_tok BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.25 END)
                     + 0.3 * coalesce(CAST(n_alpha AS DOUBLE) / nullif(n_ch, 0), 0.0)
                     + 0.2 * (CASE WHEN CAST(n_ch AS DOUBLE) / nullif(n_tok, 0)
                                   BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.25 END)
                     + 0.2 * (CASE WHEN CAST(sw_hits AS DOUBLE) / nullif(n_tok, 0) > 0.01
                                   THEN 1.0 ELSE 0.5 END), 6) AS quality
        FROM q
    ), kept AS (
        SELECT * FROM scored WHERE quality >= 0.945
    ), uniq AS (
        SELECT min(doc_id) AS doc_id,
               arg_min(lang, doc_id) AS lang,
               arg_min(text, doc_id) AS text
        FROM kept
        GROUP BY md5(text)
    ), base AS (
        SELECT doc_id, lang, text,
               CASE WHEN length(text) <= 200 THEN 1
                    ELSE CAST(ceil((length(text) - 200) / 150.0) AS BIGINT) + 1
               END AS nc
        FROM uniq
    ), ex AS (
        SELECT doc_id, lang, text, unnest(range(0, nc)) AS i FROM base
    )
    SELECT doc_id, lang, i AS chunk_idx,
           substr(text, CAST(i * 150 + 1 AS BIGINT), 200) AS chunk
    FROM ex
    """,
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-corpus preparation — the operators composing
    as a real pipeline: quality filter (drop the bottom half by the
    length/alpha/stopword score) → exact dedup on the content digest
    (first doc_id wins, grouping by the fixed-width md5 so the shuffle
    key is 16 bytes however long the documents are) → overlapping
    chunking (200/150).  Every stage is individually oracle-checked
    elsewhere (q_text_quality, q_text_fingerprint, q_doc_chunks); this
    query hash-checks their composition."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    kept = d.filter(TXT.quality_score(F.col("text")) >= 0.945)
    uniq = (
        kept.groupBy(TXT.fingerprint(F.col("text"), "md5").alias("fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .drop("fp")
    )
    return uniq.select(
        "doc_id",
        "lang",
        F.posexplode(TXT.chunk_text(F.col("text"), 200, 150)).alias(
            "chunk_idx", "chunk"
        ),
    ).select(
        "doc_id", "lang", F.col("chunk_idx").cast("long").alias("chunk_idx"), "chunk"
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        FROM documents
    ), bi AS (
        SELECT doc_id, len(toks) AS n_tok,
               CASE WHEN len(toks) >= 2
                    THEN len(list_distinct([toks[i] || ' ' || toks[i+1]
                                            for i in range(1, len(toks))]))
                    ELSE 0 END AS n_bi_distinct,
               greatest(len(toks) - 1, 0) AS n_bi
        FROM tok
    ), tf AS (
        SELECT doc_id, unnest(toks) AS t FROM tok
    ), cnt AS (
        SELECT doc_id, t, count(*) AS c FROM tf GROUP BY 1, 2
    ), mx AS (
        SELECT doc_id, max(c) AS max_c FROM cnt GROUP BY 1
    )
    SELECT b.doc_id, b.n_tok,
           round(CASE WHEN b.n_bi > 0
                      THEN 1.0 - CAST(b.n_bi_distinct AS DOUBLE) / b.n_bi
                      ELSE 0.0 END, 6) AS dup_bigram_ratio,
           round(CAST(mx.max_c AS DOUBLE) / nullif(b.n_tok, 0), 6) AS top_tok_frac
    FROM bi b JOIN mx ON b.doc_id = mx.doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals for corpus filtering: the
    duplicate-bigram ratio and the most-frequent-token fraction per
    document (boilerplate and keyword-stuffed pages score high on
    both; the classic "repetition" family of pretraining filters).

    Plan shape: the bigram ratio is pure map work (shifted-slice
    shingles, no shuffle); the token mode is explode -> two map-side-
    combinable aggregations keyed (doc_id, token) then (doc_id) —
    never a per-doc O(len^2) expression, so cost stays linear in
    corpus size however long the documents get — joined back on
    doc_id."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT
    from transitdata_hfp_deduplicator_spark.tables import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = TXT.tokenize(F.col("text"))
    base = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_tok"),
    )
    bi = base.select(
        "doc_id",
        "n_tok",
        F.size(TXT.shingles(F.col("toks"), 2)).alias("n_bi_distinct"),
        F.greatest(F.col("n_tok") - 1, F.lit(0)).alias("n_bi"),
    )
    mx = (
        base.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"))
    )
    return bi.join(mx, "doc_id").select(
        "doc_id",
        "n_tok",
        F.round(
            F.when(
                F.col("n_bi") > 0,
                1.0 - F.col("n_bi_distinct").cast("double") / F.col("n_bi"),
            ).otherwise(0.0),
            6,
        ).alias("dup_bigram_ratio"),
        F.round(
            F.col("max_c").cast("double") / F.nullif(F.col("n_tok"), F.lit(0)), 6
        ).alias("top_tok_frac"),
    )


@query(
    "q_ngram_lm",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        FROM documents
    ), tf AS (
        SELECT doc_id, unnest(toks) AS t FROM tok
    ), vocab AS (
        SELECT t, count(*) AS c FROM tf GROUP BY 1
    ), total AS (
        SELECT count(*) AS n FROM tf
    ), scored AS (
        SELECT tf.doc_id,
               CAST(round(log10(CAST(vocab.c AS DOUBLE) / total.n), 8)
                    AS DECIMAL(18,8)) AS logp
        FROM tf JOIN vocab ON tf.t = vocab.t CROSS JOIN total
    )
    SELECT doc_id, count(*) AS n_tok,
           round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS avg_logp
    FROM scored GROUP BY 1
    """,
)
def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram language model scoring — per-document mean log10
    token probability, the cheap perplexity proxy used to rank corpus
    documents by "LM-likeness" before training.

    Plan shape: one shuffle builds the vocabulary (map-side-combined
    token counts), one equi-join keyed on the token scores every
    occurrence (AQE broadcasts the vocab side when it is small; at
    lake scale it stays a partitioned join — no driver state either
    way), one aggregation keyed doc_id folds the scores.  The corpus
    token total is the plan's only scalar (a bounded 1-row agg).
    Per-token log-probs are rounded to 8 decimals and summed as
    DECIMAL so the fold is order-independent (the dsum convention)."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT
    from transitdata_hfp_deduplicator_spark.tables import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    tf = d.select("doc_id", F.explode(TXT.tokenize(F.col("text"))).alias("t"))
    vocab = tf.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = tf.count()
    scored = tf.join(vocab, "t").select(
        "doc_id",
        F.round(F.log10(F.col("c").cast("double") / F.lit(float(total))), 8)
        .cast("decimal(18,8)")
        .alias("logp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(
            F.sum("logp").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_logp"),
    )


@query(
    "q_bm25",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        FROM documents
    ), stats AS (
        SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM tok
    ), terms AS (
        SELECT unnest(['data', 'model', 'system', 'language']) AS term
    ), tf AS (
        SELECT t.doc_id, len(t.toks) AS dl, terms.term,
               len(list_filter(t.toks, x -> x = terms.term)) AS f
        FROM tok t CROSS JOIN terms
    ), df AS (
        SELECT term, count(*) FILTER (f > 0) AS df FROM tf GROUP BY 1
    ), parts AS (
        SELECT tf.doc_id,
               CAST(round(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.f * 2.2)
                   / (tf.f + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)),
                   8) AS DECIMAL(18,8)) AS s
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
        WHERE tf.f > 0
    )
    SELECT doc_id, round(CAST(sum(s) AS DOUBLE), 6) AS bm25
    FROM parts GROUP BY 1
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) of every document
    against a fixed query-term set — the lexical side of a similarity-
    search stack, complementing the embedding paths.

    Plan shape: term frequencies come from one explode + filtered
    aggregation keyed (doc_id, term); document frequencies and the
    (n_docs, avgdl) scalars are tiny — df is BROADCAST to the scoring
    join, so the per-doc side never shuffles on anything but doc_id.
    Per-term scores are rounded and DECIMAL-summed (order-independent,
    the dsum convention)."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT
    from transitdata_hfp_deduplicator_spark.tables import spread

    TERMS = ["data", "model", "system", "language"]
    k1, b = 1.2, 0.75

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    base = d.select(
        "doc_id", TXT.tokenize(F.col("text")).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    n_docs, avgdl = base.agg(
        F.count(F.lit(1)), F.avg("dl")
    ).collect()[0]
    terms = F.array(*[F.lit(t) for t in TERMS])
    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(terms).alias("term"),
            "toks",
        )
        .select(
            "doc_id",
            "dl",
            "term",
            F.size(F.filter("toks", lambda x: x == F.col("term"))).alias("f"),
        )
        .filter(F.col("f") > 0)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    parts = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            )
            * (F.col("f") * (k1 + 1.0))
            / (
                F.col("f")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
            ),
            8,
        )
        .cast("decimal(18,8)")
        .alias("s"),
    )
    return parts.groupBy("doc_id").agg(
        F.round(F.sum("s").cast("double"), 6).alias("bm25")
    )


@query(
    "q_containment",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                              for i in range(1, len(tokens) - 1)]) AS shingles
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tokens
              FROM documents)
        WHERE len(tokens) >= 3
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
    ori AS (
        SELECT i AS src, j AS dst, round(inter * 1.0 / sa.n, 6) AS containment
        FROM inter JOIN sz sa ON i = sa.doc_id
        UNION ALL
        SELECT j AS src, i AS dst, round(inter * 1.0 / sb.n, 6) AS containment
        FROM inter JOIN sz sb ON j = sb.doc_id
    )
    SELECT src, dst, containment FROM ori WHERE containment >= 0.5
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle containment C(A→B) = |A∩B|/|A| >= 0.5 — the asymmetric
    near-dup signal that catches SUB-document duplication (a doc quoted
    inside a longer one scores ~1 while Jaccard stays low; Broder's
    resemblance/containment pair)."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import (
        containment_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return containment_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.5)


@query(
    "q_dedup_incremental",
    oracle="""
    WITH b AS (
        SELECT (epoch_ms(min(ts)) + epoch_ms(max(ts))) // 2 AS cut FROM events
    ), hist AS (
        SELECT DISTINCT user_id, event_type, props
        FROM events, b WHERE epoch_ms(ts) < b.cut
    ), inc AS (
        SELECT e.*, epoch_ms(e.ts) AS ts_ms
        FROM events e, b WHERE epoch_ms(e.ts) >= b.cut
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type, props ORDER BY ts, event_id) = 1
    )
    SELECT i.event_id, i.user_id, i.event_type, i.value, i.props, i.ts_ms
    FROM inc i LEFT JOIN hist h
      ON i.user_id = h.user_id AND i.event_type = h.event_type
         AND i.props = h.props
    WHERE h.user_id IS NULL
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production shape of the reference's
    cache (Deduplicator.java:47-51) for batch pipelines: dedup TODAY'S
    batch first-wins within itself, then anti-join its digests against
    the HISTORICAL index so only never-before-seen records survive.
    The events table is split at its time midpoint into index / batch.

    Scale shape: the index side is `digest DISTINCT` (fixed-width keys,
    map-side combined), the anti-join shuffles on the same digest both
    sides — on a real lake the index is a digest-bucketed table so the
    join co-locates without a shuffle, and Spark's runtime bloom-filter
    join prunes the batch scan.  No driver state: the 1-row min/max agg
    is the only scalar."""
    from transitdata_hfp_deduplicator_spark.operators.dedup import (
        dedup_exact,
        payload_digest,
    )

    ev = _t(spark, sf_dir, "events")
    mn, mx = ev.agg(
        F.unix_millis(F.min("ts")), F.unix_millis(F.max("ts"))
    ).collect()[0]
    cut = (mn + mx) // 2
    digest = payload_digest(*EVENT_IDENTITY)
    hist = (
        ev.filter(F.unix_millis("ts") < cut).select(digest.alias("d")).distinct()
    )
    inc = dedup_exact(
        ev.filter(F.unix_millis("ts") >= cut), EVENT_IDENTITY, EVENT_ORDER
    )
    return (
        inc.withColumn("d", digest)
        .join(hist, "d", "left_anti")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            "props",
            F.unix_millis("ts").alias("ts_ms"),
        )
    )


@query(
    "q_seq_pack",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang,
               len(string_split(lower(trim(text)), ' ')) AS n_tok
        FROM documents
    ), pref AS (
        SELECT doc_id, lang, n_tok,
               coalesce(sum(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM tok
    )
    SELECT lang, doc_id, n_tok,
           CAST(floor(prior / 512.0) AS BIGINT) AS seq_id
    FROM pref
    """,
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: concatenate documents (in a
    deterministic per-language order) into fixed token-budget training
    sequences — each doc's sequence id is its exclusive prefix token
    count divided by the budget (512 here).

    Scale shape: ONE analytic window per language partition (running
    sum over a partitioned sort) — no driver state, no iteration; at
    lake scale the partition key would be (lang, shard) to bound the
    sort, exactly how the deterministic-shuffle query below shards."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", TXT.token_count(F.col("text")).cast("long").alias("n_tok")
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    return tok.select(
        "lang",
        "doc_id",
        "n_tok",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 512.0)
        .cast("long")
        .alias("seq_id"),
    )


@query(
    "q_corpus_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM documents
    )
    SELECT doc_id, CAST(hv % 16 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle — the global training-data
    shuffle at lake scale: hash(seed, doc_id) assigns each document a
    shard and a position within the shard.  Reproducible across
    engines (md5-derived hash64, the same externalizable-digest
    argument as the reference's fixed murmur3 seed,
    Deduplicator.java:27-28) and across partitionings (the order is a
    function of the data, not of arrival).

    Scale shape: shard-LOCAL window sort (16-way here, thousands-way at
    100 TB) — never a global orderBy; shards are written independently
    and training readers consume them in shard order."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    h = d.select(
        "doc_id", TXT.hash64(F.col("doc_id").cast("string"), seed=42).alias("hv")
    )
    w = W.partitionBy(F.col("hv") % 16).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hv") % 16).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


@query(
    "q_dedup_norm",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               md5(regexp_replace(
                   trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
                   ' +', ' ', 'g')) AS fp
        FROM documents
    )
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM n GROUP BY fp
    """,
)
def q_dedup_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-dedup — the reference's canonicalize-before-
    hash insight (A3, Deduplicator.java:69,96-106) applied to text:
    case-fold, strip punctuation, collapse whitespace, THEN digest, so
    trivially-reformatted copies collapse to one identity.  First doc
    wins (min doc_id); the shuffle key is the fixed-width digest, not
    the document."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")),
        " +",
        " ",
    )
    return (
        d.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("fp")
    )


@query(
    "q_text_lang_id",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang, text,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    hits AS (
        SELECT doc_id, lang, text, toks,
               len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu','mit','von'])) AS s_de,
               len(list_intersect(toks, ['the','a','of','and','to','in','is','it','that','for'])) AS s_en,
               len(list_intersect(toks, ['ja','on','ei','se','että','oli','hän','mutta','niin','kuin'])) AS s_fi,
               len(list_intersect(toks, ['le','la','de','et','est','un','une','que','pour','dans'])) AS s_fr,
               len(list_intersect(toks, ['och','att','det','som','en','är','av','för','med','på'])) AS s_sv
        FROM tok
    ),
    best AS (
        SELECT doc_id, lang, text,
               greatest(s_de*10 + 0, s_en*10 + 1, s_fi*10 + 2,
                        s_fr*10 + 3, s_sv*10 + 4) AS g
        FROM hits
    )
    SELECT doc_id, lang,
           CASE WHEN g < 10 THEN 'und'
                WHEN g % 10 = 0 THEN 'de' WHEN g % 10 = 1 THEN 'en'
                WHEN g % 10 = 2 THEN 'fi' WHEN g % 10 = 3 THEN 'fr'
                ELSE 'sv' END AS detected_lang,
           CAST(len(list_filter(
               string_split_regex(
                   regexp_replace(text, '([0-9]+|[^\s A-Za-z0-9]+|[^\sA-Za-z0-9]+)', '  ', 'g'),
                   '\s+'),
               x -> x <> '')) AS INT) AS bpe_tokens
    FROM best
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-id (stopword-hit argmax; functions/text.py).
    The oracle encodes the argmax arithmetically (score*10 + language
    index) so ties break identically to Spark's greatest-of-structs
    (larger language string wins)."""
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    toks = TXT.tokenize(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        TXT.lang_id(toks).alias("detected_lang"),
        TXT.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Near-duplicate families (north star)
# ---------------------------------------------------------------------------


@query(
    "q_minhash_simdup",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                              for i in range(1, len(tokens) - 1)]) AS shingles
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tokens
              FROM documents)
        WHERE len(tokens) >= 3
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i, j, inter,
           round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
    FROM inter
    JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa ON i = sa.doc_id
    JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb ON j = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    """,
)
def q_minhash_simdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard near-dup pairs (J >= 0.5) — the
    ground-truth the MinHash/LSH path approximates."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.5)


@query(
    "q_minhash_signature",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                              for i in range(1, len(tokens) - 1)]) AS shingles
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tokens
              FROM documents)
        WHERE len(tokens) >= 3
    )
    SELECT doc_id,
           list_min(list_transform(shingles,
               s -> ('0x' || substr(md5('0|' || s), 1, 15))::BIGINT)) AS mh_0,
           list_min(list_transform(shingles,
               s -> ('0x' || substr(md5('1|' || s), 1, 15))::BIGINT)) AS mh_1,
           list_min(list_transform(shingles,
               s -> ('0x' || substr(md5('2|' || s), 1, 15))::BIGINT)) AS mh_2,
           list_min(list_transform(shingles,
               s -> ('0x' || substr(md5('3|' || s), 1, 15))::BIGINT)) AS mh_3
    FROM sh
    """,
)
def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 hashes shown; engine default 16) — md5-based
    hash family so the signature bytes are engine-independent, the same
    externalizability the reference pinned seed 42 for
    (Deduplicator.java:27-28)."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import (
        minhash_signatures,
    )

    d = _t(spark, sf_dir, "documents")
    return minhash_signatures(d, "doc_id", "text", shingle_n=3, num_hashes=4)


@query(
    "q_dedup_minhash_lsh",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                              for i in range(1, len(tokens) - 1)]) AS shingles
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tokens
              FROM documents)
        WHERE len(tokens) >= 3
    ),
    mh AS (
        SELECT doc_id, shingles,
               [list_min(list_transform(shingles,
                    s -> ('0x' || substr(md5(k || '|' || s), 1, 15))::BIGINT))
                for k in range(0, 16)] AS sig
        FROM sh
    ),
    cand AS (
        SELECT a.doc_id AS i, b.doc_id AS j,
               a.shingles AS sh_i, b.shingles AS sh_j
        FROM mh a JOIN mh b ON a.doc_id < b.doc_id AND ((a.sig[1] = b.sig[1] AND a.sig[2] = b.sig[2]) OR (a.sig[3] = b.sig[3] AND a.sig[4] = b.sig[4]) OR (a.sig[5] = b.sig[5] AND a.sig[6] = b.sig[6]) OR (a.sig[7] = b.sig[7] AND a.sig[8] = b.sig[8]) OR (a.sig[9] = b.sig[9] AND a.sig[10] = b.sig[10]) OR (a.sig[11] = b.sig[11] AND a.sig[12] = b.sig[12]) OR (a.sig[13] = b.sig[13] AND a.sig[14] = b.sig[14]) OR (a.sig[15] = b.sig[15] AND a.sig[16] = b.sig[16]))
    )
    SELECT i, j,
           round(len(list_intersect(sh_i, sh_j)) * 1.0
                 / len(list_distinct(sh_i || sh_j)), 6) AS jaccard
    FROM cand
    WHERE round(len(list_intersect(sh_i, sh_j)) * 1.0
                / len(list_distinct(sh_i || sh_j)), 6) >= 0.5
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, exact-Jaccard verified —
    the 100 TB near-dup plan (signatures map-only; shuffle keys are
    band buckets).  HASH-CHECKED: the md5-derived signature family is
    engine-independent, so DuckDB reproduces band candidacy (8 bands x
    2 rows) and the exact-Jaccard verdicts bit-for-bit.  The engine
    default for production stays xxhash64 (~6x cheaper, same plan)."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import (
        minhash_lsh_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", shingle_n=3, num_hashes=16, bands=8, threshold=0.5,
        hash_family="md5",
    )


@query(
    "q_dedup_simhash",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS t
        FROM documents
    ),
    h AS (
        SELECT doc_id, ('0x' || substr(md5('0|' || t), 1, 15))::BIGINT AS hv
        FROM tok
    ),
    votes AS (
        SELECT doc_id,
               sum(CASE WHEN (hv >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS v0,
               sum(CASE WHEN (hv >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS v1,
               sum(CASE WHEN (hv >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS v2,
               sum(CASE WHEN (hv >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS v3,
               sum(CASE WHEN (hv >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS v4,
               sum(CASE WHEN (hv >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS v5,
               sum(CASE WHEN (hv >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS v6,
               sum(CASE WHEN (hv >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS v7,
               sum(CASE WHEN (hv >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS v8,
               sum(CASE WHEN (hv >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS v9,
               sum(CASE WHEN (hv >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS v10,
               sum(CASE WHEN (hv >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS v11,
               sum(CASE WHEN (hv >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS v12,
               sum(CASE WHEN (hv >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS v13,
               sum(CASE WHEN (hv >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS v14,
               sum(CASE WHEN (hv >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS v15,
               sum(CASE WHEN (hv >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS v16,
               sum(CASE WHEN (hv >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS v17,
               sum(CASE WHEN (hv >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS v18,
               sum(CASE WHEN (hv >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS v19,
               sum(CASE WHEN (hv >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS v20,
               sum(CASE WHEN (hv >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS v21,
               sum(CASE WHEN (hv >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS v22,
               sum(CASE WHEN (hv >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS v23,
               sum(CASE WHEN (hv >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS v24,
               sum(CASE WHEN (hv >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS v25,
               sum(CASE WHEN (hv >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS v26,
               sum(CASE WHEN (hv >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS v27,
               sum(CASE WHEN (hv >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS v28,
               sum(CASE WHEN (hv >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS v29,
               sum(CASE WHEN (hv >> 30) & 1 = 1 THEN 1 ELSE -1 END) AS v30,
               sum(CASE WHEN (hv >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS v31,
               sum(CASE WHEN (hv >> 32) & 1 = 1 THEN 1 ELSE -1 END) AS v32,
               sum(CASE WHEN (hv >> 33) & 1 = 1 THEN 1 ELSE -1 END) AS v33,
               sum(CASE WHEN (hv >> 34) & 1 = 1 THEN 1 ELSE -1 END) AS v34,
               sum(CASE WHEN (hv >> 35) & 1 = 1 THEN 1 ELSE -1 END) AS v35,
               sum(CASE WHEN (hv >> 36) & 1 = 1 THEN 1 ELSE -1 END) AS v36,
               sum(CASE WHEN (hv >> 37) & 1 = 1 THEN 1 ELSE -1 END) AS v37,
               sum(CASE WHEN (hv >> 38) & 1 = 1 THEN 1 ELSE -1 END) AS v38,
               sum(CASE WHEN (hv >> 39) & 1 = 1 THEN 1 ELSE -1 END) AS v39,
               sum(CASE WHEN (hv >> 40) & 1 = 1 THEN 1 ELSE -1 END) AS v40,
               sum(CASE WHEN (hv >> 41) & 1 = 1 THEN 1 ELSE -1 END) AS v41,
               sum(CASE WHEN (hv >> 42) & 1 = 1 THEN 1 ELSE -1 END) AS v42,
               sum(CASE WHEN (hv >> 43) & 1 = 1 THEN 1 ELSE -1 END) AS v43,
               sum(CASE WHEN (hv >> 44) & 1 = 1 THEN 1 ELSE -1 END) AS v44,
               sum(CASE WHEN (hv >> 45) & 1 = 1 THEN 1 ELSE -1 END) AS v45,
               sum(CASE WHEN (hv >> 46) & 1 = 1 THEN 1 ELSE -1 END) AS v46,
               sum(CASE WHEN (hv >> 47) & 1 = 1 THEN 1 ELSE -1 END) AS v47,
               sum(CASE WHEN (hv >> 48) & 1 = 1 THEN 1 ELSE -1 END) AS v48,
               sum(CASE WHEN (hv >> 49) & 1 = 1 THEN 1 ELSE -1 END) AS v49,
               sum(CASE WHEN (hv >> 50) & 1 = 1 THEN 1 ELSE -1 END) AS v50,
               sum(CASE WHEN (hv >> 51) & 1 = 1 THEN 1 ELSE -1 END) AS v51,
               sum(CASE WHEN (hv >> 52) & 1 = 1 THEN 1 ELSE -1 END) AS v52,
               sum(CASE WHEN (hv >> 53) & 1 = 1 THEN 1 ELSE -1 END) AS v53,
               sum(CASE WHEN (hv >> 54) & 1 = 1 THEN 1 ELSE -1 END) AS v54,
               sum(CASE WHEN (hv >> 55) & 1 = 1 THEN 1 ELSE -1 END) AS v55,
               sum(CASE WHEN (hv >> 56) & 1 = 1 THEN 1 ELSE -1 END) AS v56,
               sum(CASE WHEN (hv >> 57) & 1 = 1 THEN 1 ELSE -1 END) AS v57,
               sum(CASE WHEN (hv >> 58) & 1 = 1 THEN 1 ELSE -1 END) AS v58,
               sum(CASE WHEN (hv >> 59) & 1 = 1 THEN 1 ELSE -1 END) AS v59
        FROM h GROUP BY doc_id
    ),
    sh AS (
        SELECT doc_id,
               (CASE WHEN v0 > 0 THEN 1 ELSE 0 END
               + CASE WHEN v1 > 0 THEN 2 ELSE 0 END
               + CASE WHEN v2 > 0 THEN 4 ELSE 0 END
               + CASE WHEN v3 > 0 THEN 8 ELSE 0 END
               + CASE WHEN v4 > 0 THEN 16 ELSE 0 END
               + CASE WHEN v5 > 0 THEN 32 ELSE 0 END
               + CASE WHEN v6 > 0 THEN 64 ELSE 0 END
               + CASE WHEN v7 > 0 THEN 128 ELSE 0 END
               + CASE WHEN v8 > 0 THEN 256 ELSE 0 END
               + CASE WHEN v9 > 0 THEN 512 ELSE 0 END
               + CASE WHEN v10 > 0 THEN 1024 ELSE 0 END
               + CASE WHEN v11 > 0 THEN 2048 ELSE 0 END
               + CASE WHEN v12 > 0 THEN 4096 ELSE 0 END
               + CASE WHEN v13 > 0 THEN 8192 ELSE 0 END
               + CASE WHEN v14 > 0 THEN 16384 ELSE 0 END
               + CASE WHEN v15 > 0 THEN 32768 ELSE 0 END
               + CASE WHEN v16 > 0 THEN 65536 ELSE 0 END
               + CASE WHEN v17 > 0 THEN 131072 ELSE 0 END
               + CASE WHEN v18 > 0 THEN 262144 ELSE 0 END
               + CASE WHEN v19 > 0 THEN 524288 ELSE 0 END
               + CASE WHEN v20 > 0 THEN 1048576 ELSE 0 END
               + CASE WHEN v21 > 0 THEN 2097152 ELSE 0 END
               + CASE WHEN v22 > 0 THEN 4194304 ELSE 0 END
               + CASE WHEN v23 > 0 THEN 8388608 ELSE 0 END
               + CASE WHEN v24 > 0 THEN 16777216 ELSE 0 END
               + CASE WHEN v25 > 0 THEN 33554432 ELSE 0 END
               + CASE WHEN v26 > 0 THEN 67108864 ELSE 0 END
               + CASE WHEN v27 > 0 THEN 134217728 ELSE 0 END
               + CASE WHEN v28 > 0 THEN 268435456 ELSE 0 END
               + CASE WHEN v29 > 0 THEN 536870912 ELSE 0 END
               + CASE WHEN v30 > 0 THEN 1073741824 ELSE 0 END
               + CASE WHEN v31 > 0 THEN 2147483648 ELSE 0 END
               + CASE WHEN v32 > 0 THEN 4294967296 ELSE 0 END
               + CASE WHEN v33 > 0 THEN 8589934592 ELSE 0 END
               + CASE WHEN v34 > 0 THEN 17179869184 ELSE 0 END
               + CASE WHEN v35 > 0 THEN 34359738368 ELSE 0 END
               + CASE WHEN v36 > 0 THEN 68719476736 ELSE 0 END
               + CASE WHEN v37 > 0 THEN 137438953472 ELSE 0 END
               + CASE WHEN v38 > 0 THEN 274877906944 ELSE 0 END
               + CASE WHEN v39 > 0 THEN 549755813888 ELSE 0 END
               + CASE WHEN v40 > 0 THEN 1099511627776 ELSE 0 END
               + CASE WHEN v41 > 0 THEN 2199023255552 ELSE 0 END
               + CASE WHEN v42 > 0 THEN 4398046511104 ELSE 0 END
               + CASE WHEN v43 > 0 THEN 8796093022208 ELSE 0 END
               + CASE WHEN v44 > 0 THEN 17592186044416 ELSE 0 END
               + CASE WHEN v45 > 0 THEN 35184372088832 ELSE 0 END
               + CASE WHEN v46 > 0 THEN 70368744177664 ELSE 0 END
               + CASE WHEN v47 > 0 THEN 140737488355328 ELSE 0 END
               + CASE WHEN v48 > 0 THEN 281474976710656 ELSE 0 END
               + CASE WHEN v49 > 0 THEN 562949953421312 ELSE 0 END
               + CASE WHEN v50 > 0 THEN 1125899906842624 ELSE 0 END
               + CASE WHEN v51 > 0 THEN 2251799813685248 ELSE 0 END
               + CASE WHEN v52 > 0 THEN 4503599627370496 ELSE 0 END
               + CASE WHEN v53 > 0 THEN 9007199254740992 ELSE 0 END
               + CASE WHEN v54 > 0 THEN 18014398509481984 ELSE 0 END
               + CASE WHEN v55 > 0 THEN 36028797018963968 ELSE 0 END
               + CASE WHEN v56 > 0 THEN 72057594037927936 ELSE 0 END
               + CASE WHEN v57 > 0 THEN 144115188075855872 ELSE 0 END
               + CASE WHEN v58 > 0 THEN 288230376151711744 ELSE 0 END
               + CASE WHEN v59 > 0 THEN 576460752303423488 ELSE 0 END) AS sh
        FROM votes
    )
    SELECT a.doc_id AS i, b.doc_id AS j,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3 over 64-bit token-majority
    hashes; pigeonhole chunk join = exact recall for d<=3).
    HASH-CHECKED: with the md5-derived token-hash family the signature
    is engine-independent, and full pigeonhole recall means the result
    equals DuckDB's brute-force hamming join exactly.  Production
    default stays xxhash64 (same plan, cheaper hashing)."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import simhash_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3, hash_family="md5")


# ---------------------------------------------------------------------------
# Similarity search (north star)
# ---------------------------------------------------------------------------


@query(
    "q_embed_cosine",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id % 100 = 0),
         scored AS (
             SELECT q.q_id, e.vec_id AS item_id,
                    round(list_dot_product(e.embedding::DOUBLE[], q.q_vec)
                          / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                             * sqrt(list_dot_product(q.q_vec, q.q_vec))), 6) AS cos_sim
             FROM embeddings e CROSS JOIN q
         )
    SELECT q_id, item_id, cos_sim, rank FROM (
        SELECT q_id, item_id, cos_sim,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, item_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for every 100th vector as query set —
    the exact baseline ANN answers are judged against."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return cosine_topk(e, q, k=5)


@query(
    "q_embed_ann_ivf",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    ),
    cent AS (
        SELECT label, i,
               CAST(SUM(CAST(v[i] AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        FROM e, (SELECT unnest(range(1, 65)) AS i) t
        GROUP BY label, i
    ),
    centv AS (SELECT label, list(m ORDER BY i) AS c FROM cent GROUP BY label),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
    probes AS (
        SELECT q_id, qv, label
        FROM (
            SELECT q.q_id, q.qv, cv.label,
                   list_dot_product(q.qv, cv.c)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(cv.c, cv.c))) AS c_sim
            FROM q CROSS JOIN centv cv
        )
        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY c_sim DESC, label) <= 3
    ),
    scored AS (
        SELECT p.q_id, e.vec_id AS item_id,
               round(list_dot_product(e.v, p.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cos_sim
        FROM e JOIN probes p ON e.label = p.label
    )
    SELECT q_id, item_id, cos_sim,
           CAST(row_number() OVER (
               PARTITION BY q_id ORDER BY cos_sim DESC, item_id) AS BIGINT) AS "rank"
    FROM scored
    QUALIFY "rank" <= 5
    """,
)
def q_embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: label-cell centroids, nprobe=3 — the scale path
    (each query scans nprobe/ncells of the data).  HASH-CHECKED: the
    DECIMAL-routed centroid mean makes the coarse quantizer identical
    across engines and partition orders, so probe selection and the
    exact in-cell scores reproduce in DuckDB; recall vs q_embed_cosine
    additionally asserted in tests."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(e, q, k=5, nprobe=3)


# ---------------------------------------------------------------------------
# Array / map surface
# ---------------------------------------------------------------------------


@query(
    "q_array_ops",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_elem,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 6) AS sq_norm,
           round(list_max(embedding::DOUBLE[]), 6) AS max_elem,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface: transform/aggregate/filter/element_at."""
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.array_max(vec), 6).alias("max_elem"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


@query(
    "q_map_ops",
    oracle="""
    SELECT event_id,
           CAST(cardinality(MAP {'k': CAST(json_extract(props, '$.k') AS BIGINT),
                            'k2': CAST(json_extract(props, '$.k') AS BIGINT) * 2}) AS BIGINT) AS n_keys,
           MAP {'k': CAST(json_extract(props, '$.k') AS BIGINT)}['k'][1] AS k_val,
           array_to_string(map_keys(MAP {'k': 1, 'k2': 2}), ',') AS key_list
    FROM events
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function surface (the properties-envelope analog, §1.1)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    m2 = F.create_map(F.lit("k"), k, F.lit("k2"), k * 2)
    m1 = F.create_map(F.lit("k"), k)
    mk = F.create_map(F.lit("k"), F.lit(1), F.lit("k2"), F.lit(2))
    return ev.select(
        "event_id",
        F.size(m2).cast("bigint").alias("n_keys"),
        F.element_at(m1, "k").alias("k_val"),
        F.array_join(F.map_keys(mk), ",").alias("key_list"),
    )


# ---------------------------------------------------------------------------
# Streaming (reference parity — SURVEY.md §7 step 5) + UDF + multimodal
# ---------------------------------------------------------------------------


@query(
    "q_dedup_stream",
    oracle="""
    SELECT DISTINCT user_id, event_type, props FROM events
    """,
)
def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-wins dedup: file-source replay of `events` →
    watermark(4h) → dropDuplicatesWithinWatermark on the payload digest
    (the reference hot path, Deduplicator.java:43-66, on Spark's state
    store). Emits the identity columns — the surviving *metadata* row
    depends on intra-batch arrival order, exactly like the reference's
    'first' depends on consume order; the identity SET is deterministic
    and oracle-checked."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        replay_shuffle_partitions,
        run_to_memory,
        scoped_shuffle_partitions,
        stream_dedup,
    )

    src = os.path.join(sf_dir, "events.parquet")
    stream = parquet_stream(spark, src)
    deduped = stream_dedup(stream, EVENT_IDENTITY, "ts", ttl="4 hours")
    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(src)):
        out = run_to_memory(deduped, output_mode="append")
    return out.select("user_id", "event_type", "props").distinct()


@query(
    "q_window_tumbling_stream",
    oracle="""
    SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS window_start,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (A9 in event time):
    1-minute windows over the replayed stream, complete output mode."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        replay_shuffle_partitions,
        run_to_memory,
        scoped_shuffle_partitions,
    )

    src = os.path.join(sf_dir, "events.parquet")
    stream = parquet_stream(spark, src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(src)):
        return run_to_memory(agg, output_mode="complete")


@query(
    "q_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        >= 300000000 THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sessioned AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts)) AS last_event_ms,
           count(*) AS n_events
    FROM sessioned
    GROUP BY user_id, sess_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user — `session_window` in
    batch; the oracle reproduces the gap semantics with lag+cumsum."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.unix_millis("first_ts").alias("session_start_ms"),
            F.unix_millis("last_ts").alias("last_event_ms"),
            "n_events",
        )
    )


@query(
    "q_session_window_stream",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        >= 300000000 THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sessioned AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts)) AS last_event_ms,
           count(*) AS n_events
    FROM sessioned
    GROUP BY user_id, sess_id
    """,
)
def q_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native STREAMING session windows (5-minute gap, merging state
    operator) — the stateful counterpart of q_session_window.  Complete
    output mode flushes the final merged sessions after the availableNow
    replay, so the result is deterministic and hash-checks against the
    SAME islands-SQL oracle as the batch query."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        replay_shuffle_partitions,
        run_to_memory,
        scoped_shuffle_partitions,
    )

    src = os.path.join(sf_dir, "events.parquet")
    stream = parquet_stream(spark, src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.unix_millis("first_ts").alias("session_start_ms"),
            F.unix_millis("last_ts").alias("last_event_ms"),
            "n_events",
        )
    )
    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(src)):
        return run_to_memory(agg, output_mode="complete")


@query("q_late_data")
def q_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-as-TTL semantics (empirical Spark 4.1 contract,
    pinned in tests/test_streaming.py): the watermark does NOT filter
    late input rows — it expires dedup state, so a duplicate arriving
    after its key's state eviction is RE-EMITTED.  That is precisely
    the reference's cache-forgetting behavior (Deduplicator.java:36-40)
    bounded by time as its cacheTTL config intended.  This query
    replays events as two ordered files (old half, then recent half;
    maxFilesPerTrigger=1) with a 4h TTL and returns the identities
    emitted MORE THAN ONCE — the TTL re-emissions.  Rows-only: the
    re-emission set depends on micro-batch boundaries, not on any SQL."""
    import os
    import time

    from transitdata_hfp_deduplicator_spark.streaming import (
        ephemeral_dir,
        parquet_stream,
        replay_shuffle_partitions,
        run_to_memory,
        scoped_shuffle_partitions,
        stream_dedup,
    )
    from transitdata_hfp_deduplicator_spark.tables import read_parquet

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    # Sample by IDENTITY KEY (every occurrence of a kept key survives,
    # so duplicate arrivals still span quartiles and TTL re-emission
    # still happens — the behavior this query exists to pin).  The
    # replay cost is micro-batch fixed overhead x state ops, which
    # needs a representative corpus, not the full table: 1/8 of the
    # keys exercises the identical code path at 1/8 the state size.
    ev = ev.filter(
        F.pmod(F.xxhash64(*(F.col(c) for c in EVENT_IDENTITY)), F.lit(8)) == 0
    )
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = mx - mn
    # four quartile batches: state eviction lags a watermark-advancing
    # batch (pinned in tests/test_streaming.py), so a 2-batch replay
    # would still see live state for every old key — with quartiles,
    # keys first seen in Q1 are evicted by Q3/Q4 and re-emit there.
    # One partitioned write produces all four replay files in a single
    # scan (vs. four filter+write jobs).
    cuts = [mn + span * i / 4 for i in (1, 2, 3)]
    tmp = ephemeral_dir("late_data_")
    q = (
        F.when(F.col("ts") < cuts[0], 0)
        .when(F.col("ts") < cuts[1], 1)
        .when(F.col("ts") < cuts[2], 2)
        .otherwise(3)
    )
    ev.withColumn("__q", q).repartition(1).write.partitionBy("__q").mode(
        "overwrite"
    ).parquet(tmp)
    # a heavily skewed ts distribution can leave a quartile empty (no
    # partition directory written) — derive dirs from what exists
    dirs = sorted(
        (d for d in os.listdir(tmp) if d.startswith("__q=")),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    dirs = [os.path.join(tmp, d) for d in dirs]
    # file source orders batches by modification time: oldest first
    now = time.time()
    for i, d in enumerate(dirs):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now + i, now + i))
    stream = parquet_stream(spark, tmp + "/*", max_files_per_trigger=1)
    deduped = stream_dedup(stream, EVENT_IDENTITY, "ts", ttl="4 hours")
    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(tmp)):
        out = run_to_memory(deduped, output_mode="append")
    return (
        out.groupBy("user_id", "event_type", "props")
        .agg(F.count(F.lit(1)).alias("n_emits"))
        .filter(F.col("n_emits") > 1)
    )


@query(
    "q_udf_surface",
    oracle="""
    SELECT user_id,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total,
           round(median(value), 6) AS med
    FROM events
    GROUP BY user_id
    """,
)
def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python extension surface: a custom grouped aggregate as a
    repartition-by-key + mapInPandas kernel.  The kernel sums in exact
    integer ten-thousandths (order-independent fixed-point, matching
    the engine's dsum/DECIMAL convention) — demonstrating that even
    Python operators keep the determinism contract.

    Shape matters at scale: ``groupBy(k).applyInPandas`` invokes Python
    once PER GROUP (~2ms of pandas/Arrow machinery each — measured 3-6s
    for 1500 groups on a no-op kernel, vs 0.9s for the JVM agg), which
    at lake-scale key cardinality (millions of users) is the whole
    runtime.  ``repartition(k)`` co-locates each key's rows, then ONE
    kernel per partition does a vectorized pandas groupby — Python
    invocations scale with partitions, not keys.  Two columns are
    projected before the shuffle: a Python kernel blocks column
    pruning, so the projection must be explicit."""
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events")

    def per_partition(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        vals = pdf["value"].to_numpy(dtype=np.float64)
        scaled = vals * 1e4
        cents = np.rint(scaled)
        # half-even ties: np.rint rounds the BINARY double; the decimal
        # contract rounds the exact decimal expansion. Near-tie values
        # get the exact (slow) treatment — vectorized over ALL rows of
        # the partition, not per group.
        near_tie = np.abs(np.abs(scaled - np.floor(scaled)) - 0.5) < 1e-7
        if near_tie.any():
            cents[near_tie] = [
                int(Decimal(f"{v:.4f}").scaleb(4)) for v in vals[near_tie]
            ]
        pdf = pdf.assign(__cents=cents.astype(np.int64))
        g = pdf.groupby("user_id", sort=False)
        agg = g.agg(
            n=("value", "size"),
            cents=("__cents", "sum"),
            med=("value", "median"),
        ).reset_index()
        yield pd.DataFrame(
            {
                "user_id": agg["user_id"],
                "n": agg["n"].astype(np.int64),
                "total": [
                    float(Decimal(int(c)).scaleb(-4)) for c in agg["cents"]
                ],
                "med": agg["med"].round(6),
            }
        )

    return (
        ev.select("user_id", "value")
        .repartition("user_id")
        .mapInPandas(per_partition, "user_id long, n long, total double, med double")
    )


@query(
    "q_multimodal_bytes",
    oracle="""
    SELECT doc_id,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS digest,
           CAST(ceil(octet_length(text::BLOB) / 256.0) AS BIGINT) AS n_chunks
    FROM documents
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column stats (pre-decode pass of the multimodal
    pipeline): byte length, digest, chunk count — documents' text bytes
    stand in for media content."""
    from transitdata_hfp_deduplicator_spark.operators.multimodal import (
        byte_stats,
        media_from_binary,
    )

    d = _t(spark, sf_dir, "documents")
    media = media_from_binary(d, "doc_id", "text", "text")
    stats = byte_stats(media, "content")
    return stats.select(
        F.col("media_id").alias("doc_id"), "n_bytes", "digest", "n_chunks"
    )


@query("q_multimodal_decode")
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal plumbing: binary envelope → mapInPandas decode
    (deterministic fake codec; NotImplementedError seam for real ones)
    → frame sampling. Rows-only (the fake codec is engine-internal)."""
    from transitdata_hfp_deduplicator_spark.operators.multimodal import (
        decode_media,
        frame_sample,
        media_from_binary,
    )

    d = _t(spark, sf_dir, "documents")
    media = media_from_binary(d, "doc_id", "text", "video")
    decoded = decode_media(media)
    return frame_sample(decoded, every_nth=2).select(
        "media_id", "width", "height", "n_frames", "frame_idx"
    )


# ---------------------------------------------------------------------------
# Coverage extras: pivot, approximate aggregates, UDTF
# ---------------------------------------------------------------------------


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_O,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_F,
           count(*) FILTER (l_linestatus = 'O') AS n_O,
           count(*) FILTER (l_linestatus = 'F') AS n_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation). Explicit pivot values so
    the plan is a single-pass aggregate — an unvalued pivot() triggers
    an extra distinct-scan of the pivot column."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            dsum(F.col("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
        F.col("O_n").alias("n_O"),
        F.col("F_n").alias("n_F"),
    )


@query("q_agg_approx")
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates: HLL++ distinct counts and quantile
    sketches — the sketch family every 100 TB pipeline leans on when
    exact distinct/quantile shuffles are unaffordable. Rows-only (HLL
    and GK sketches are engine-specific by construction); accuracy
    bounds asserted in tests."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.percentile_approx(
            "l_quantity", [0.25, 0.5, 0.75, 0.99], 10000
        ).alias("qty_quantiles"),
        F.count(F.lit(1)).alias("n"),
    )
    # Flatten the quantile sketch array to scalar columns: downstream
    # consumers (and the driver's canonicalizer) expect hashable cells.
    return agg.select(
        "l_returnflag",
        "approx_orders",
        "approx_parts",
        "approx_median_price",
        F.element_at("qty_quantiles", 1).alias("qty_p25"),
        F.element_at("qty_quantiles", 2).alias("qty_p50"),
        F.element_at("qty_quantiles", 3).alias("qty_p75"),
        F.element_at("qty_quantiles", 4).alias("qty_p99"),
        "n",
    )


@query(
    "q_agg_approx_check",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           TRUE AS orders_ok,
           TRUE AS parts_ok,
           TRUE AS price_med_ok,
           TRUE AS qty_p50_ok,
           TRUE AS qty_p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion to q_agg_approx: the sketch VALUES are
    engine-specific (rows-only over there), but their accuracy bounds
    are exact claims — each flag compares a sketch to the exact
    aggregate computed in the same plan, and the oracle asserts the
    exact group sizes plus all-flags-true.  A sketch drifting out of
    its published bound flips a flag and breaks the value hash — a
    real regression gate, not a tautology.  Bounds: HLL++ rsd*3 (4.7%
    default / 3% at rsd=0.01), percentile_approx(acc=10000) within a
    ±5-percentile exact-rank window (orders-of-magnitude looser than
    the 1/acc rank guarantee, tight enough to catch breakage)."""
    li = _t(spark, sf_dir, "lineitem")
    # two aggregations joined on the tiny group key, NOT one: mixing
    # multiple DISTINCT aggregates (Expand) with TypedImperativeAggregate
    # buffers (HLL / percentile digests) forces the whole plan onto the
    # sort-aggregate slow path — measured 17s vs 1.2s at sf0.01. Split,
    # each half stays in its fast path (Expand+hash / ObjectHashAggregate)
    # and the join is a broadcast over #groups rows.
    exact = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("x_orders"),
        F.countDistinct("l_partkey").alias("x_parts"),
    )
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a_med"),
        F.percentile_approx("l_quantity", [0.5, 0.99], 10000).alias("a_qty"),
        F.percentile(
            F.col("l_extendedprice"), F.array(F.lit(0.45), F.lit(0.55))
        ).alias("x_price"),
        F.percentile(
            F.col("l_quantity"),
            F.array(F.lit(0.45), F.lit(0.55), F.lit(0.98)),
        ).alias("x_qty"),
        F.max("l_quantity").alias("x_qty_max"),
    )
    agg = exact.join(F.broadcast(sketch), "l_returnflag")
    pct = 3 * 0.05  # 3 sigma at default rsd
    pct_parts = 3 * 0.01
    return agg.select(
        "l_returnflag",
        "n",
        (
            F.abs(F.col("a_orders") - F.col("x_orders"))
            <= pct * F.col("x_orders")
        ).alias("orders_ok"),
        (
            F.abs(F.col("a_parts") - F.col("x_parts"))
            <= pct_parts * F.col("x_parts")
        ).alias("parts_ok"),
        F.col("a_med").between(
            F.element_at("x_price", 1), F.element_at("x_price", 2)
        ).alias("price_med_ok"),
        F.element_at("a_qty", 1).between(
            F.element_at("x_qty", 1), F.element_at("x_qty", 2)
        ).alias("qty_p50_ok"),
        F.element_at("a_qty", 2).between(
            F.element_at("x_qty", 3), F.col("x_qty_max")
        ).alias("qty_p99_ok"),
    )


@query(
    "q_udtf",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST((i - 1) / 32 AS INT) AS chunk_idx,
           array_to_string(toks[i : least(i + 31, len(toks))], ' ') AS chunk,
           CAST(least(i + 31, len(toks)) - i + 1 AS INT) AS n_tokens
    FROM tok, LATERAL (SELECT unnest(range(1, len(toks) + 1, 32)) AS i)
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+): explodes each document
    into fixed-size token chunks with offsets — the row-generating
    extension surface (scalar/agg surfaces live in q_udf_surface) —
    hash-matched against a SQL LATERAL-unnest oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str, chunk_tokens: int):
            toks = text.split()
            for i in range(0, len(toks), chunk_tokens):
                chunk = toks[i : i + chunk_tokens]
                yield doc_id, i // chunk_tokens, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        "SELECT c.* FROM __docs_for_udtf d, "
        "LATERAL chunk_doc(d.doc_id, d.text, 32) c"
    )


# ---------------------------------------------------------------------------
# Custom stateful operator + canonicalization (reference A3, A5+A9 online)
# ---------------------------------------------------------------------------


@query(
    "q_dup_stats_stream",
    oracle="""
    WITH tagged AS (
        SELECT ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type, props
                   ORDER BY ts, event_id) AS rn,
               epoch_ms(ts) - min(epoch_ms(ts)) OVER (
                   PARTITION BY user_id, event_type, props) AS delay_ms
        FROM events
    )
    SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS window_start,
           count(*) FILTER (rn = 1) AS primes,
           count(*) FILTER (rn > 1) AS duplicates,
           CAST(sum(delay_ms) FILTER (rn > 1) AS BIGINT) AS sum_delay_ms
    FROM tagged
    GROUP BY 1
    """,
)
def q_dup_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL hot path online: custom stateful operator
    (applyInPandasWithState) tags every message prime/duplicate with
    its elapsed-since-first delay (Deduplicator.java:43-66), then the
    tumbling window computes the analytics metric set (Analytics.java:
    47-67) — and the result hash-matches the batch oracle."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        replay_shuffle_partitions,
        run_to_memory,
        scoped_shuffle_partitions,
    )
    from transitdata_hfp_deduplicator_spark.streaming.stateful import dedup_tag_stream

    src = os.path.join(sf_dir, "events.parquet")
    stream = parquet_stream(spark, src)
    # 30-day TTL >> the corpus span: no evictions during replay, so the
    # online result is comparable to the batch (infinite-cache) oracle
    tagged = dedup_tag_stream(
        stream, EVENT_IDENTITY, "ts", ttl_ms=30 * 24 * 3600 * 1000
    )
    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(src)):
        out = run_to_memory(tagged, output_mode="append")
    return (
        out.groupBy(
            (F.col("ts_ms") - (F.col("ts_ms") % 60000)).alias("win_ms")
        )
        .agg(
            F.count_if(F.col("is_prime")).alias("primes"),
            F.count_if(~F.col("is_prime")).alias("duplicates"),
            F.sum(F.when(~F.col("is_prime"), F.col("delay_ms"))).alias(
                "sum_delay_ms"
            ),
        )
        .select(
            (F.col("win_ms") / 1000).cast("bigint").alias("window_start"),
            "primes",
            "duplicates",
            "sum_delay_ms",
        )
    )


@query(
    "q_canonical_dedup",
    oracle="""
    WITH enc AS (
      SELECT event_id, user_id,
             encode(event_type) AS et, encode(props) AS pr,
             octet_length(encode(event_type)) AS let,
             octet_length(encode(props)) AS lpr
      FROM events
    ), hx AS (
      SELECT event_id,
        '08'
        || CASE WHEN user_id < 128 THEN lpad(lower(hex(user_id)), 2, '0')
                WHEN user_id < 16384 THEN
                  lpad(lower(hex((user_id % 128) + 128)), 2, '0')
                  || lpad(lower(hex(user_id // 128)), 2, '0')
                ELSE
                  lpad(lower(hex((user_id % 128) + 128)), 2, '0')
                  || lpad(lower(hex(((user_id // 128) % 128) + 128)), 2, '0')
                  || lpad(lower(hex(user_id // 16384)), 2, '0') END
        || '12'
        || CASE WHEN let < 128 THEN lpad(lower(hex(let)), 2, '0')
                ELSE lpad(lower(hex((let % 128) + 128)), 2, '0')
                     || lpad(lower(hex(let // 128)), 2, '0') END
        || lower(hex(et))
        || '1a'
        || CASE WHEN lpr < 128 THEN lpad(lower(hex(lpr)), 2, '0')
                ELSE lpad(lower(hex((lpr % 128) + 128)), 2, '0')
                     || lpad(lower(hex(lpr // 128)), 2, '0') END
        || lower(hex(pr)) AS canon_hex
      FROM enc
    )
    SELECT sha256(canon_hex) AS identity,
           count(*) AS n_msgs,
           min(event_id) AS first_id
    FROM hx
    GROUP BY canon_hex
    """,
)
def q_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization (A3) end-to-end: each event is wire-encoded as a
    protobuf-shaped envelope in a per-row-scrambled field order, then
    canonicalized (sorted field re-emit) and deduped on the canonical
    digest — proving identity is independent of serialization order,
    the exact property Deduplicator.java:69 re-encodes for.
    Hash-checked: the oracle rebuilds the SAME canonical wire bytes
    (tag-ordered varint fields) as a hex string in SQL and sha256s it
    — identity is over the hex image of the bytes (injective), because
    DuckDB's sha256 only accepts VARCHAR.  Byte-level codec semantics
    additionally pinned in tests/test_canonicalize.py."""
    from collections.abc import Iterator

    import pandas as pd

    from transitdata_hfp_deduplicator_spark.operators.canonicalize import (
        _write_varint,
        with_canonical_payload,
    )

    ev = _t(spark, sf_dir, "events")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fields_of(r):
            f1 = b"\x08" + _write_varint(int(r.user_id))
            et = r.event_type.encode()
            f2 = b"\x12" + _write_varint(len(et)) + et
            pr = r.props.encode()
            f3 = b"\x1a" + _write_varint(len(pr)) + pr
            fields = [f1, f2, f3]
            rot = int(r.event_id) % 3  # deterministic per-row scramble
            return b"".join(fields[rot:] + fields[:rot])

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "value": [fields_of(r) for r in pdf.itertuples()],
                }
            )

    enveloped = ev.mapInPandas(encode, "event_id long, value binary")
    canon = with_canonical_payload(enveloped)
    return (
        canon.groupBy(
            F.sha2(F.lower(F.hex("canonical")), 256).alias("identity")
        )
        .agg(F.count(F.lit(1)).alias("n_msgs"), F.min("event_id").alias("first_id"))
    )


# ---------------------------------------------------------------------------
# HFP golden parity + sliding windows + unpivot
# ---------------------------------------------------------------------------

HFP_CORPUS = "/root/reference/src/integration-test/resources/hfp-5000.txt"


@query(
    "q_hfp_golden",
    oracle=r"""
    WITH lines AS (
        SELECT column0 AS line
        FROM read_csv('/root/reference/src/integration-test/resources/hfp-5000.txt',
                      sep=e'\x01', header=false, quote='',
                      columns={'column0': 'VARCHAR'})
    ),
    parsed AS (
        SELECT trim(substr(line, instr(line, ' ') + 1,
                    instr(line, '{') - instr(line, ' ') - 1)) AS topic,
               substr(line, instr(line, '{')) AS payload
        FROM lines
    )
    SELECT count(*) AS n_messages,
           count(DISTINCT topic || ' ' || payload) AS n_unique,
           count(DISTINCT topic) AS n_topics
    FROM parsed
    """,
)
def q_hfp_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's golden test as a declared query: parse the REAL
    5000-message HFP corpus (first-space/first-brace rule,
    ITDeduplicatorTest.java:138-148) and count uniques by
    topic+payload identity — must be exactly 5000 -> 4956
    (ITDeduplicatorTest.java:92-93). The oracle re-parses the same
    file in SQL."""
    from transitdata_hfp_deduplicator_spark.sources import hfp

    corpus = hfp.read_corpus(spark, HFP_CORPUS)
    ident = hfp.dedup_identity(corpus)
    return ident.agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.countDistinct("identity").alias("n_unique"),
        F.countDistinct("topic").alias("n_topics"),
    )


@query(
    "q_window_sliding",
    oracle="""
    SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) - 60 * k.k AS window_start,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
    FROM events, (SELECT unnest([0, 1, 2, 3, 4]) AS k) k
    GROUP BY 1
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (5-minute window, 1-minute slide): each event
    lands in 5 windows — Spark's window() with a slide; the oracle
    replicates the assignment with an offset cross join."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes", "1 minute").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           round(l_quantity, 4) AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', round(l_extendedprice, 4) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 4) FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack(): one scan emitting 3 rows per
    input row — no self-union, the table is read once."""
    li = _t(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', round(l_quantity, 4),"
        " 'price', round(l_extendedprice, 4),"
        " 'discount', round(l_discount, 4)) AS (measure, value)",
    )


@query(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE pairs AS (
        WITH sh AS (
            SELECT doc_id,
                   list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                                  for i in range(1, len(tokens) - 1)]) AS shingles
            FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tokens
                  FROM documents)
            WHERE len(tokens) >= 3
        ),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        inter AS (
            SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT i, j
        FROM inter
        JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa ON i = sa.doc_id
        JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb ON j = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    ),
    edges AS (SELECT i AS a, j AS b FROM pairs
              UNION SELECT j, i FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT d.doc_id,
           coalesce(least(m.mn, d.doc_id), d.doc_id) AS cluster_id,
           coalesce(least(m.mn, d.doc_id), d.doc_id) = d.doc_id AS is_canonical
    FROM documents d
    LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m
           ON d.doc_id = m.a
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP formation: exact-Jaccard pairs (J>=0.5) →
    connected components (iterative min-label propagation) → canonical
    survivor per cluster (min doc_id — first-wins applied to groups).
    The oracle computes the same components with a recursive CTE."""
    from transitdata_hfp_deduplicator_spark.operators.clusters import dedup_clusters
    from transitdata_hfp_deduplicator_spark.operators.similarity import jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.5)
    return dedup_clusters(d, pairs)


@query(
    "q_embed_neardup",
    oracle="""
    SELECT a.vec_id AS i, b.vec_id AS j,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                6) >= 0.45
    """,
)
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cos >= 0.45) — the last
    of the five near-dup families, ground truth for the RP-LSH path."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import (
        cosine_dup_pairs,
    )

    e = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs(e, threshold=0.45)


@query("q_embed_neardup_rplsh")
def q_embed_neardup_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH cosine near-dup (banded sign bits ->
    posting-list candidates -> exact verify) — the linear-scale path.
    Rows-only: the LSH false-negative tail is probabilistic; recall is
    asserted on clustered data in tests."""
    from transitdata_hfp_deduplicator_spark.operators.similarity import rp_lsh_pairs

    e = _t(spark, sf_dir, "embeddings")
    return rp_lsh_pairs(e, threshold=0.45)


# ---------------------------------------------------------------------------
# Streaming joins
# ---------------------------------------------------------------------------


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT e1.event_id AS purchase_id, e2.event_id AS error_id,
           e1.user_id, epoch_ms(e2.ts) - epoch_ms(e1.ts) AS gap_ms
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
    WHERE e1.event_type = 'purchase' AND e2.event_type = 'error'
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time bounds: errors within
    30min after a purchase, both sides streaming with watermarks (the
    state-store-backed join — each side buffers rows until the
    watermark passes the time bound). Same semantics as the batch
    range join q_join_theta_range, so the same oracle applies."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        run_to_memory,
    )

    src = os.path.join(sf_dir, "events.parquet")
    p = (
        parquet_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    e = (
        parquet_stream(spark, src)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = p.join(
        e,
        (p.user_id == e.e_user_id)
        & (e.e_ts > p.p_ts)
        & (e.e_ts <= p.p_ts + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "purchase_id",
        "error_id",
        "user_id",
        (F.unix_millis("e_ts") - F.unix_millis("p_ts")).alias("gap_ms"),
    )
    from transitdata_hfp_deduplicator_spark.streaming.runner import (
        replay_shuffle_partitions,
        scoped_shuffle_partitions,
    )

    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(src)):
        return run_to_memory(joined, "append")


@query(
    "q_stream_static_join",
    oracle="""
    WITH user_totals AS (
        SELECT user_id,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS user_total
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, u.n_events, u.user_total
    FROM events e JOIN user_totals u ON e.user_id = u.user_id
    WHERE e.event_type = 'purchase'
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream enriched against a static (batch) dimension: purchases
    joined to per-user batch aggregates — the static side is planned as
    a broadcast per micro-batch, no stream state needed."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        run_to_memory,
    )
    from transitdata_hfp_deduplicator_spark.tables import read_parquet

    src = os.path.join(sf_dir, "events.parquet")
    static_totals = (
        read_parquet(spark, src)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("user_total"),
        )
    )
    stream = parquet_stream(spark, src).filter(F.col("event_type") == "purchase")
    joined = stream.join(F.broadcast(static_totals), "user_id").select(
        "event_id", "user_id", "n_events", "user_total"
    )
    return run_to_memory(joined, "append")


@query(
    "q_hfp_domain",
    oracle=r"""
    WITH lines AS (
        SELECT column0 AS line
        FROM read_csv('/root/reference/src/integration-test/resources/hfp-5000.txt',
                      sep=e'\x01', header=false, quote='',
                      columns={'column0': 'VARCHAR'})
    ),
    parsed AS (
        SELECT trim(substr(line, instr(line, ' ') + 1,
                    instr(line, '{') - instr(line, ' ') - 1)) AS topic,
               substr(line, instr(line, '{')) AS payload
        FROM lines
    ),
    decoded AS (
        SELECT string_split(topic, '/')[4] AS journey_type,
               string_split(topic, '/')[6] AS transport_mode,
               CAST(json_extract(payload, '$.VP.spd') AS DOUBLE) AS spd,
               CAST(json_extract(payload, '$.VP.veh') AS BIGINT) AS veh,
               CAST(json_extract(payload, '$.VP.tsi') AS BIGINT) AS tsi
        FROM parsed
    )
    SELECT journey_type, transport_mode,
           count(*) AS n,
           count(DISTINCT veh) AS n_vehicles,
           round(CAST(SUM(CAST(spd AS DECIMAL(30,6))) AS DOUBLE)
                 / count(spd), 4) AS avg_speed,
           min(tsi) AS first_tsi,
           max(tsi) AS last_tsi
    FROM decoded
    GROUP BY 1, 2
    """,
)
def q_hfp_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full HFP domain decode (reference data model, SURVEY.md §1.3):
    hierarchical topic -> named parts, VP JSON -> typed 18-field
    struct, then per-(journey_type, transport_mode) fleet stats. The
    oracle re-parses topic and JSON in SQL over the same corpus."""
    from transitdata_hfp_deduplicator_spark.sources import hfp

    corpus = hfp.with_vp(hfp.with_topic_struct(hfp.read_corpus(spark, HFP_CORPUS)))
    n_spd = F.count("vp.spd")
    return (
        corpus.groupBy(
            F.col("topic_parts.journey_type").alias("journey_type"),
            F.col("topic_parts.transport_mode").alias("transport_mode"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.col("vp.veh").cast("bigint")).alias("n_vehicles"),
            F.round(
                F.sum(F.col("vp.spd").cast("decimal(30,6)")).cast("double") / n_spd, 4
            ).alias("avg_speed"),
            F.min(F.col("vp.tsi")).alias("first_tsi"),
            F.max(F.col("vp.tsi")).alias("last_tsi"),
        )
    )


@query(
    "q_text_editdist",
    oracle="""
    SELECT a.p_partkey AS i, b.p_partkey AS j,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 8
      AND levenshtein(a.p_name, b.p_name) <= 8
    """,
)
def q_text_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs, brand-blocked: the blocking key
    turns an all-pairs O(n^2 * m^2) comparison into per-block work — the
    standard entity-resolution scale pattern (block -> compare ->
    threshold)."""
    p = _t(spark, sf_dir, "part")

    def side(idc, suffix):
        return p.select(
            F.col("p_partkey").alias(idc),
            F.col("p_brand").alias(f"brand_{suffix}"),
            F.col("p_name").alias(f"name_{suffix}"),
            F.split(F.col("p_name"), " ").getItem(0).alias(f"tok_{suffix}"),
            F.length("p_name").alias(f"len_{suffix}"),
        )

    a, b = side("i", "a"), side("j", "b")
    return (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("tok_a") == F.col("tok_b"))  # second blocking key
            & (F.col("i") < F.col("j")),
        )
        # levenshtein(a,b) >= |len(a)-len(b)|: prune before the O(nm) DP
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= 8)
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 8)
        .select("i", "j", "dist")
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
               round(o_totalprice * 1.1, 4) AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 4) AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 <> 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 4) AS o_totalprice, o_orderpriority
    FROM updates
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation (anti-join + union): a synthetic change set
    (even order keys repriced, status X) upserted into orders — the
    snapshot-refresh primitive of a training-data pipeline, without a
    lakehouse table format."""
    from transitdata_hfp_deduplicator_spark.operators.upsert import merge_upsert

    o = _t(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(o, updates, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderpriority",
    )


# ---------------------------------------------------------------------------
# Time-series: batch sessionization and gap-fill (operators/timeseries.py)
# ---------------------------------------------------------------------------


@query(
    "q_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(epoch_ms(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) > 600000
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ), s AS (
        SELECT user_id, ts, value,
               CAST(sum(brk) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM g
    )
    SELECT user_id, session_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts)) AS session_end_ms,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions split at >10 min
    inactivity gaps (batch mirror of q_session_window's streaming
    ``session_window``).  One shuffle on user_id; lag, running sum,
    and the session rollup all reuse it."""
    from transitdata_hfp_deduplicator_spark.operators.timeseries import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(
        ev,
        ["user_id"],
        "ts",
        gap="10 minutes",
        order_tiebreak=["event_id"],
        aggs=[dsum(F.col("value")).alias("sum_value")],
    )


@query(
    "q_gapfill",
    oracle="""
    WITH by_hour AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                     / count(*), 4) AS avg_value
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT event_type, date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events GROUP BY 1
    ), grid AS (
        SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM span
    )
    SELECT g.event_type, epoch_ms(g.h) AS hour_ms,
           coalesce(b.n_events, 0) AS n_events,
           last_value(b.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ffill
    FROM grid g LEFT JOIN by_hour b ON g.event_type = b.event_type AND g.h = b.h
    """,
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill/resample (TimescaleDB ``time_bucket_gapfill`` + locf):
    hourly event counts per type densified onto the full grid, counts
    zero-filled, average value carried forward.  Grid is generated per
    GROUP with ``sequence()`` — O(types x hours), not O(rows)."""
    from transitdata_hfp_deduplicator_spark.operators.timeseries import gapfill

    ev = _t(spark, sf_dir, "events")
    out = gapfill(
        ev,
        ["event_type"],
        "ts",
        bucket="1 hour",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(davg(F.col("value"), F.count(F.lit(1))), 4).alias("avg_value"),
        ],
        zero_fill=["n_events"],
        ffill=["avg_value"],
    )
    return out.select(
        "event_type",
        F.unix_millis("_bucket").alias("hour_ms"),
        "n_events",
        F.col("avg_value").alias("avg_value_ffill"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / splits (operators/sampling.py)
# ---------------------------------------------------------------------------


@query(
    "q_split_hash",
    oracle="""
    WITH tagged AS (
        SELECT *,
               CASE WHEN (l_orderkey * 9973 + l_linenumber * 31) % 100 < 80
                    THEN 'train'
                    WHEN (l_orderkey * 9973 + l_linenumber * 31) % 100 < 90
                    THEN 'valid'
                    ELSE 'test' END AS split
        FROM lineitem
    )
    SELECT split, l_returnflag, count(*) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE),
                 4) AS sum_price
    FROM tagged GROUP BY split, l_returnflag
    """,
)
def q_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/valid/test split: a multiplicative key hash
    assigns each lineitem a split independent of partitioning and RNG
    (operators/sampling.py), audited per stratum."""
    from transitdata_hfp_deduplicator_spark.operators.sampling import (
        hash_split,
        stratified_counts,
    )

    li = _t(spark, sf_dir, "lineitem")
    tagged = hash_split(li, ["l_orderkey", "l_linenumber"])
    audit = stratified_counts(tagged, "split", ["l_returnflag"])
    extra = tagged.groupBy("split", "l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(dsum(F.col("l_extendedprice")), 4).alias("sum_price"),
    )
    return audit.join(extra, ["split", "l_returnflag"])


# ---------------------------------------------------------------------------
# Exact percentiles, ordered string agg, scalar subquery, histogram
# ---------------------------------------------------------------------------


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS median_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (``percentile``, not ``percentile_approx``):
    quartiles of quantity + median price per return flag.  Exact
    percentile sorts within each group's hash-agg buffer — fine for
    bounded group counts; the sketch route is q_agg_approx."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.50).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.round(F.percentile("l_extendedprice", 0.50), 4).alias("median_price"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_customers,
           string_agg(c.c_name, '|' ORDER BY c.c_name) AS names
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY n.n_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): building-segment customer
    names per nation, sorted then joined — collect_list is unordered
    in a distributed agg, so the deterministic form is
    array_sort-then-join."""
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    na = _t(spark, sf_dir, "nation")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names"),
        )
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(30,4)))
                        AS DOUBLE) / count(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
    FROM orders o
    WHERE o_totalprice >
          (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(30,4)))
                       AS DOUBLE) / count(*)
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, Spark-first: the per-customer
    average is a grouped aggregate joined back on the key (Catalyst
    de-correlates the SQL form into exactly this plan), then a filter
    against the correlated value."""
    o = _t(spark, sf_dir, "orders")
    ca = o.groupBy("o_custkey").agg(
        davg(F.col("o_totalprice"), F.count(F.lit(1))).alias("cust_avg")
    )
    return (
        o.join(ca, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


@query(
    "q_histogram",
    oracle="""
    WITH stats AS (
        SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - mn) / (mx - mn) * 20), 19)
                AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE),
                 4) AS sum_price
    FROM orders, stats
    GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: global min/max (tiny agg,
    broadcast back) then 20-bucket binning — the profiling primitive
    behind quality-score distributions."""
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = o.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * 20
            ),
            F.lit(19),
        ).alias("bucket"),
        "o_totalprice",
    )
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(dsum(F.col("o_totalprice")), 4).alias("sum_price"),
    )


@query("q_dedup_lru")
def q_dedup_lru(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-bound LRU dedup — the reference A6's ACTUAL eviction
    semantics (Guava ``maximumSize(250000)``, Deduplicator.java:36-40;
    its cacheTTL config is read but never applied) as a custom stateful
    operator, capacity sharded across hash buckets.  The replay uses a
    cap far below the unique-key count so eviction + re-emission
    genuinely happen (the reference forgets evicted keys and
    re-forwards them — at-least-once by design).  Rows-only: the
    re-emission count depends on eviction order, which is
    engine-specific by construction (the reference's own depended on
    unreproducible wall-clock arrival).  Semantics are pinned in
    tests/test_lru_state.py."""
    import os

    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        replay_shuffle_partitions,
        run_to_memory,
        scoped_shuffle_partitions,
    )
    from transitdata_hfp_deduplicator_spark.streaming.lru_state import (
        lru_dedup_stream,
    )

    src = os.path.join(sf_dir, "events.parquet")
    stream = parquet_stream(spark, src)
    tagged = lru_dedup_stream(
        stream, EVENT_IDENTITY, "ts", max_size=4096, buckets=8
    )
    with scoped_shuffle_partitions(spark, replay_shuffle_partitions(src)):
        out = run_to_memory(tagged, output_mode="append")
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("is_prime")).alias("n_primes"),
        F.count_if(~F.col("is_prime")).alias("n_duplicates"),
        F.countDistinct("digest").alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# Driver-gate ordering
# ---------------------------------------------------------------------------

# The driver walks queries() in dict order under a time budget; round 1's
# CORRECTNESS file truncated after 50 entries, leaving green queries with
# no evidence row.  Register cheap oracle-checked queries first so a
# budget cut lands after everything fast is recorded; the replay-harness
# and similarity-heavy queries (the per-query cost is micro-batch fixed
# overhead / candidate verification, not data volume at gate SF) go last.
# Ascending by measured sf0.01 wall cost (tools/check_oracle.py split
# timings, 2026-08-13), so a driver time-budget cut records the largest
# possible prefix.  q_dup_stats and q_udf_surface left the list once
# their kernels went sub-second.
GATE_HEAVY = [
    "q_agg_approx",
    "q_dedup_lru",
    "q_text_editdist",
    "q_window_tumbling_stream",
    "q_dedup_minhash_lsh",
    "q_embed_neardup_rplsh",
    "q_late_data",
    "q_minhash_simdup",
    "q_session_window_stream",
    "q_dedup_clusters",
    "q_dup_stats_stream",
    "q_dedup_stream",
    "q_dedup_simhash",
    "q_stream_stream_join",
    "q_embed_neardup",
]


def gate_ordered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES reordered cheap-first / heavy-last for the driver gate."""
    ordered = {n: f for n, f in QUERIES.items() if n not in GATE_HEAVY}
    ordered.update({n: QUERIES[n] for n in GATE_HEAVY if n in QUERIES})
    return ordered
