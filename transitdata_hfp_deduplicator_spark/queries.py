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
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_type"), "BRASS").alias("brass_pos"),
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
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(dayofweek(ts) AS INT) AS dow,
           epoch_ms(ts) AS ts_ms,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
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
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.unix_millis("ts").alias("ts_ms"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
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
