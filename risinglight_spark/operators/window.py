"""Window functions, including the reference's running-aggregate
OVER() semantics.

Reference: src/executor/window.rs:16-34; binder/expr.rs:452-481.
Key semantic quirk: the reference evaluates *any aggregate* used as a
window function as a **running aggregate in input order** — ``sum(a)
OVER ()`` over rows 1,2,3 yields 1,3,6, not the SQL-standard 6,6,6
(reference test: tests/sql/window_function.slt:22-27).  That order is
only well-defined because the reference is single-threaded; the
distributed-safe translation pins an explicit ORDER BY with
``rowsBetween(unboundedPreceding, currentRow)``.

Scale: window over PARTITION BY shuffles once on the partition key and
sorts within partitions — at 100 TB the partition key must have enough
cardinality (user_id, orderkey — yes; a constant — no).  The
whole-table running sum (OVER () in the reference) is inherently
sequential and is only offered pinned-by-key here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from risinglight_spark.operators import Tables
from risinglight_spark.registry import register


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           count(*) OVER (ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS running_cnt
    FROM orders
    WHERE o_custkey < 50
    """,
    doc="Aggregate-as-window with running semantics "
    "(ref: window_function.slt:22-27 — 1,3,6 not 6,6,6), order pinned by "
    "the unique key; exact-decimal accumulation so every prefix matches.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.filter(F.col("o_custkey") < 50).select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.count("*").over(w).alias("running_cnt"),
    )


@register(
    "window_row_number",
    oracle="""
    SELECT c_nationkey, c_custkey,
           row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer
    """,
    doc="row_number() (ref: planner/mod.rs:88 RowNumber; "
    "executor/window.rs) with partitioning — shuffles once by nation.",
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return t.customer.select(
        "c_nationkey", "c_custkey", F.row_number().over(w).alias("rn")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk
    FROM orders
    WHERE o_custkey < 100
    """,
    doc="rank/dense_rank — beyond the reference surface (it only has "
    "row_number + aggregates, binder/expr.rs:462-468); included because "
    "Spark provides them natively (documented superset).",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return t.orders.filter(F.col("o_custkey") < 100).select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_partition_agg",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_orderkey)
                AS DOUBLE) AS order_qty,
           max(l_quantity) OVER (PARTITION BY l_orderkey) AS max_qty
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    doc="Whole-partition aggregate window (SQL-standard frame) — the "
    "semantics Spark/DuckDB give OVER(PARTITION BY) without ORDER BY; "
    "contrast with window_running_sum which reproduces the reference's "
    "running frame.",
)
def window_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("l_orderkey")
    return t.lineitem.filter(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("order_qty"),
        F.max("l_quantity").over(w).alias("max_qty"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    WHERE user_id < 100
    """,
    doc="lag/lead over event streams (superset of the reference window "
    "surface; core of sessionization pipelines).",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.filter(F.col("user_id") < 100).select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_rows_sliding_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving_sum,
           count(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_n
    FROM events WHERE user_id < 40
    """,
    doc="Explicit ROWS sliding frame (3-row moving sum/count) — frame "
    "semantics beyond the reference's implicit running frame "
    "(window_function.slt); decimal-cast sum keeps doubles "
    "order-independent.",
)
def window_rows_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return t.events.filter(F.col("user_id") < 40).select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("moving_sum"),
        F.count("value").over(w).alias("moving_n"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
             AS near_price_orders
    FROM orders WHERE o_custkey < 200
    """,
    doc="RANGE frame (value-based window: orders within +-1000 of the "
    "current price per customer) — the value-range frame class the "
    "reference lacks entirely.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python rangeBetween only takes ints/unbounded; the double-valued
    # RANGE frame goes through the SQL window syntax.
    from risinglight_spark.operators import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 1000.0 PRECEDING
                                        AND 1000.0 FOLLOWING)
                 AS near_price_orders
        FROM orders WHERE o_custkey < 200
        """
    )


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders WHERE o_orderkey < 2000
    """,
    doc="ntile(4): equi-depth bucketing per priority class — the "
    "windowed analog of the percentile cut; total order (orderkey "
    "tiebreak) keeps it deterministic at any parallelism.",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        t.orders.filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", F.ntile(4).over(w).alias("quartile"))
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value / last_value / nth_value over an explicit "
    "full-partition frame (the default frame would make last_value "
    "degenerate to the current row).  Deterministic via the "
    "(orderdate, orderkey) total order.",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 10) AS pr,
           round(cume_dist() OVER w, 10) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
    doc="percent_rank / cume_dist relative-position window functions. "
    "Both are functions of the value ordering alone, so ties in "
    "o_totalprice are deterministic without a full tie-break.",
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return t.orders.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 10).alias("pr"),
        F.round(F.cume_dist().over(w), 10).alias("cd"),
    )


@register(
    "window_exclude_current",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE)
                               * 100000000.0, 0) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW
           ) AS DOUBLE) / 100000000.0 AS peers_total,
           count(*) OVER (
             PARTITION BY o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW
           ) AS n_peers
    FROM orders
    """,
    doc="Window frame EXCLUDE CURRENT ROW (leave-one-out peer "
    "aggregates — the shape behind target encoding without self-"
    "leakage): DuckDB runs the SQL:2011 EXCLUDE clause natively (the "
    "oracle); Spark has no EXCLUDE, so the engine applies the "
    "algebraic rewrite agg(frame) - agg(current row) — one full-frame "
    "window minus the row's own contribution.  BOTH engines use the "
    "same fixed-point discipline (round(x*1e8) summed as int64 — the "
    "fpsum pattern), so frame-sum minus own-contribution is exact "
    "integer arithmetic and the results are bit-identical at any "
    "parallelism; same single partition-key shuffle either way.",
)
def window_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = F.round(F.col("o_totalprice").cast("double") * 1e8, 0).cast(
        "long"
    )
    n_peers = F.count("*").over(w) - F.lit(1)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        # SQL semantics: an aggregate over an EMPTY excluded frame is
        # NULL (sum), so a single-row partition must not yield 0.0.
        F.when(
            n_peers > 0,
            (F.sum(scaled).over(w) - scaled).cast("double") / F.lit(1e8),
        ).alias("peers_total"),
        n_peers.alias("n_peers"),
    )
