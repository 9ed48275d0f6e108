"""Aggregation operators: simple (no-group), hash-grouped, sorted-input,
and the reference's aggregate-function surface (count/sum/min/max/avg,
count distinct, first/last).

Reference: src/executor/{simple_agg,hash_agg,sort_agg}.rs; aggregate
state machine src/executor/evaluator.rs:171-291; complete function list
src/binder/expr.rs:436-453.

Scale: every groupBy below gets map-side partial aggregation from
Catalyst (the `partial_...` / `finalmerge_...` pair in the plan), so the
shuffle carries one row per (partition, group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risinglight_spark.operators import Tables, davg, davg_sql, dsum, dsum_sql
from risinglight_spark.registry import register


@register(
    "agg_simple",
    oracle=f"""
    SELECT count(*) AS cnt,
           {dsum_sql('l_quantity')} AS sum_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem
    """,
    doc="No-group aggregation -> single row (ref: simple_agg.rs:15-28).",
)
def agg_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    q = F.col("l_quantity")
    return t.lineitem.agg(
        F.count("*").alias("cnt"),
        dsum(q).alias("sum_qty"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
    )


@register(
    "agg_hash_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash aggregation keyed by group values (ref: hash_agg.rs:21-55).",
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
    )


@register(
    "agg_sorted_key",
    oracle=f"""
    SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="Grouping by the clustering key — the reference picks a streaming "
    "SortAgg (sort_agg.rs:12-50); Catalyst picks hash-agg or sort-agg by "
    "cost, identical semantics.",
)
def agg_sorted_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_orderkey").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "count_star_and_col",
    oracle="""
    SELECT count(*) AS cnt_all,
           CAST(count(o_totalprice) AS INT) AS cnt_price,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS INT) AS cnt_open
    FROM orders
    """,
    doc="count(*) vs count(x): the reference returns Int32 for count(x) "
    "(evaluator.rs:238) — cast to INT on both sides for type parity.",
)
def count_star_and_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.agg(
        F.count("*").alias("cnt_all"),
        F.count("o_totalprice").cast("int").alias("cnt_price"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).cast("int").alias("cnt_open"),
    )


@register(
    "count_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio
    FROM orders
    """,
    doc="Exact distinct count via HashSet state (ref: evaluator.rs:246-255). "
    "Spark expands to a two-phase exact distinct aggregate (NOT "
    "approx_count_distinct, which would not be parity).",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@register(
    "avg_rewrite",
    oracle=f"""
    SELECT o_orderpriority,
           {davg_sql('o_totalprice')} AS avg_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="avg -> sum/count rewrite (ref: binder/expr.rs:443-447, "
    "rules/expr.rs:99), with the decimal-sum determinism trick.",
)
def avg_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        davg(F.col("o_totalprice")).alias("avg_price"), F.count("*").alias("n")
    )


@register(
    "first_last_pinned",
    oracle="""
    SELECT c_nationkey,
           arg_min(c_name, c_custkey) AS first_name,
           arg_max(c_name, c_custkey) AS last_name
    FROM customer GROUP BY c_nationkey
    """,
    doc="first()/last() in the reference take the first/last non-null in "
    "stream order (evaluator.rs:242-243) — only deterministic because the "
    "reference is single-threaded.  The distributed-safe pin is "
    "min_by/max_by over an explicit order key, which is what a correct "
    "migration of such queries needs at scale.",
)
def first_last_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.groupBy("c_nationkey").agg(
        F.min_by("c_name", "c_custkey").alias("first_name"),
        F.max_by("c_name", "c_custkey").alias("last_name"),
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders, {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 15
    """,
    doc="GROUP BY + HAVING (ref test: tests/sql/having.slt); HAVING is a "
    "post-aggregation filter on both engines.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice")).alias("total"))
        .filter(F.col("n_orders") > 15)
    )


@register(
    "agg_min_max_types",
    oracle="""
    SELECT min(CAST(o_orderdate AS DATE)) AS min_date,
           max(CAST(o_orderdate AS DATE)) AS max_date,
           min(o_orderpriority) AS min_s, max(o_orderpriority) AS max_s,
           min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
    FROM orders
    """,
    doc="min/max across date, string, and integer types "
    "(ref: evaluator.rs:240-241 over all array kinds).",
)
def agg_min_max_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
        F.min("o_orderpriority").alias("min_s"),
        F.max("o_orderpriority").alias("max_s"),
        F.min("o_orderkey").alias("min_k"),
        F.max("o_orderkey").alias("max_k"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="GROUP BY ROLLUP (subtotals + grand total) — a grouping-sets "
    "class the reference lacks; one pass, grouping-id expansion "
    "map-side.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="GROUP BY CUBE — all grouping-set combinations in one pass.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click_n,
           count(*) FILTER (event_type = 'view') AS view_n,
           count(*) FILTER (event_type = 'error') AS error_n
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    """,
    doc="PIVOT (wide per-key counts by category) — rendered as "
    "conditional aggregation, which is also exactly how Spark executes "
    "a pivot with explicit values (no extra pass).",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).alias("click_n"),
            F.coalesce("view", F.lit(0)).alias("view_n"),
            F.coalesce("error", F.lit(0)).alias("error_n"),
        )
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 10) AS p50,
           round(quantile_cont(value, 0.95), 10) AS p95
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="Exact linear-interpolated percentiles per group (Spark "
    "percentile == DuckDB quantile_cont; rounded to 10 decimals for "
    "last-ulp interpolation differences).",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.percentile(F.col("value"), F.lit(0.5)), 10).alias("p50"),
            F.round(F.percentile(F.col("value"), F.lit(0.95)), 10).alias(
                "p95"
            ),
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, count(*) AS n,
           (CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100000000.0, 0)
                AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="Two-phase salted aggregation for skewed keys: phase 1 groups "
    "on (key, salt16) spreading each hot key over 16 reducers, phase 2 "
    "merges the partials.  Fixed-point sums make the result identical "
    "to the direct groupBy (the oracle) regardless of salt routing — "
    "the skew-mitigation pattern when one key dominates at 100 TB.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    salted = t.events.withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(16))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(
            F.round(F.col("value").cast("double") * 1e8, 0).cast("long")
        ).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        (F.sum("psum").cast("double") / F.lit(1e8)).alias("sum_value"),
    )


def _approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL++ estimates (engine-specific values; used by the
    registry entry's bound check and by tests/test_plans.py)."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           true AS within_bound
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) per event type — the "
    "constant-memory cardinality sketch that replaces exact "
    "count(distinct) at 100 TB.  Sketch VALUES are engine-specific, "
    "so the checkable contract is the estimate's ERROR BOUND: the "
    "output carries the exact distinct count plus a boolean asserting "
    "the HLL estimate landed within max(5%, 2) of it — which the "
    "DuckDB oracle replays as a literal (the row only hashes equal if "
    "the bound really held).  Same decomposition for every sketch "
    "entry: estimates stay rows-only nowhere, bounds become "
    "hash-verifiable.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact + sketch in ONE groupBy (no join): a NULL event_type group
    # would be silently dropped by an equi-join on the group key, while
    # both engines' GROUP BY retain it
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.01)
                - F.count_distinct("user_id")
            )
            <= F.greatest(0.05 * F.count_distinct("user_id"), F.lit(2))
        ).alias("within_bound"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus)::INT AS g_status,
           GROUPING(o_orderpriority)::INT AS g_prio,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="GROUPING() markers on rollup rows — distinguishes 'NULL "
    "because subtotal' from 'NULL in the data', required for correct "
    "report rendering over grouping sets.",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("n"),
    ).select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")


@register(
    "agg_stats_library",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd_samp,
           round(stddev_pop(value), 6) AS sd_pop,
           round(var_samp(value), 6) AS var_samp,
           round(var_pop(value), 6) AS var_pop,
           round(corr(value, user_id), 6) AS corr_vu,
           round(covar_samp(value, user_id), 6) AS cov_samp,
           round(covar_pop(value, user_id), 6) AS cov_pop,
           round(median(value), 6) AS med
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="Statistical aggregate library: stddev/variance (sample+pop), "
    "corr, covariance, median — all single-pass JVM aggregates "
    "(median = exact interpolated percentile, matching DuckDB). "
    "Rounded to 6 decimals: Spark's streaming (Welford) moments vs "
    "DuckDB's differ in last-ulp association order.",
)
def agg_stats_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v, u = F.col("value"), F.col("user_id")
    return (
        t.events.filter(v.isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.stddev_samp(v), 6).alias("sd_samp"),
            F.round(F.stddev_pop(v), 6).alias("sd_pop"),
            F.round(F.var_samp(v), 6).alias("var_samp"),
            F.round(F.var_pop(v), 6).alias("var_pop"),
            F.round(F.corr(v, u), 6).alias("corr_vu"),
            F.round(F.covar_samp(v, u), 6).alias("cov_samp"),
            F.round(F.covar_pop(v, u), 6).alias("cov_pop"),
            F.round(F.median(v), 6).alias("med"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube): three grouping "
    "shapes in one pass — Spark expands to a single Expand+HashAgg, "
    "one scan and one shuffle instead of three.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("rl_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(avg(o_totalprice), 6) AS avg_price
        FROM rl_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@register(
    "agg_bool_logical",
    oracle="""
    SELECT event_type,
           bool_and(value > 10.0) AS all_gt10,
           bool_or(value > 900.0) AS any_gt900,
           count(*) FILTER (WHERE value > 500.0) AS n_gt500
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="Boolean aggregates (bool_and/bool_or) plus FILTER'd count — "
    "single-pass partial-aggregating predicates.",
)
def agg_bool_logical(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v = F.col("value")
    return (
        t.events.filter(v.isNotNull())
        .groupBy("event_type")
        .agg(
            F.bool_and(v > 10.0).alias("all_gt10"),
            F.bool_or(v > 900.0).alias("any_gt900"),
            F.count(F.when(v > 500.0, 1)).alias("n_gt500"),
        )
    )


@register(
    "agg_string_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|')
             AS distinct_statuses
    FROM orders WHERE o_orderkey < 300
    GROUP BY o_orderpriority
    """,
    doc="Ordered string aggregation (listagg/string_agg) and sorted "
    "distinct array_agg — deterministic via explicit in-aggregate "
    "ordering, the only safe way to hash-compare concatenations "
    "across engines.",
)
def agg_string_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderkey") < 300)
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("o_orderstatus")), ","
            ).alias("statuses"),
            F.array_join(
                F.array_sort(F.collect_set("o_orderstatus")), "|"
            ).alias("distinct_statuses"),
        )
    )


APPROX_PCT_ACCURACY = 10_000  # 1/accuracy = max rank error


def _approx_percentile_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw GK-sketch percentiles (engine-specific values; used by the
    registry entry's rank check and tests/test_plans.py)."""
    t = Tables(spark, sf_dir)
    v = F.col("value")
    return (
        t.events.filter(v.isNotNull())
        .groupBy("event_type")
        .agg(
            F.approx_percentile(
                v, F.lit(0.5), F.lit(APPROX_PCT_ACCURACY)
            ).alias("p50_approx"),
            F.approx_percentile(
                v, F.lit(0.95), F.lit(APPROX_PCT_ACCURACY)
            ).alias("p95_approx"),
        )
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT event_type, count(*) AS n,
           true AS p50_rank_ok, true AS p95_rank_ok
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
    doc="Approximate percentiles (Greenwald-Khanna sketch, rank error "
    "<= 1/accuracy) — at extreme cardinality the sketch's O(1) "
    "memory replaces the exact percentile's full sort; mergeable "
    "across partitions like any partial aggregate.  The checkable "
    "contract is the RANK guarantee itself: the returned sample's "
    "rank interval [count(< x), count(<= x)] must intersect "
    "[n*(p-eps), n*(p+eps)] (eps = 10x the sketch's guaranteed "
    "error, +2 rows absolute slack) — verified per group as exact "
    "integer counts and hashed as booleans against the oracle's "
    "literals.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    eps = 10.0 / APPROX_PCT_ACCURACY
    approx = _approx_percentile_raw(spark, sf_dir).withColumnRenamed(
        "event_type", "a_event_type"
    )
    v = F.col("value")
    # null-safe group-key join: a NULL event_type group exists in both
    # engines' GROUP BY and must not be dropped by the check join
    joined = (
        t.events.filter(v.isNotNull())
        .select("event_type", "value")
        .join(
            F.broadcast(approx),
            F.col("event_type").eqNullSafe(F.col("a_event_type")),
        )
        .drop("a_event_type")
    )

    def rank_ok(p: float, col: str):
        cnt_lt = F.sum(F.when(v < F.col(col), 1).otherwise(0))
        cnt_le = F.sum(F.when(v <= F.col(col), 1).otherwise(0))
        n = F.count("*")
        return (cnt_lt <= n * (p + eps) + 2) & (cnt_le >= n * (p - eps) - 2)

    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        rank_ok(0.5, "p50_approx").alias("p50_rank_ok"),
        rank_ok(0.95, "p95_approx").alias("p95_rank_ok"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ), ranked AS (
      SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rn
      FROM counts
    )
    SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
    doc="Deterministic MODE aggregate: built-in mode() is tie-arbitrary "
    "on both engines, so the portable formulation is two exact phases "
    "— count per (group, value), then argmax by (count DESC, value "
    "ASC).  Both shuffles carry pre-aggregated partials; the heavy "
    "first phase combines map-side.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    counts = t.lineitem.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("cnt")
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(
            F.max_by(
                F.struct(
                    F.col("l_quantity").alias("q"), F.col("cnt").alias("c")
                ),
                F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("nq")),
            ).alias("m")
        )
        .select(
            "l_returnflag",
            F.col("m.q").alias("mode_qty"),
            F.col("m.c").alias("mode_count"),
        )
    )


def _sketch_mergeable_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Datasketches-HLL estimates per shard + merged (engine-
    specific values; used by the registry entry's bound check and
    tests/test_plans.py)."""
    t = Tables(spark, sf_dir)
    shard = t.orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    per_shard = shard.select(
        "o_orderpriority",
        "n_rows",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_distinct"),
    )
    merged = shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("est_distinct"),
        F.sum("n_rows").alias("n_rows"),
    ).select(
        F.lit("__ALL__").alias("o_orderpriority"), "n_rows", "est_distinct"
    )
    return per_shard.unionByName(merged)


@register(
    "agg_sketch_mergeable",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_rows,
           count(DISTINCT o_custkey) AS exact_distinct,
           true AS within_bound
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT '__ALL__', count(*), count(DISTINCT o_custkey), true
    FROM orders
    """,
    doc="Mergeable-sketch workflow — THE pattern for distributed "
    "distinct counting at 100 TB: each source shard aggregates its own "
    "HLL sketch (hll_sketch_agg, one pass, bytes-sized state), then "
    "sketches UNION (hll_union_agg) into the global estimate without "
    "touching rows again.  Shard sketches are storable/reusable: "
    "tomorrow's shard merges with yesterday's without rescanning "
    "either — what exact count(DISTINCT) fundamentally cannot do.  "
    "Sketch binaries have no DuckDB replay, so the checkable contract "
    "is the bound: every estimate (per shard AND merged) must land "
    "within max(5%, 2) of the exact distinct count, hashed as a "
    "boolean next to the exact values.",
)
def agg_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bound_ok = (
        F.abs(F.col("est_distinct") - F.col("exact_distinct"))
        <= F.greatest(0.05 * F.col("exact_distinct"), F.lit(2))
    ).alias("within_bound")
    # exact + sketch in ONE groupBy for the per-shard rows (a NULL
    # group key would be dropped by a check join but is retained by
    # GROUP BY on both engines)
    shard = t.orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count("*").alias("n_rows"),
        F.count_distinct("o_custkey").alias("exact_distinct"),
    )
    per_shard = shard.select(
        "o_orderpriority",
        "n_rows",
        "exact_distinct",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_distinct"),
    ).select("o_orderpriority", "n_rows", "exact_distinct", bound_ok)
    # merged row: union of shard sketches vs the exact global distinct
    # (two 1-row frames crossed — bounded metadata)
    merged_est = shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("est_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
    merged_exact = t.orders.agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    merged = merged_est.crossJoin(merged_exact).select(
        F.lit("__ALL__").alias("o_orderpriority"),
        "n_rows",
        "exact_distinct",
        bound_ok,
    )
    return per_shard.unionByName(merged)


@register(
    "agg_incremental_merge",
    oracle="""
    SELECT event_type, count(*) AS n,
           min(value) AS min_v, max(value) AS max_v,
           (CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100000000.0, 0)
                AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="Incremental aggregate maintenance (materialized-view merge): "
    "the corpus is split into an already-aggregated BASE (first three "
    "weeks) and a new DELTA batch (the rest); each side reduces to "
    "per-key partial state (count / fixed-point sum / min / max), and "
    "the states merge with a second tiny groupBy.  The oracle is the "
    "full recompute — merged state must equal it exactly, which the "
    "fixed-point sum guarantees.  At 100 TB this is the nightly-ETL "
    "pattern: the base's state table is millions of rows where the "
    "base itself is trillions, so each refresh costs O(delta) scan + "
    "O(keys) merge instead of a full rescan; every state here "
    "(count/sum/min/max, and HLL via agg_sketch_mergeable) is a "
    "commutative monoid, so merges parallelize and re-order freely.",
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cutoff = F.lit("2024-01-22").cast("timestamp")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("pn"),
            F.sum(
                F.round(F.col("value").cast("double") * 1e8, 0).cast("long")
            ).alias("psum"),
            F.min("value").alias("pmin"),
            F.max("value").alias("pmax"),
        )

    base_state = state(t.events.filter(F.col("ts") < cutoff))
    delta_state = state(t.events.filter(~(F.col("ts") < cutoff)))
    return (
        base_state.unionByName(delta_state)
        .groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.min("pmin").alias("min_v"),
            F.max("pmax").alias("max_v"),
            (F.sum("psum").cast("double") / F.lit(1e8)).alias("sum_value"),
        )
    )


# -- heavy hitters via a mergeable Misra-Gries sketch ------------------------

MG_COUNTERS = 64  # counters per shard sketch


def _mg_partition(batches):
    """Batched Misra-Gries over one partition: exact counts accumulate
    until the table exceeds MG_COUNTERS, then the (M+1)-th largest
    count is subtracted from every counter (dropping non-positive) —
    the classic decrement step, amortized per Arrow batch.  Undercount
    per partition is bounded by n_p / (MG_COUNTERS + 1)."""
    import pandas as pd

    counters: dict = {}
    for pdf in batches:
        for k, c in pdf["user_id"].value_counts().items():
            counters[k] = counters.get(k, 0) + int(c)
        if len(counters) > MG_COUNTERS:
            vals = sorted(counters.values(), reverse=True)
            d = vals[MG_COUNTERS]
            counters = {k: v - d for k, v in counters.items() if v - d > 0}
    yield pd.DataFrame(
        {
            "user_id": pd.Series(list(counters), dtype="int64"),
            "est": pd.Series(list(counters.values()), dtype="int64"),
        }
    )


def _heavy_hitters_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw merged Misra-Gries estimates (cutoff-dependent key set;
    used by the registry entry's guarantee check and
    tests/test_plans.py)."""
    from risinglight_spark.tables import load

    ev = load(spark, sf_dir, "events").select("user_id")
    partials = ev.mapInPandas(_mg_partition, "user_id BIGINT, est BIGINT")
    # No top-k cut here: the survival guarantee is about PRESENCE in the
    # merged sketch — a hot key's merged estimate can rank below colder
    # keys' (undercount is per-shard), so truncation could evict it.
    # Output stays bounded at <= M rows per shard regardless of data.
    return partials.groupBy("user_id").agg(F.sum("est").alias("est_count"))


MG_CHECK_TOPK = 20  # true-count top keys whose MG guarantees get hashed


@register(
    "agg_heavy_hitters_sketch",
    oracle=f"""
    WITH c AS (
      SELECT user_id, count(*) AS true_count
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), ranked AS (
      SELECT user_id, true_count,
             row_number() OVER (ORDER BY true_count DESC, user_id)
                 AS rn
      FROM c
    )
    SELECT user_id, true_count,
           true AS present_ok, true AS no_overcount,
           true AS undercount_ok
    FROM ranked WHERE rn <= {MG_CHECK_TOPK}
    """,
    doc=f"Heavy hitters via mergeable Misra-Gries sketches "
    f"({MG_COUNTERS} counters/shard): each partition summarizes "
    "locally in one Arrow pass (no shuffle of raw rows), the partial "
    "sketches merge by key-summing — the same merge-without-rescan "
    "contract as agg_sketch_mergeable, for top-k instead of "
    "cardinality.  The surviving-key SET is cutoff-dependent (not "
    "oracle-replayable), so the checkable contract hashes the MG "
    f"GUARANTEES over the top-{MG_CHECK_TOPK} TRUE keys (a "
    "deterministic, oracle-computable set): with an absent key read "
    "as estimate 0, every key must satisfy est <= true (never "
    "overcount) and true - est <= n/(M+1) (bounded undercount — for "
    "an absent key this IS the contrapositive of the presence "
    "guarantee), and keys hotter than n/(M+1) must be present.  At "
    "100 TB the shuffle carries <= M rows per shard, independent of "
    "data size — the constant-memory answer to 'top users' on an "
    "unbounded stream.",
)
def agg_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.tables import load

    est = _heavy_hitters_raw(spark, sf_dir)
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    true = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    n = ev.count()
    bound = n / (MG_COUNTERS + 1.0)
    # TakeOrderedAndProject (never a global sort): top-K true keys,
    # ties broken by user_id so the set is deterministic
    top = true.orderBy(F.desc("true_count"), F.col("user_id")).limit(
        MG_CHECK_TOPK
    )
    e0 = F.coalesce(F.col("est_count"), F.lit(0))
    return top.join(F.broadcast(est), "user_id", "left").select(
        "user_id",
        "true_count",
        (
            (F.col("true_count") <= bound) | F.col("est_count").isNotNull()
        ).alias("present_ok"),
        (e0 <= F.col("true_count")).alias("no_overcount"),
        ((F.col("true_count") - e0) <= bound).alias("undercount_ok"),
    )


# -- equi-width histogram -----------------------------------------------------

HIST_BINS = 20


@register(
    "agg_histogram_equiwidth",
    oracle=f"""
    WITH stats AS (
      SELECT min(value) AS lo, max(value) AS hi
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(CAST(floor((value - lo)
                                  / ((hi - lo) / {HIST_BINS}.0))
                             AS BIGINT), {HIST_BINS - 1}) END AS bin,
             lo, hi
      FROM events, stats WHERE value IS NOT NULL
    )
    SELECT bin,
           round(lo + bin * ((hi - lo) / {HIST_BINS}.0), 8) AS bin_lo,
           round(lo + (bin + 1) * ((hi - lo) / {HIST_BINS}.0), 8) AS bin_hi,
           count(*) AS n
    FROM binned GROUP BY bin, lo, hi
    """,
    doc=f"Equi-width histogram ({HIST_BINS} bins) over the value "
    "column — the distribution profile behind optimizer stats and "
    "monitoring dashboards (complements the equi-depth window_ntile "
    "and the exact/approx percentile ops).  Two passes: a "
    "min/max scalar reduce (broadcast back as a 1-row side), then one "
    "map-side-combined groupBy on the bin id — shuffle carries "
    f"{HIST_BINS} rows.  Bin edges are pure double arithmetic on the "
    "exact min/max, identical on both engines; the top edge is closed "
    "via least(bin, n-1).",
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.tables import load

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / float(HIST_BINS)
    # degenerate constant column (hi == lo): width is 0 and the
    # division is engine-dependent (NULL/NaN/Inf) — pin everything to
    # bin 0 in BOTH the Spark plan and the oracle SQL
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("bigint"),
            F.lit(HIST_BINS - 1),
        )
    )
    return (
        ev.crossJoin(F.broadcast(stats))
        .select(bin_.alias("bin"), "lo", "hi")
        .groupBy("bin", "lo", "hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.col("lo") + F.col("bin") * width, 8).alias("bin_lo"),
            F.round(F.col("lo") + (F.col("bin") + 1) * width, 8).alias(
                "bin_hi"
            ),
            "n",
        )
    )


# -- bitmap-accelerated exact distinct ---------------------------------------


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="EXACT distinct counting via roaring-style bitmaps "
    "(bitmap_bit_position / bitmap_construct_agg / bitmap_count — the "
    "ClickHouse/Iceberg trick): ids bucket into 2^15-bit bitmap "
    "segments, each segment reduces to a fixed-size bitmap with "
    "map-side OR-combine, and the count is a popcount sum.  Unlike the "
    "HLL sketch this is exact — same answer as count(distinct) (the "
    "oracle) — but the shuffle carries (group x bucket) bitmaps "
    "instead of every distinct id: at 100 TB that's the difference "
    "between shuffling the id universe and shuffling its compressed "
    "occupancy mask.  Mergeable across shards/days like the HLL "
    "workflow (agg_sketch_mergeable).",
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.tables import load

    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    per_bucket = ev.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("user_id"))
        ).alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_users")
    )


# -- exact weighted median ----------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice
               ROWS UNBOUNDED PRECEDING)::BIGINT AS cw,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag)::BIGINT AS total
      FROM lineitem
    )
    SELECT l_returnflag,
           min(l_extendedprice) AS weighted_median_price,
           any_value(total) AS total_weight
    FROM cum WHERE 2 * cw >= total
    GROUP BY l_returnflag
    """,
    doc="Exact weighted median (price weighted by quantity) per "
    "return flag, WITHOUT a per-group sort of the fact table: "
    "two-pass histogram refinement.  Pass 1 buckets prices into "
    "1024 equi-width bins per group (one map-side-combined groupBy; "
    "the per-group min/max/total stats side is a broadcast) and finds "
    "the bucket where the integer cumulative weight crosses total/2 "
    "(a window over <= 1024 rows per group — bounded, never "
    "data-sized).  Pass 2 sorts ONLY the crossing bucket's rows "
    "(~1/1024 of each group) and finds the exact crossing row by "
    "2*cw >= total — all-integer comparison, no division, so the "
    "crossing is unambiguous on both engines.  The former shape "
    "(window-sort of every row per group) was the 10x-probe's worst "
    "offender at 4.8 s; this one scans the fact twice and sorts a "
    "slice.  Generalizes to any exact weighted quantile; "
    "approx_percentile stays the one-pass sketch alternative when "
    "two scans are too many.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _WM_BINS = 1024
    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.sum("w").alias("total"),
    )
    width = (F.col("hi") - F.col("lo")) / float(_WM_BINS)
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo")) / width).cast(
                "bigint"
            ),
            F.lit(_WM_BINS - 1),
        )
    )
    binned = li.join(F.broadcast(stats), "l_returnflag").select(
        "l_returnflag", "l_extendedprice", "w", "total", bucket.alias("b")
    )
    hist = binned.groupBy("l_returnflag", "b").agg(F.sum("w").alias("bw"))
    wb = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "l_returnflag",
        "b",
        F.sum("bw").over(wb).alias("cw_end"),
        (F.sum("bw").over(wb) - F.col("bw")).alias("cw_before"),
    )
    crossing = (
        cum.join(
            F.broadcast(stats.select("l_returnflag", "total")), "l_returnflag"
        )
        .filter(2 * F.col("cw_end") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min_by(F.struct("b", "cw_before"), "b").alias("cb"),
        )
        .select(
            "l_returnflag",
            F.col("cb.b").alias("cb"),
            F.col("cb.cw_before").alias("cw_before"),
        )
    )
    inb = binned.join(F.broadcast(crossing), "l_returnflag").filter(
        F.col("b") == F.col("cb")
    )
    # Pass-2 cumsum over the crossing bin's rows via the distributed
    # grouped prefix sum: even the ~1/1024 slice is fact-table-derived,
    # and a per-flag (K=3) window would funnel it through three tasks.
    # Ties on l_extendedprice land in one range partition (boundaries
    # are half-open on distinct keys) and the min-price selection is
    # tie-order invariant, exactly as with the window form.
    from risinglight_spark.operators import grouped_prefix_sum

    cum = grouped_prefix_sum(
        inb, "l_returnflag", ("l_extendedprice",), "w"
    )
    return (
        cum.select(
            "l_returnflag",
            "l_extendedprice",
            (F.col("cw_before") + F.col("cum")).alias("cw"),
            "total",
        )
        .filter(2 * F.col("cw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.any_value("total").alias("total_weight"),
        )
    )


# -- Count-Min Sketch (mergeable frequency estimation) -----------------------

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 64  # buckets per row
CMS_PROBE_TOPK = 20  # probe the estimates for the true top-k tokens


def _cms_oracle() -> str:
    from risinglight_spark.functions.text import (
        char_hash_sql,
        tokens_sql,
    )

    hash_i = [
        f"({char_hash_sql(expr)} % {CMS_WIDTH})"
        for expr in (f"t || '#cms{i}'" for i in range(CMS_DEPTH))
    ]
    counter_arms = " UNION ALL ".join(
        f"SELECT {i} AS row_i, {hash_i[i]} AS bucket, count(*) AS c "
        f"FROM tok GROUP BY 2"
        for i in range(CMS_DEPTH)
    )
    probe_arms = " UNION ALL ".join(
        f"SELECT t, true_count, {i} AS row_i, {hash_i[i]} AS bucket "
        f"FROM probe"
        for i in range(CMS_DEPTH)
    )
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT unnest({tokens_sql("lower(text)")}) AS t FROM documents
    ),
    tf AS (SELECT t, count(*) AS true_count FROM tok GROUP BY t),
    probe AS (
      SELECT t, true_count FROM tf
      ORDER BY true_count DESC, t LIMIT {CMS_PROBE_TOPK}
    ),
    counters AS ({counter_arms}),
    probed AS ({probe_arms})
    SELECT p.t AS token, p.true_count,
           min(c.c)::BIGINT AS cms_estimate,
           bool_and(c.c >= p.true_count) AS never_undercounts
    FROM probed p JOIN counters c
      ON p.row_i = c.row_i AND p.bucket = c.bucket
    GROUP BY p.t, p.true_count
    """


@register(
    "agg_count_min_sketch",
    oracle=_cms_oracle(),
    doc=f"Count-Min Sketch frequency estimation ({CMS_DEPTH} hash rows "
    f"x {CMS_WIDTH} buckets) over the corpus token stream, probed at "
    f"the true top-{CMS_PROBE_TOPK} tokens.  The sketch is exact "
    "integer counters keyed by portable char-hashes, so unlike most "
    "sketches it is FULLY oracle-replayable (DuckDB rebuilds the "
    "identical counter matrix).  Counters are plain sums -> mergeable "
    "across shards/streams by cell-wise addition; the estimate is "
    "min over rows and can only overcount (never_undercounts is the "
    "CMS guarantee, hash-checked per probe).  At 100 TB the shuffle "
    f"carries {CMS_DEPTH}x{CMS_WIDTH} counter cells per shard — "
    "constant, independent of corpus size; the probe join broadcasts "
    "the 256-cell sketch.",
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.functions.text import char_hash, tokens
    from risinglight_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("t")
    )

    def buckets(tcol):
        return [
            (char_hash(F.concat(tcol, F.lit(f"#cms{i}"))) % CMS_WIDTH)
            for i in range(CMS_DEPTH)
        ]

    # one pass, 4 (row, bucket) cells per token via posexplode: the
    # groupBy reduces map-side to <= 256 cells per partition
    cells = tok.select(
        F.posexplode(F.array(*buckets(F.col("t")))).alias("row_i", "bucket")
    )
    counters = cells.groupBy("row_i", "bucket").agg(F.count("*").alias("c"))
    tf = tok.groupBy("t").agg(F.count("*").alias("true_count"))
    probe = tf.orderBy(F.desc("true_count"), "t").limit(CMS_PROBE_TOPK)
    probed = probe.select(
        "t",
        "true_count",
        F.posexplode(F.array(*buckets(F.col("t")))).alias("row_i", "bucket"),
    )
    return (
        probed.join(F.broadcast(counters), ["row_i", "bucket"])
        .groupBy(F.col("t").alias("token"), "true_count")
        .agg(
            F.min("c").cast("bigint").alias("cms_estimate"),
            F.min(F.col("c") >= F.col("true_count")).alias(
                "never_undercounts"
            ),
        )
    )
