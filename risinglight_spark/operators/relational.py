"""Core relational operators: scan, filter, proj, order, limit, topn,
values, empty, distinct, distinct-on.

Reference executors: src/executor/{table_scan,filter,projection,order,
limit,top_n,values}.rs; plan nodes src/planner/mod.rs:101-109,144.

Spark mapping notes (scale):
- scan+filter+proj compile to a single parquet scan stage with
  PushedFilters and a pruned ReadSchema — verified in
  tests/test_plans.py.
- topn maps to Catalyst's TakeOrderedAndProject (no global sort): each
  partition keeps k rows, the driver merges — O(n/p · log k) per task,
  no shuffle of the full data.  Same trick the reference implements by
  hand with a BinaryHeap (src/executor/top_n.rs:22-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType
from pyspark.sql.window import Window

from risinglight_spark.operators import Tables
from risinglight_spark.registry import register


@register(
    "scan_projected",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    doc="Base-table scan with projected columns (ref: executor/table_scan.rs:13-55). "
    "Column pruning reaches the parquet ReadSchema.",
)
def scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity < 10 AND l_discount >= 0.05
    """,
    doc="Filter node (ref: executor/filter.rs:11-24); both conjuncts are "
    "pushed into the parquet scan as PushedFilters.",
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_quantity") < 10) & (F.col("l_discount") >= 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "proj_expressions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity + 1.0 AS qty_plus
    FROM lineitem
    """,
    doc="Projection with expression evaluation (ref: executor/projection.rs:14-22). "
    "Per-row IEEE arithmetic is order-independent, so raw doubles hash-match.",
)
def proj_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ep, d, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (ep * (1 - d)).alias("disc_price"),
        (ep * (1 - d) * (1 + tax)).alias("charge"),
        (F.col("l_quantity") + 1.0).alias("qty_plus"),
    )


@register(
    "order_nulls_first",
    oracle="""
    SELECT c_custkey, bal
    FROM (SELECT c_custkey,
                 CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
          FROM customer)
    ORDER BY bal ASC NULLS FIRST, c_custkey
    LIMIT 50
    """,
    doc="Full sort; the reference sorts NULL before any value "
    "(src/types/value.rs:16-17) — Spark's asc default is also NULLS FIRST, "
    "DuckDB's is NULLS LAST so the oracle pins it explicitly.",
)
def order_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return (
        t.customer.select("c_custkey", bal.alias("bal"))
        .orderBy(F.col("bal").asc_nulls_first(), "c_custkey")
        .limit(50)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 10
    """,
    doc="limit+offset (ref: executor/limit.rs:12-40); ordered by a unique "
    "key so the selected window is deterministic.",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(20)
    )


@register(
    "topn",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Top-N (ref: executor/top_n.rs:22-60 BinaryHeap) — Catalyst "
    "TakeOrderedAndProject: per-partition heap + driver merge, no shuffle.",
)
def topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "values_rows",
    oracle="""
    SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, NULL)) AS t(id, name)
    """,
    doc="Literal rows (ref: executor/values.rs:15-32).",
)
def values_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = StructType(
        [StructField("id", IntegerType(), False), StructField("name", StringType(), True)]
    )
    return spark.createDataFrame([(1, "one"), (2, "two"), (3, None)], schema)


@register(
    "empty_false_filter",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem WHERE 1 = 0",
    doc="filter-false -> zero-row relation with intact schema "
    "(ref: planner/mod.rs:144 `empty`, executor/mod.rs:469).  Catalyst's "
    "PruneFilters folds this to an empty LocalRelation — no scan happens.",
)
def empty_false_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.lit(False)).select("l_orderkey", "l_quantity")


@register(
    "distinct_pair",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT rewritten to grouped agg by the reference binder "
    "(src/binder/select.rs:296-345); Spark dropDuplicates is the same "
    "hash-aggregate, partial map-side first.",
)
def distinct_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@register(
    "distinct_on",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name
    FROM (SELECT c_nationkey, c_custkey, c_name,
                 row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
          FROM customer)
    WHERE rn = 1
    """,
    doc="DISTINCT ON (c_nationkey): first row per key in a pinned order "
    "(ref rewrite: binder/select.rs:296-345 wraps non-key projections in "
    "first()).  Expressed as row_number-over-partition on both sides.",
)
def distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        t.customer.select(
            "c_nationkey", "c_custkey", "c_name", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
