"""Subquery expressions: scalar, EXISTS / NOT EXISTS, IN (SELECT),
correlated subqueries, CTEs, and the max1row scalar-subquery marker.

Reference: binder/expr.rs:292-316 (subquery binding), planner/mod.rs:113-119
(`apply`), rules/plan.rs:205-280 (Neumann-style decorrelation),
binder/select.rs:370-387 (max1row -> left-outer apply); tests
tests/sql/subquery.slt, cte.slt.

Catalyst performs the same decorrelation natively
(RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) — these
queries go through ``spark.sql`` so the built-in rewrites are exercised
end-to-end, exactly as SURVEY §4.1 prescribes ("do NOT reimplement").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from risinglight_spark.operators import davg_sql, dsum_sql, register_views
from risinglight_spark.registry import register


def _sql(name: str, sql: str, doc: str) -> None:
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    register(name, oracle=sql, doc=doc)(fn)


_sql(
    "subquery_scalar",
    f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT {davg_sql('o_totalprice')} FROM orders)
    """,
    doc="Uncorrelated scalar subquery (ref: max1row marker, "
    "binder/expr.rs:313-316) — computed once, broadcast into the filter.",
)

_sql(
    "subquery_exists_correlated",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity > 49)
    """,
    doc="Correlated EXISTS -> left-semi join after decorrelation "
    "(ref rule: in->exists->semi-apply, rules/plan.rs:205-280).",
)

_sql(
    "subquery_not_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity > 49
                        AND l_extendedprice > 80000)
    """,
    doc="Correlated NOT EXISTS -> left-anti join.",
)

_sql(
    "subquery_in_select",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
    doc="IN (SELECT ...) -> semi join (ref: binder/expr.rs:292-312 "
    "InSubquery binding).",
)

_sql(
    "subquery_correlated_scalar",
    f"""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c1
    WHERE c_acctbal > 1.5 * (
      SELECT {davg_sql('c_acctbal')} FROM customer c2
      WHERE c2.c_nationkey = c1.c_nationkey)
    """,
    doc="Correlated scalar aggregate subquery — Catalyst rewrites to a "
    "grouped aggregate joined back on the correlation key, the same "
    "plan the reference's apply-pushdown rules produce.",
)

_sql(
    "subquery_cte",
    f"""
    WITH nation_rev AS (
      SELECT n_name, {dsum_sql('o_totalprice')} AS revenue
      FROM nation, customer, orders
      WHERE n_nationkey = c_nationkey AND c_custkey = o_custkey
      GROUP BY n_name
    ),
    avg_rev AS (SELECT {davg_sql('revenue')} AS a FROM nation_rev)
    SELECT n_name, revenue
    FROM nation_rev, avg_rev
    WHERE revenue > a
    ORDER BY revenue DESC
    """,
    doc="Chained CTEs (ref: inlined non-recursive CTEs, "
    "binder/select.rs:19-24); the second CTE consumes the first.",
)

_sql(
    "subquery_scalar_in_select",
    """
    SELECT n_name,
           (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_suppliers
    FROM nation
    """,
    doc="Scalar subquery in the projection list (max1row semantics: one "
    "value per outer row, NULL when empty — ref binder/select.rs:370-387 "
    "left-outer apply).",
)


_RECURSIVE_WALK_SQL = """
WITH RECURSIVE
edges AS (
  SELECT n_regionkey AS rk, n_nationkey AS src,
         lead(n_nationkey) OVER (PARTITION BY n_regionkey
                                 ORDER BY n_nationkey) AS dst
  FROM nation
),
walk(rk, node, depth) AS (
  SELECT rk, src, 1 FROM edges e
  WHERE NOT EXISTS (SELECT 1 FROM edges e2
                    WHERE e2.dst = e.src AND e2.rk = e.rk)
  UNION ALL
  SELECT e.rk, e.dst, w.depth + 1
  FROM walk w JOIN edges e
    ON e.rk = w.rk AND e.src = w.node AND e.dst IS NOT NULL
)
SELECT rk, node, depth FROM walk
"""


@register(
    "subquery_recursive_cte",
    oracle=_RECURSIVE_WALK_SQL.replace("depth, 1", "depth, 1"),
    doc="WITH RECURSIVE (Spark 4 recursive CTE): per-region chain walk "
    "over a lead()-derived successor-edge list — the transitive-"
    "closure shape (org charts, BOM explosions, dup-cluster closure).  "
    "Each iteration is one keyed join of the frontier against the "
    "edge table; Spark executes it as iterative union steps, the same "
    "loop dedup_connected_components hand-rolls (that one needs "
    "min-label aggregation per round, which recursive CTEs disallow).  "
    "Identical SQL text runs on both engines.",
)
def subquery_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_WALK_SQL)


@register(
    "subquery_any_all_rewrite",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > ALL (
            SELECT o_totalprice FROM orders WHERE o_custkey = 2
          )
      AND o_totalprice < ANY (
            SELECT o_totalprice FROM orders WHERE o_custkey = 1
          )
    """,
    doc="Quantified comparison subqueries (> ALL / < ANY): DuckDB "
    "runs them natively (the oracle); Spark SQL has no ALL/ANY "
    "quantifiers, so the engine applies the standard rewrite — "
    "> ALL S == > max(S), < ANY S == < max(S) (both sides non-empty "
    "and non-null here; the empty-set edge rewrites with count(*) "
    "guards) — turning each quantifier into a broadcast scalar "
    "aggregate instead of a correlated probe.  This is the dialect "
    "translation a reference-SQL user needs for migrated queries.",
)
def subquery_any_all_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders
                              WHERE o_custkey = 2)
          AND o_totalprice < (SELECT max(o_totalprice) FROM orders
                              WHERE o_custkey = 1)
        """
    )
