"""Set operations: UNION [ALL], INTERSECT, EXCEPT.

The reference does NOT implement these — ``SetExpr`` other than SELECT
and VALUES errors out ("unknown set expr", src/binder/select.rs:30);
SURVEY §2.3.  Spark provides them natively, so our engine ships them as
a documented **superset** of the reference surface (a user migrating a
reference workload loses nothing; new workloads gain set ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from risinglight_spark.operators import register_views
from risinglight_spark.registry import register


def _sql(name: str, sql: str, doc: str) -> None:
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    register(name, oracle=sql, doc=doc)(fn)


_sql(
    "setop_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier WHERE s_acctbal > 9000
    """,
    doc="UNION ALL — bag union, no dedup shuffle (cheap at any scale).",
)

_sql(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    UNION
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    doc="UNION (distinct) — dedup via hash aggregation on the union.",
)

_sql(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    doc="INTERSECT — left-semi join of distinct sides.",
)

_sql(
    "setop_except",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    doc="EXCEPT — left-anti join of distinct sides.",
)


_sql(
    "setop_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    doc="INTERSECT ALL — bag intersection (min of per-side "
    "multiplicities); Spark plans it as a shuffle on the value with "
    "per-side counts, no row explosion.",
)

_sql(
    "setop_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    doc="EXCEPT ALL — bag difference (multiplicity subtraction), same "
    "one-shuffle shape as INTERSECT ALL.",
)


@register(
    "setop_unpivot",
    oracle="""
    SELECT p_partkey, 'retail_cents' AS metric,
           CAST(round(p_retailprice * 100, 0) AS BIGINT) AS val
    FROM part WHERE p_partkey <= 100
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS val
    FROM part WHERE p_partkey <= 100
    """,
    doc="UNPIVOT (wide -> long reshaping, Spark 4 SQL surface): part "
    "measures become (metric, value) rows.  The oracle is the "
    "definitional UNION ALL, which is also the portable fallback "
    "and the logical plan Spark lowers UNPIVOT to (Expand) — one "
    "narrow pass, no shuffle.",
)
def setop_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, metric, val FROM (
          SELECT p_partkey,
                 CAST(round(p_retailprice * 100, 0) AS BIGINT) AS retail_cents,
                 CAST(p_size AS BIGINT) AS size
          FROM part WHERE p_partkey <= 100
        ) UNPIVOT (val FOR metric IN (retail_cents, size))
        """
    )
