"""Operator implementations, each registering queries into the registry.

Shared conventions for oracle parity (the driver hash-compares Spark
output against DuckDB running ``oracle_sql`` on the same parquet):

- **Deterministic double aggregation**: floating sums are not
  associative, and Spark's partial aggregation order differs from
  DuckDB's sequential scan.  Summing raw doubles at 60k+ rows gives
  last-ulp drift that a value-hash rejects.  We therefore cast summands
  to DECIMAL(18,6) (exact, associative) and cast the final sum back to
  DOUBLE — bit-identical on both engines at any parallelism, i.e. the
  result no longer depends on partitioning.  This is also the right
  call at 100 TB: it makes re-runs reproducible across cluster sizes.
- **Dates**: parquet stores timestamps; outputs cast to DATE so the
  arrow schema matches DuckDB's.
- **Counts**: Spark count() is bigint; DuckDB count() is BIGINT — match.
  ``count(x)`` parity with the reference's Int32 return
  (src/executor/evaluator.rs:238) casts to INT on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from risinglight_spark.tables import Tables, load, register_views  # noqa: F401


def dsum(c: Column) -> Column:
    """Order-independent double sum (see module docstring)."""
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def fpsum(c: Column, scale: float = 1e8) -> Column:
    """Order-independent double sum via fixed-point bigint arithmetic:
    round(x*scale) summed exactly as long, divided back.  Unlike dsum's
    decimal cast, the scaling product is a plain IEEE op, bit-identical
    across engines even when the decimal-rounding path differs."""
    return (
        F.sum(F.round(c.cast("double") * scale, 0).cast("long")).cast("double")
        / F.lit(scale)
    )


def fpsum_sql(expr: str, scale: float = 1e8) -> str:
    return (
        f"(CAST(sum(CAST(round(CAST({expr} AS DOUBLE) * {scale:.0f}.0, 0)"
        f" AS BIGINT)) AS DOUBLE) / {scale:.0f}.0)"
    )


def intsum(c: Column) -> Column:
    """Exact sum for integral-valued double columns (e.g. TPC-H
    l_quantity): cast to long and sum JVM-side — codegen'd long adds,
    no decimal path.  Safe to ~9.2e18 units (int64), i.e. any SF."""
    return F.sum(c.cast("long")).cast("double")


def intsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS BIGINT)) AS DOUBLE)"


def davg(c: Column) -> Column:
    """avg via the reference's sum/count rewrite (binder/expr.rs:443-447),
    made order-independent the same way as :func:`dsum`."""
    return dsum(c) / F.count(c)


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count({expr}))"
