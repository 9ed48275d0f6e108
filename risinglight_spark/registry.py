"""Query registry: the single source of truth the driver contract
(`__spark_entry__.py`) exposes.

Each entry pairs a Spark implementation (``fn(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet tables.  Column names are aliased identically on both sides —
the driver's compare sorts columns by name before hashing.

Entries whose semantics are not SQL-expressible (LSH bucketing with
engine-specific hashes, streaming) set ``oracle=None`` and get a weaker
rows-only check from the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QueryEntry] = {}

# Modules that register queries on import.
_OPERATOR_MODULES = (
    "risinglight_spark.operators.relational",
    "risinglight_spark.operators.joins",
    "risinglight_spark.operators.aggregates",
    "risinglight_spark.operators.window",
    "risinglight_spark.operators.subquery",
    "risinglight_spark.operators.scalar_exprs",
    "risinglight_spark.operators.setops",
    "risinglight_spark.operators.tpch",
    "risinglight_spark.operators.vector_search",
    "risinglight_spark.operators.dedup",
    "risinglight_spark.operators.pipeline_ops",
    "risinglight_spark.operators.text_analysis",
    "risinglight_spark.operators.events_ops",
    "risinglight_spark.operators.multimodal",
    "risinglight_spark.operators.catalog_ops",
    "risinglight_spark.streaming.ops",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add ``fn(spark, sf_dir) -> DataFrame`` to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may pass a vanilla Spark 4 session (ANSI on);
            # reference semantics are non-ANSI — pin before running.
            from risinglight_spark.tables import pin_semantics

            pin_semantics(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QueryEntry(name=name, fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


def collect() -> dict[str, QueryEntry]:
    """Import all operator modules (which self-register) and return the
    full registry."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in collect().items() if e.oracle}
