"""risinglight_spark — a PySpark-native analytics engine with the query
surface and semantics of risinglightdb/risinglight.

The reference (/root/reference, Rust) is a single-node columnar OLAP
database: SQL -> binder -> egg plan -> vectorized Volcano executors.
This package re-expresses that *query surface* Spark-first: the
DataFrame/SQL API declares logical plans and Catalyst/Tungsten pick the
physical strategy (see SURVEY.md §4: every reference optimizer rewrite
except the vector-index rule is already built into Catalyst).

Layout
------
session.py     SparkSession factory tuned for OLAP parity + scale
tables.py      parquet table sources (the driver testdata star schema)
registry.py    query registry: name -> (spark_fn, oracle_sql)
functions/     scalar / vector / text expression builders (JVM-side)
operators/     relational, join, agg, window, tpch, dedup, similarity
sql/           SQL front door shim (PRAGMA, \\dt, DISTINCT ON, SQL UDFs)
streaming/     Structured Streaming pipelines over the events table
"""

# Vendored google.protobuf fallback (wire-format-complete proto3
# subset, see _vendor/google/protobuf/_mini.py): PySpark's
# transformWithStateInPandas worker requires it, and this container
# ships no protobuf distribution.  Appended (not prepended) so a real
# installation always wins; workers pick it up because the pickled
# stateful processor imports risinglight_spark on deserialization.
def _ensure_protobuf() -> None:
    import importlib.util

    try:
        present = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no `google` namespace at all
        present = False
    if not present:
        import os
        import sys

        sys.path.append(
            os.path.join(os.path.dirname(__file__), "_vendor")
        )


_ensure_protobuf()

from risinglight_spark.session import get_spark  # noqa: E402


def open(path):  # noqa: A001 - mirrors risinglight.open (python/mod.rs:46)
    from risinglight_spark.embedded import open as _open

    return _open(path)


def open_in_memory():
    from risinglight_spark.embedded import open_in_memory as _open_in_memory

    return _open_in_memory()


__all__ = ["get_spark", "open", "open_in_memory"]
__version__ = "0.4.0"
