"""Table sources: the driver's TPC-H-ish star schema as parquet scans.

Reference parity: risinglight's ``scan`` operator reads a base table with
projected columns and an optional pushed PK range filter
(reference: src/executor/table_scan.rs:13-55, src/planner/mod.rs:101).
In Spark a parquet scan with ``.select``/``.filter`` gives the same plus
rowgroup min/max pruning for free — verify with
``df.explain('formatted')`` that ``PushedFilters`` / ``ReadSchema`` show
the pruned set.

Scale note: at 100 TB the fact tables (lineitem/orders/events/documents)
are thousands of parquet files; nothing here collects to the driver, and
all metadata operations are O(#files) on the driver only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are small at any realistic SF and should be
# broadcast in star joins (region: 5 rows, nation: 25 rows always).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pin_semantics(spark: SparkSession) -> None:
    """Pin reference semantics on any session (the driver may hand us a
    vanilla Spark 4 session where ANSI mode is on by default):
    div-by-zero -> NULL (reference src/array/ops.rs:159-168), permissive
    casts, UTC timestamps."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # registry queries were authored under Spark's default LTZ
    # timestamp type; the reference-dialect executor flips the session
    # to NTZ, so re-pin here to stay immune to interleaving
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
    try:  # dialect executor pins single-slice VALUES writes; undo here
        spark.conf.unset("spark.sql.leafNodeDefaultParallelism")
    except Exception:
        pass


# Per-(session, sf_dir, table) DataFrame cache: parquet footer/schema
# inference and the events ns->us rewrite are driver-side work repeated
# identically for every query otherwise (~1.5 s/query of pure overhead
# in a 25-query bench run).
_df_cache: dict[tuple[int, str, str], DataFrame] = {}
_views_registered: dict[int, str] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_semantics(spark)
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (id(spark), sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects (PARQUET_TYPE_ILLEGAL).  Read it as raw int64
        # nanos and convert to microseconds — same truncation DuckDB
        # applies when it narrows ns -> us.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Only rewrite when the file really is ns-typed (read back as
        # int64): an events table RE-written by this engine (COPY, the
        # scaling harness) is already us-typed TIMESTAMP.
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, not `/`: float division round-trips the
            # int64 nanos through double (2^53 mantissa) and drifts
            # by 1 us.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    else:
        df = spark.read.parquet(path)
    _df_cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can use them.
    Idempotent per (session, sf_dir) — re-registration is skipped."""
    if _views_registered.get(id(spark)) == sf_dir:
        return
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    _views_registered[id(spark)] = sf_dir


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` -> DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load(self._spark, self._sf_dir, name)
