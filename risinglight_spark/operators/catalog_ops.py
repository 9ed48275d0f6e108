"""DDL / DML / catalog surface: CREATE TABLE + INSERT + DELETE + DROP,
CREATE VIEW, SQL UDFs (CREATE FUNCTION), COPY round-trips, pg_catalog
system tables, EXPLAIN-as-data, SET/PRAGMA session vars.

Reference parity:
- CREATE TABLE with cast+reorder INSERT: src/executor/insert.rs (the
  reference reorders and casts the VALUES rows into the declared
  schema); DELETE: src/executor/delete.rs — Spark parquet tables are
  immutable, so delete is expressed as the copy-on-write
  INSERT OVERWRITE ... WHERE NOT(cond) (same observable semantics the
  reference's tombstones give).
- CREATE VIEW: src/catalog/table.rs:41-43 (views re-execute a stored
  plan — temp views are exactly that).
- CREATE FUNCTION: src/binder/expr.rs:379-434 expands the SQL UDF body
  inline at bind time; Spark 4 SQL-body UDFs do the same, and the
  oracle replays the *expanded* expression, which is the semantics
  being claimed.
- pg_catalog.pg_tables / pg_attribute: src/executor/system_table_scan.rs:27-34.
- EXPLAIN / PRAGMA / SET: src/executor/explain.rs, src/db.rs.

DDL state lives in per-call temp views / temp scratch dirs — nothing
leaks between queries and nothing is written into the repo.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from risinglight_spark.operators import Tables, register_views
from risinglight_spark.registry import register
from risinglight_spark.tables import TABLES


@register(
    "ddl_create_insert_delete",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'alpha', 1.5),
      (3, 'gamma', NULL)
    ) AS t(id, name, val)
    """,
    doc="CREATE TABLE (declared schema) -> INSERT with column "
    "reordering + casts (insert.rs semantics) -> copy-on-write DELETE "
    "-> final scan.  Runs against a scratch parquet location.",
)
def ddl_create_insert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    loc = tempfile.mkdtemp(prefix="rl_ddl_")
    spark.sql("DROP TABLE IF EXISTS rl_ddl_t")
    spark.sql(
        "CREATE TABLE rl_ddl_t (id INT, name STRING, val DOUBLE) "
        f"USING parquet LOCATION '{os.path.join(loc, 't')}'"
    )
    # INSERT with reordered column list + int->double cast, like the
    # reference's insert executor (cast+reorder to the declared schema).
    spark.sql(
        "INSERT INTO rl_ddl_t (val, id, name) VALUES "
        "(CAST(3 AS DOUBLE) / 2, 1, 'alpha'), (2.5, 2, 'beta'), "
        "(NULL, 3, 'gamma')"
    )
    # DELETE FROM rl_ddl_t WHERE id = 2 — parquet tables are immutable,
    # so express it copy-on-write: stage the keep-set, then overwrite
    # (Spark refuses to overwrite a table it is also reading).
    staging = os.path.join(loc, "staging")
    spark.sql("SELECT * FROM rl_ddl_t WHERE NOT (id = 2)").write.mode(
        "overwrite"
    ).parquet(staging)
    spark.read.parquet(staging).write.insertInto("rl_ddl_t", overwrite=True)
    out = spark.sql("SELECT id, name, val FROM rl_ddl_t")
    # Deliberate driver materialization, bounded by CATALOG size (a
    # 3-row DDL demo table here; never corpus data): the result must
    # survive the DROP below, so it is detached from the table's scan
    # plan by round-tripping through the driver.  Not a scale concern.
    result = spark.createDataFrame(out.collect(), out.schema)
    spark.sql("DROP TABLE IF EXISTS rl_ddl_t")
    return result


@register(
    "ddl_create_view",
    oracle="""
    SELECT n_name, count(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="CREATE VIEW stores a plan; scans re-execute it "
    "(catalog/table.rs:41-43).  Temp view + re-select.",
)
def ddl_create_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW rl_cust_by_nation AS "
        "SELECT n_name, count(*) AS n_cust "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    )
    return spark.sql("SELECT * FROM rl_cust_by_nation")


@register(
    "ddl_sql_udf",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * (1.0 + 0.08) AS taxed,
           (o_totalprice * (1.0 + 0.08)) * (1.0 + 0.08) AS taxed_twice
    FROM orders WHERE o_orderkey < 100
    """,
    doc="SQL UDF (CREATE FUNCTION ... RETURN expr) — the reference "
    "expands the body inline at bind time (binder/expr.rs:379-434); "
    "the oracle replays the expanded expression, including nested "
    "invocation.",
)
def ddl_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rl_tax(p DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 + 0.08)"
    )
    return spark.sql(
        "SELECT o_orderkey, rl_tax(o_totalprice) AS taxed, "
        "rl_tax(rl_tax(o_totalprice)) AS taxed_twice "
        "FROM orders WHERE o_orderkey < 100"
    )


@register(
    "copy_roundtrip_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="COPY TO csv (header, custom delimiter) then COPY FROM with a "
    "declared schema (copy_from_file.rs csv options); the round trip "
    "must be the identity.",
)
def copy_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_copy_"), "nation_csv")
    t.nation.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).options(header=True, delimiter="|").csv(loc)
    return (
        spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .options(header=True, delimiter="|")
        .csv(loc)
    )


@register(
    "catalog_pg_tables",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('postgres', '{t}')" for t in sorted(TABLES))
    + ") AS t(schemaname, tablename)",
    doc="pg_catalog.pg_tables emulation over the session catalog "
    "(system_table_scan.rs:27-34; reference default schema is "
    "'postgres').",
)
def catalog_pg_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    rows = [
        Row(schemaname="postgres", tablename=v.name)
        for v in spark.catalog.listTables()
        if v.name in TABLES
    ]
    return spark.createDataFrame(
        sorted(rows, key=lambda r: r.tablename),
        "schemaname STRING, tablename STRING",
    )


@register(
    "catalog_pg_attribute",
    oracle="""
    SELECT * FROM (VALUES
      ('nation', 'n_nationkey', 1), ('nation', 'n_name', 2),
      ('nation', 'n_regionkey', 3),
      ('region', 'r_regionkey', 1), ('region', 'r_name', 2)
    ) AS t(tablename, attname, attnum)
    """,
    doc="pg_catalog.pg_attribute emulation: ordered column metadata "
    "from the catalog (system_table_scan.rs).",
)
def catalog_pg_attribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    rows = []
    for tbl in ("nation", "region"):
        for i, col in enumerate(spark.catalog.listColumns(tbl)):
            rows.append(Row(tablename=tbl, attname=col.name, attnum=i + 1))
    return spark.createDataFrame(
        rows, "tablename STRING, attname STRING, attnum INT"
    )


@register(
    "explain_plan_props",
    oracle="""
    SELECT * FROM (VALUES
      ('filter_pushed_to_scan', true),
      ('projection_pruned', true)
    ) AS t(plan_property, holds)
    """,
    doc="EXPLAIN as data (explain.rs / PRAGMA-style introspection): "
    "assert the physical plan pushes the filter into the parquet scan "
    "and prunes the read schema to the projected columns.",
)
def explain_plan_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    q = t.orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey", "o_totalprice"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey" in plan
    pruned = (
        "o_custkey" not in plan.split("ReadSchema")[-1]
        if "ReadSchema" in plan
        else False
    )
    return spark.createDataFrame(
        [
            Row(plan_property="filter_pushed_to_scan", holds=bool(pushed)),
            Row(plan_property="projection_pruned", holds=bool(pruned)),
        ],
        "plan_property STRING, holds BOOLEAN",
    )


@register(
    "pragma_session_vars",
    oracle="""
    SELECT * FROM (VALUES
      ('spark.sql.ansi.enabled', 'false'),
      ('spark.sql.session.timeZone', 'UTC'),
      ('rl.custom.flag', 'on')
    ) AS t(var, value)
    """,
    doc="SET / PRAGMA session variables (db.rs PRAGMA, SET handling): "
    "set a custom var, read back the semantic pins + the custom var.",
)
def pragma_session_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("rl.custom.flag", "on")
    rows = [
        Row(var=k, value=spark.conf.get(k))
        for k in (
            "spark.sql.ansi.enabled",
            "spark.sql.session.timeZone",
            "rl.custom.flag",
        )
    ]
    return spark.createDataFrame(rows, "var STRING, value STRING")


@register(
    "ddl_create_index",
    oracle="""
    SELECT * FROM (VALUES
      ('orders_pk_idx', 'orders', 'btree', 'o_orderkey', true),
      ('emb_ivf_idx', 'embeddings', 'ivfflat', 'embedding', false),
      ('emb_hnsw_idx', 'embeddings', 'hnsw', 'embedding', true)
    ) AS t(indexname, tablename, method, keycol, is_noop)
    """,
    doc="CREATE INDEX parity (binder/create_index.rs:33-41, IndexType "
    "Btree | Hnsw | IvfFlat): the DDL actually runs through the shared "
    "statement executor, which records each index's USING method.  "
    "btree and hnsw are accepted as declared-only metadata (exactly "
    "the reference's behavior — its mem engine never consults them; "
    "Spark relies on parquet min/max + Z-order for btree's job), "
    "ivfflat metadata feeds the ANN bucketed path (ann_lsh_bucketed).  "
    "pg_indexes-style listing comes back as data.",
)
def ddl_create_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.sql.executor import StatementExecutor

    register_views(spark, sf_dir)
    ex = StatementExecutor(spark)
    for ddl in (
        "CREATE INDEX orders_pk_idx ON orders USING btree (o_orderkey)",
        "CREATE INDEX emb_ivf_idx ON embeddings USING ivfflat (embedding)",
        "CREATE INDEX emb_hnsw_idx ON embeddings USING hnsw (embedding)",
    ):
        ex.execute_statement(ddl)
    rows = [
        Row(
            indexname=name,
            tablename=table,
            method=ex.index_types[name],
            keycol=cols[0],
            is_noop=ex.index_types[name] != "ivfflat",
        )
        for name, table, cols, _ in ex.indexes
    ]
    from risinglight_spark.sql.executor import restore_dialect_confs

    restore_dialect_confs(spark)
    return spark.createDataFrame(
        rows,
        "indexname STRING, tablename STRING, method STRING, "
        "keycol STRING, is_noop BOOLEAN",
    )


@register(
    "analyze_query_stats",
    oracle="""
    SELECT * FROM (VALUES
      ('scan_rows',   (SELECT count(*) FROM orders)),
      ('filter_rows', (SELECT count(*) FROM orders WHERE o_totalprice > 100000)),
      ('output_rows', (SELECT count(DISTINCT o_orderpriority) FROM orders
                       WHERE o_totalprice > 100000))
    ) AS t(stage, actual_rows)
    """,
    doc="EXPLAIN ANALYZE parity (the reference's `analyze` executor "
    "reports actual rows per operator): per-stage actual cardinalities "
    "of a scan -> filter -> aggregate pipeline returned as data.",
)
def analyze_query_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    scan = t.orders
    filt = scan.filter(F.col("o_totalprice") > 100000)
    out = filt.select("o_orderpriority").distinct()
    rows = [
        Row(stage="scan_rows", actual_rows=scan.count()),
        Row(stage="filter_rows", actual_rows=filt.count()),
        Row(stage="output_rows", actual_rows=out.count()),
    ]
    return spark.createDataFrame(rows, "stage STRING, actual_rows BIGINT")


def _plan_estimate(df) -> tuple[int | None, int]:
    """(estimated rowCount or None, estimated sizeInBytes) of the
    optimized plan's top node — Spark's CBO Statistics, the analog of
    the reference's per-node cost/rows display."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    est_rows = int(str(rc.get())) if rc.isDefined() else None
    return est_rows, int(str(stats.sizeInBytes()))


@register(
    "explain_cost_estimates",
    oracle="""
    SELECT * FROM (VALUES
      ('scan',
       (SELECT count(*) FROM orders), true, true, true),
      ('filter',
       (SELECT count(*) FROM orders WHERE o_totalprice > 100000),
       true, true, true)
    ) AS t(stage, actual_rows, has_estimate, estimate_sane, has_size)
    """,
    doc="EXPLAIN cost/row-estimate parity (reference planner prints "
    "per-node cost + estimated rows — planner/explain.rs:442 LoC, "
    "cost model cost.rs:15-84; `\\explain` shows rows=N cost=C per "
    "node): ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS + "
    "spark.sql.cbo.enabled surfaces Catalyst's Statistics "
    "(rowCount/sizeInBytes) per optimized-plan node.  Checked "
    "properties: the analyzed scan's estimated rowCount equals the "
    "actual count exactly; the CBO filter estimate exists and lands "
    "in [0, scan_rows] (its exact value is a Spark selectivity "
    "formula, not portable data); both nodes carry a positive size "
    "estimate.  At 100 TB these estimates are what drive broadcast "
    "vs shuffle join picks — ANALYZE is how you feed them.",
)
def explain_cost_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # self-pin: a driver-supplied vanilla session has CBO off, and
    # without it stats().rowCount() is undefined for every node;
    # restored before returning so the toggle doesn't leak into the
    # caller's session
    cbo_prior = spark.conf.get("spark.sql.cbo.enabled", None)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        spark.sql("DROP TABLE IF EXISTS rl_cbo_orders")
        # external table at a fixed PER-PROCESS temp location (overwrite
        # reuses it across bench samples — a fresh mkdtemp per call
        # would leak one table-sized directory each; the pid suffix
        # keeps concurrent runs on one machine from clobbering each
        # other) rather than the warehouse, where a stale dir from an
        # interrupted run collides (LOCATION_ALREADY_EXISTS)
        loc = os.path.join(
            tempfile.gettempdir(), f"rl_cbo_stats_{os.getpid()}", "orders"
        )
        t.orders.select("o_orderkey", "o_totalprice").write.mode(
            "overwrite"
        ).option("path", loc).saveAsTable("rl_cbo_orders")
        spark.sql(
            "ANALYZE TABLE rl_cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        scan = spark.table("rl_cbo_orders")
        filt = scan.filter(F.col("o_totalprice") > 100000)
        scan_actual, filt_actual = scan.count(), filt.count()
        scan_est, scan_size = _plan_estimate(scan)
        filt_est, filt_size = _plan_estimate(filt)
        rows = [
            Row(
                stage="scan",
                actual_rows=scan_actual,
                has_estimate=scan_est is not None,
                estimate_sane=scan_est == scan_actual,
                has_size=scan_size > 0,
            ),
            Row(
                stage="filter",
                actual_rows=filt_actual,
                has_estimate=filt_est is not None,
                estimate_sane=filt_est is not None
                and 0 <= filt_est <= scan_actual,
                has_size=filt_size > 0,
            ),
        ]
    finally:
        # restore the CBO toggle and drop the scratch table even on
        # failure — an exception mid-body must not leak either into the
        # shared session (round-4 advisor finding)
        if cbo_prior is None:
            spark.conf.unset("spark.sql.cbo.enabled")
        else:
            spark.conf.set("spark.sql.cbo.enabled", cbo_prior)
        spark.sql("DROP TABLE IF EXISTS rl_cbo_orders")
    return spark.createDataFrame(
        rows,
        "stage STRING, actual_rows BIGINT, has_estimate BOOLEAN, "
        "estimate_sane BOOLEAN, has_size BOOLEAN",
    )


@register(
    "copy_roundtrip_json",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
    doc="COPY round trip through JSON lines (a second source format "
    "beyond CSV; schema declared on read).",
)
def copy_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_copyj_"), "region_json")
    t.region.select("r_regionkey", "r_name").write.mode("overwrite").json(loc)
    return (
        spark.read.schema("r_regionkey INT, r_name STRING").json(loc)
    )


@register(
    "copy_partitioned_parquet",
    oracle="""
    SELECT n_regionkey, count(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    doc="Hive-partitioned parquet write (partitionBy) + partition-"
    "pruned read-back: the storage layout that turns per-key probes "
    "into directory pruning at 100 TB.  The rollup read back from the "
    "partitioned copy must equal the source aggregate.",
)
def copy_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_part_"), "nation_parted")
    t.nation.write.mode("overwrite").partitionBy("n_regionkey").parquet(loc)
    back = spark.read.parquet(loc)
    return back.groupBy("n_regionkey").agg(F.count("*").alias("n")).select(
        F.col("n_regionkey").cast("int").alias("n_regionkey"), "n"
    )


@register(
    "copy_roundtrip_orc",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    """,
    doc="COPY round trip through ORC (third columnar source format; "
    "native vectorized reader, predicate pushdown like parquet).",
)
def copy_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_copyo_"), "supplier_orc")
    t.supplier.select("s_suppkey", "s_name", "s_acctbal").write.mode(
        "overwrite"
    ).orc(loc)
    return spark.read.orc(loc)


@register(
    "source_tbl_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="Custom source connector (Spark 4 Python DataSource API): "
    "write nation as TPC-H .tbl (pipe-delimited, TRAILING pipe — "
    "the format the reference's COPY ingests, "
    "tests/sql/tpch/_create.slt) sharded into multiple files, read "
    "it back via the rl_tbl connector whose partition planner maps "
    "one split per file.  Round trip must be the identity.",
)
def source_tbl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.sources.tbl import register_tbl_source

    register_tbl_source(spark)
    t = Tables(spark, sf_dir)
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_tbl_"), "nation_tbl")
    # trailing-pipe format: an empty last column makes the csv writer
    # emit "...|" exactly; 2 shards exercise the per-file splits
    t.nation.select(
        "n_nationkey", "n_name", "n_regionkey", F.lit("").alias("_t")
    ).repartition(2).write.mode("overwrite").options(
        delimiter="|", emptyValue=""
    ).csv(loc)
    for f in os.listdir(loc):  # csv writer metadata is not tbl data
        if f.startswith("_"):
            os.remove(os.path.join(loc, f))
    return (
        spark.read.format("rl_tbl")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .load(loc)
    )


# -- Z-order clustered COPY --------------------------------------------------

ZORDER_BITS = 12  # per-dimension resolution (4096 cells/dim)
ZORDER_FILES = 8


def _zorder_key_sql(xcol: str, ycol: str) -> str:
    """Morton interleave of two pre-scaled ints (SQL expression —
    codegen'd integer bit ops, no UDF)."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(
            f"shiftleft(shiftright({xcol}, {i}) & 1, {2 * i})"
        )
        terms.append(
            f"shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_write_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders Z-order-clustered on (o_custkey, o_orderdate) and
    return the output path.  Shared by the registered query and the
    clustering-quality test."""
    t = Tables(spark, sf_dir)
    stats = t.orders.agg(
        F.max("o_custkey").alias("max_ck"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("day_span"),
        F.min("o_orderdate").alias("min_od"),
    )
    scaled = (
        t.orders.crossJoin(F.broadcast(stats))
        .withColumn(
            "zx",
            (F.col("o_custkey") * (1 << ZORDER_BITS))
            / (F.col("max_ck") + 1),
        )
        .withColumn(
            "zy",
            (
                F.datediff(F.col("o_orderdate"), F.col("min_od"))
                * (1 << ZORDER_BITS)
            )
            / (F.col("day_span") + 1),
        )
        .withColumn("zx", F.col("zx").cast("long"))
        .withColumn("zy", F.col("zy").cast("long"))
        .withColumn("zkey", F.expr(_zorder_key_sql("zx", "zy")))
    )
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_zorder_"), "orders_z")
    (
        scaled.drop("max_ck", "day_span", "min_od", "zx", "zy")
        .repartitionByRange(ZORDER_FILES, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(loc)
    )
    return loc


@register(
    "copy_zorder_clustered",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           (CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0, 0)
                 AS BIGINT)) AS DOUBLE) / 100.0) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Z-order clustered COPY: orders written sorted by the Morton "
    "interleave of (o_custkey, o_orderdate-rank) — multi-dimensional "
    "clustering so parquet min/max row-group pruning works for filters "
    "on EITHER dimension (a linear sort only prunes its leading "
    "column).  The interleave is a pure integer bit expression "
    "(codegen'd, no UDF); the write is one range shuffle on the key.  "
    "Read-back aggregate must equal the source (the oracle); "
    "per-file span tightness is asserted in "
    "tests/test_plans.py::test_zorder_clusters_both_dimensions.",
)
def copy_zorder_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    loc = zorder_write_orders(spark, sf_dir)
    back = spark.read.parquet(loc)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (
            F.sum(
                F.round(F.col("o_totalprice").cast("double") * 100.0, 0).cast(
                    "long"
                )
            ).cast("double")
            / 100.0
        ).alias("total"),
    )


# -- small-file compaction (lakehouse maintenance) ---------------------------

COMPACT_TARGET_FILES = 4


@register(
    "copy_compact_small_files",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           sum(o_orderkey)::BIGINT AS key_sum
    FROM orders GROUP BY o_orderpriority
    """,
    doc=f"Small-file compaction: write orders fragmented (64 files — "
    "the 'too many tiny files' state every streaming ingest produces), "
    f"then compact to {COMPACT_TARGET_FILES} files and verify the "
    "rewrite preserved content exactly (grouped counts + key sums over "
    "the re-read equal the source — the oracle).  The compaction is "
    "repartition-by-nothing + write: one shuffle sized by target file "
    "count, the pattern behind OPTIMIZE/rewriteDataFiles in lakehouse "
    "table formats.  At 100 TB compaction runs per partition "
    "directory, bounded by partition size, embarrassingly parallel "
    "across partitions.  File counts asserted in tests/test_plans.py.",
)
def copy_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="rl_compact_")
    frag = os.path.join(base, "fragmented")
    compact = os.path.join(base, "compacted")
    t.orders.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(
        COMPACT_TARGET_FILES
    ).write.mode("overwrite").parquet(compact)
    return (
        spark.read.parquet(compact)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


# -- parquet compression codecs ----------------------------------------------


@register(
    "copy_parquet_codecs",
    oracle="""
    SELECT 'snappy' AS codec, count(*) AS n,
           sum(o_orderkey)::BIGINT AS key_sum FROM orders
    UNION ALL
    SELECT 'zstd', count(*), sum(o_orderkey)::BIGINT FROM orders
    UNION ALL
    SELECT 'gzip', count(*), sum(o_orderkey)::BIGINT FROM orders
    """,
    doc="Parquet compression codecs (snappy / zstd / gzip): write the "
    "same table under each codec and verify every roundtrip preserves "
    "content exactly.  Codec choice is the 100 TB storage-cost vs "
    "CPU trade (zstd for cold data, snappy for hot shuffle-adjacent "
    "tables); this pins that all three paths are available and "
    "lossless.  Compressed sizes are environment-dependent so the "
    "oracle checks content, not bytes.",
)
def copy_parquet_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="rl_codec_")
    out = None
    for codec in ("snappy", "zstd", "gzip"):
        loc = os.path.join(base, codec)
        t.orders.write.mode("overwrite").option(
            "compression", codec
        ).parquet(loc)
        part = (
            spark.read.parquet(loc)
            .agg(
                F.count("*").alias("n"),
                F.sum("o_orderkey").alias("key_sum"),
            )
            .select(F.lit(codec).alias("codec"), "n", "key_sum")
        )
        out = part if out is None else out.unionAll(part)
    return out
