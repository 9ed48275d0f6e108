"""Statement executor for the reference SQL dialect on Spark.

Single home for the semantics that need more than a textual rewrite
(used by both the interactive shell and the sqllogictest runner):

- DELETE ... WHERE -> copy-on-write table rewrite (plain parquet tables
  have no row-level delete; the reference tombstones rows in its LSM
  storage — src/executor/delete.rs — and a Delta/Iceberg sink would do
  this natively at scale),
- CREATE INDEX -> accepted as metadata-only (reference
  src/executor/create_index.rs builds a btree the mem engine never
  consults; Spark's real analog — bucketed layout — is exercised by
  join_bucketed_colocated),
- PRAGMA -> nearest Spark session toggle,
- CREATE FUNCTION (SQL-UDF macro DDL) -> Spark 4 native SQL UDF,
- CREATE TABLE -> constraint-stripped, type-mapped, parquet-backed
  scratch table.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from risinglight_spark.sql.dialect import (
    _CREATE_INDEX_RE,
    _DELETE_RE,
    _DROP_VIEW_RE,
    _PRAGMA_MAP,
    _PRAGMA_RE,
    rewrite_create_function,
    rewrite_ddl,
    rewrite_query,
)


class StatementExecutor:
    """Executes one reference-dialect statement at a time against a
    SparkSession.  ``execute_statement`` returns an outcome tag:
    'ok' or 'unsupported-pragma'."""

    def __init__(self, spark, scratch: str | None = None):
        self.spark = spark
        self.scratch = scratch or tempfile.mkdtemp(prefix="rl_sql_")
        self.created: list[str] = []
        # reference INSERT semantics are permissive (string literals
        # into typed columns, e.g. type.slt dates); Spark 4 defaults
        # to ANSI store assignment
        spark.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")

    def cleanup(self) -> None:
        for t in self.created:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(self.scratch, ignore_errors=True)

    def execute_statement(self, sql: str) -> str:
        dm = _DELETE_RE.match(sql)
        if dm:
            t, cond = dm.group(1), dm.group(2)
            tbl = self.spark.table(t)
            keep = (
                tbl.filter(f"NOT coalesce(({cond}), false)")
                if cond
                else tbl.limit(0)
            )
            # snapshot driver-side before the overwrite: writing a
            # parquet table from a plan that reads the same files
            # would truncate its own input (fine at slt scale; a
            # Delta/Iceberg sink does this transactionally instead)
            snap = self.spark.createDataFrame(keep.collect(), tbl.schema)
            snap.write.insertInto(t, overwrite=True)
            return "ok"
        if _CREATE_INDEX_RE.match(sql):
            return "ok"
        vm = _DROP_VIEW_RE.match(sql)
        if vm:
            # Spark drops one view per statement
            for v in vm.group(1).split(","):
                self.spark.sql(f"DROP VIEW IF EXISTS {v.strip()}")
            return "ok"
        pm = _PRAGMA_RE.match(sql)
        if pm:
            mapped = _PRAGMA_MAP.get(pm.group(1).lower())
            if mapped is None:
                return "unsupported-pragma"
            self.spark.sql(mapped)
            return "ok"
        fn_sql = rewrite_create_function(sql)
        if fn_sql:
            self.spark.sql(fn_sql)
            return "ok"
        rewritten, created = rewrite_ddl(sql, self.scratch)
        if created:
            self.spark.sql(f"DROP TABLE IF EXISTS {created}")
            shutil.rmtree(
                os.path.join(self.scratch, created), ignore_errors=True
            )
            self.created.append(created)
        self.spark.sql(rewritten)
        return "ok"

    def execute_query(self, sql: str):
        """Reference-dialect query -> DataFrame."""
        return self.spark.sql(rewrite_query(sql))
