"""Embedded Python API — parity with the reference's ``risinglight``
Python module (reference src/python/mod.rs:25-67: ``open(path)`` /
``open_in_memory()`` -> ``PythonDatabase.query(sql) -> Vec<Vec<...>>``).

``open(path)`` binds a database to a directory: tables created through
``query`` live as parquet under ``path``, and re-opening the same path
re-registers every table found there (the reference persists through
its LSM storage; parquet directories are this engine's durable form —
the catalog entry is rebuilt from the files, schema inferred from
parquet footers).  ``open_in_memory()`` uses a throwaway tempdir.

Execution routes through the same ``StatementExecutor`` the shell and
the sqllogictest runner use, so the full dialect surface (COPY,
copy-on-write DELETE, PRAGMA, CREATE FUNCTION, ``\\dt``) behaves
identically across all three entry points.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from risinglight_spark.session import get_spark
from risinglight_spark.sql.executor import StatementExecutor
from risinglight_spark.sql.shell import is_query


class Database:
    """Embedded database handle (reference PythonDatabase,
    src/python/mod.rs:14-41): ``query(sql)`` returns rows as plain
    Python lists, like datachunk_to_python_list."""

    def __init__(self, path: str, spark=None, ephemeral: bool = False):
        self.path = path
        # open_in_memory() databases own a throwaway tempdir; close()
        # removes it (round-4 advisor finding: one corpus-sized leaked
        # directory per open otherwise).  open(path) databases keep
        # their files — that is the durability contract.
        self._ephemeral = ephemeral
        self.spark = spark or get_spark(app_name="risinglight_embedded")
        # table files land under the database path (durable across
        # opens), not a throwaway scratch dir
        self._ex = StatementExecutor(self.spark, scratch=path)
        self._reattach()

    def _reattach(self) -> None:
        """Re-register tables persisted by a previous open of this
        path: every child directory containing parquet files (or a
        Spark `_SUCCESS` write marker — an empty table writes the
        marker and may write no part files) becomes a table of the
        same name.  A marker-only directory with no readable footer
        has no recoverable schema and is skipped."""
        if not os.path.isdir(self.path):
            return
        for name in sorted(os.listdir(self.path)):
            loc = os.path.join(self.path, name)
            if not os.path.isdir(loc):
                continue
            entries = os.listdir(loc)
            if not any(f.endswith(".parquet") for f in entries) and (
                "_SUCCESS" not in entries
            ):
                continue
            if not self.spark.catalog.tableExists(name):
                try:
                    self.spark.sql(
                        f"CREATE TABLE {name} USING parquet LOCATION '{loc}'"
                    )
                except Exception:
                    continue  # no readable footer -> no schema
                self._ex.created.append(name)

    def query(self, sql: str) -> list[list]:
        """Run one statement; queries return rows (list of lists of
        Python values), DDL/DML return []."""
        sql = sql.strip().rstrip(";").strip()
        if not sql:
            return []
        if sql.startswith("\\"):
            df = self._ex.metacommand(sql[1:])
            return [list(r) for r in df.collect()]
        if is_query(sql):
            return [list(r) for r in self._ex.execute_query(sql).collect()]
        # same preamble execute_statement applies, so COPY behaves
        # identically across the embedded / shell / slt entry points
        from risinglight_spark.sql.dialect import rewrite_era_literals

        self._ex._pin_dialect_confs()
        sql = rewrite_era_literals(sql)
        copied = self._ex.copy_statement(sql)
        if copied is not None:
            return [list(r) for r in copied.collect()]
        self._ex.execute_statement(sql)
        return []

    def close(self) -> None:
        """Detach this database: drop its catalog entries from the
        shared session (files stay on disk — that is the durability)
        and restore session confs.  Without the drops, a later
        open() at a DIFFERENT path would still see this database's
        tables through the shared session catalog."""
        from risinglight_spark.sql.executor import restore_dialect_confs

        for t in self._ex.created:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        self._ex.created.clear()
        restore_dialect_confs(self.spark)
        if self._ephemeral:
            shutil.rmtree(self.path, ignore_errors=True)


def open(path: str) -> Database:  # noqa: A001 - mirrors the reference name
    """Open (or create) a database rooted at ``path`` (reference
    src/python/mod.rs:46-56)."""
    os.makedirs(path, exist_ok=True)
    return Database(path)


def open_in_memory() -> Database:
    """Open a throwaway database (reference src/python/mod.rs:59-66;
    in-memory there, a tempdir-backed parquet location here — the
    durable/ephemeral split is the same)."""
    return Database(tempfile.mkdtemp(prefix="rl_mem_"), ephemeral=True)
