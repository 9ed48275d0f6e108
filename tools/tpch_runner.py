"""Shared statement runner for the reference's TPC-H q{N}.sql files.

Used by both tests/test_tpch_dbgen.py (correctness vs DuckDB) and
tools/tpch_sf1_bench.py (throughput), so the view semantics — the q15
determinism fix in particular — live in exactly one place.

Views are materialized ONCE per CREATE VIEW.  q15's revenue view feeds
two consumers (the outer join and the max() subquery); re-evaluating a
parallel double sum with different partial orders can disagree in the
last ULP and flip the `total_revenue = max(...)` equality to 0 rows at
SF1.  The reference evaluates views by re-running the stored plan
single-threaded (deterministic), so a single materialized evaluation is
the faithful semantics here — on BOTH engines (DuckDB's parallel
aggregation is order-nondeterministic for double sums too).
"""

from __future__ import annotations

import re

VIEW_RE = r"(?is)^create\s+view\s+(\w+)\s*(?:\(([^)]*)\))?\s*as\s*(.+)$"
DROP_RE = r"(?i)^drop\s+view\s+(\w+)$"


def statements(path: str) -> list[str]:
    """Split a reference .sql file into statements ('--' comments
    stripped first so a comment containing ';' cannot break the
    split; TPC-H query text has no '--' inside string literals)."""
    with open(path) as f:
        sql = re.sub(r"--[^\n]*", "", f.read())
    return [s.strip() for s in sql.split(";") if s.strip()]


def run_spark_stmt(spark, stmt: str, checkpoints: dict | None = None):
    """Execute one statement on Spark; returns collected rows for
    queries, None for view DDL.  Pass a dict as ``checkpoints`` to
    have materialized view DataFrames unpersisted on DROP/replace
    (otherwise their checkpoint blocks stay pinned for the session)."""
    s = stmt.strip()
    m = re.match(VIEW_RE, s)
    if m:
        name, collist, body = m.group(1), m.group(2), m.group(3)
        df = spark.sql(body)
        if collist:
            df = df.toDF(*[c.strip() for c in collist.split(",")])
        df = df.localCheckpoint(eager=True)
        df.createOrReplaceTempView(name)
        if checkpoints is not None:
            old = checkpoints.pop(name, None)
            if old is not None:
                old.unpersist()
            checkpoints[name] = df
        return None
    m = re.match(DROP_RE, s)
    if m:
        name = m.group(1)
        spark.catalog.dropTempView(name)
        if checkpoints is not None:
            old = checkpoints.pop(name, None)
            if old is not None:
                old.unpersist()
        return None
    return spark.sql(s).collect()


def run_duck_stmt(con, stmt: str):
    """Execute one statement on DuckDB with the same materialize-once
    view semantics; returns fetched rows for queries, None for DDL."""
    s = stmt.strip()
    m = re.match(VIEW_RE, s)
    if m:
        name, collist, body = m.group(1), m.group(2), m.group(3)
        sub = f"({body}) AS _v({collist})" if collist else f"({body}) AS _v"
        con.sql(
            f"CREATE OR REPLACE TEMP TABLE {name} AS SELECT * FROM {sub}"
        )
        return None
    m = re.match(DROP_RE, s)
    if m:
        con.sql(f"DROP TABLE IF EXISTS {m.group(1)}")
        return None
    return con.sql(s).fetchall()
