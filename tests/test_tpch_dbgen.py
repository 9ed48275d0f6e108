"""UNADAPTED reference TPC-H q1-q22 over the dbgen-faithful corpus.

The reference's own query files (tests/sql/tpch/q{N}.sql — public SQL
text, read at test time) run verbatim on Spark AND DuckDB over the
same parquet tables produced by risinglight_spark/sources/dbgen.py,
and the result sets must match.  This closes the two gaps the adapted
registry entries carry on the driver's simplified fixtures: partsupp
exists (q2/q11/q16/q20 run unmodified), and every predicate literal
('GERMANY', '%BRASS', 'forest%', '%Customer%Complaints%') hits
dbgen-realistic selectivities instead of being substituted.

The quick class runs at SF 0.01 on every pytest invocation; the SF1
class replays the reference's tests/tpch-full.sh scale (6M lineitem)
and is marked slow.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from tpch_runner import (  # noqa: E402
    run_duck_stmt,
    run_spark_stmt,
    statements,
)

QUERY_DIR = "/root/reference/tests/sql/tpch"
TABLES = (
    "region nation supplier part partsupp customer orders lineitem".split()
)


def _canon_cell(v):
    """Sort key only — float cells are paired at 6 significant digits
    and then compared numerically with a tolerance (a fixed-precision
    string compare would split at half-way rounding boundaries, e.g.
    206078.9945 vs ...9944999 from double-sum association drift)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return str(v)[:10] if isinstance(v, date) else v.isoformat()
    return str(v)


def _canon_rows(rows) -> list[tuple]:
    return sorted(
        (tuple(row) for row in rows),
        key=lambda row: tuple(_canon_cell(v) for v in row),
    )


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-6)
    return _canon_cell(a) == _canon_cell(b)


def _rows_equal(got: list[tuple], want: list[tuple]) -> bool:
    return len(got) == len(want) and all(
        len(g) == len(w) and all(_cells_equal(a, b) for a, b in zip(g, w))
        for g, w in zip(got, want)
    )


_CHECKPOINTS: dict = {}  # view name -> checkpointed df (unpersist on drop)


def _statements(path: str) -> list[str]:
    return statements(path)


def _run_spark(spark, stmt: str):
    return run_spark_stmt(spark, stmt, _CHECKPOINTS)


def _run_duck(con, stmt: str):
    return run_duck_stmt(con, stmt)


def _check_all_queries(spark, con, dirpath: str) -> None:
    for qn in range(1, 23):
        last_spark = last_duck = None
        for stmt in _statements(os.path.join(QUERY_DIR, f"q{qn}.sql")):
            rs = _run_spark(spark, stmt)
            if rs is not None:
                last_spark = rs
            rd = _run_duck(con, stmt)
            if rd is not None:
                last_duck = rd
        got = _canon_rows(last_spark)
        want = _canon_rows(last_duck)
        assert len(got) == len(want), (
            f"q{qn}: {len(got)} rows (spark) != {len(want)} (duckdb)"
        )
        assert _rows_equal(got, want), (
            f"q{qn}: result mismatch\n{got[:3]}\n{want[:3]}"
        )


def _setup(spark, out_dir: str, sf: float):
    from risinglight_spark.sources.dbgen import generate

    paths = generate(spark, out_dir, sf)
    for t in TABLES:
        spark.read.parquet(paths[t]).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{paths[t]}/*.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def duck_001(spark):
    con = _setup(spark, "/tmp/dbgen_sf0.01", 0.01)
    yield con
    con.close()


def test_unadapted_tpch_at_sf001(spark, duck_001):
    _check_all_queries(spark, duck_001, QUERY_DIR)


def test_partsupp_queries_are_nonempty(spark, duck_001):
    """q2/q11/q16 must exercise real data, not pass vacuously; q20's
    supplier set is checked one filter up (the final IRAQ nation cut
    can legitimately land on 0 of the ~4 IRAQ suppliers at SF 0.01)."""
    for qn, min_rows in ((2, 1), (11, 10), (16, 10)):
        stmts = _statements(os.path.join(QUERY_DIR, f"q{qn}.sql"))
        rows = None
        for s in stmts:
            r = _run_duck(duck_001, s)
            if r is not None:
                rows = r
        assert rows is not None and len(rows) >= min_rows, (
            f"q{qn} vacuous: {rows}"
        )
    qualifying = duck_001.sql(
        """
        SELECT count(DISTINCT ps_suppkey) FROM partsupp
        WHERE ps_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'forest%')
          AND ps_availqty > (
                SELECT 0.5 * coalesce(sum(l_quantity), 0) FROM lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1997-01-01')
        """
    ).fetchone()[0]
    assert qualifying >= 1, "q20 inner supplier set is empty"


@pytest.mark.slow
def test_unadapted_tpch_at_sf1(spark):
    con = _setup(spark, "/tmp/dbgen_sf1", 1.0)
    try:
        _check_all_queries(spark, con, QUERY_DIR)
        n = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
        assert n > 5_500_000  # dbgen-SF1 cardinality
    finally:
        con.close()
