"""Embedded open()/open_in_memory() API parity (reference
src/python/mod.rs:25-67): open -> query -> rows, durability across
re-open, and agreement with the shell on the same statements."""

from __future__ import annotations

import risinglight_spark


def test_open_in_memory_query_rows(spark):
    db = risinglight_spark.open_in_memory()
    assert db.query("CREATE TABLE emt (a INT, b STRING)") == []
    assert db.query("INSERT INTO emt VALUES (1, 'x'), (2, 'y')") == []
    rows = db.query("SELECT a, b FROM emt ORDER BY a")
    assert rows == [[1, "x"], [2, "y"]]
    # scalar expression queries work without any table
    assert db.query("SELECT 1 + 2") == [[3]]
    db.query("DROP TABLE emt")
    db.close()


def test_open_persists_across_reopen(spark, tmp_path):
    path = str(tmp_path / "db")
    db = risinglight_spark.open(path)
    db.query("CREATE TABLE pers (v INT)")
    db.query("INSERT INTO pers VALUES (10), (20), (30)")
    db.query("DELETE FROM pers WHERE v = 20")
    db.close()
    # simulate a fresh open: drop the catalog entry, keep the files
    spark.sql("DROP TABLE IF EXISTS pers")
    db2 = risinglight_spark.open(path)
    assert sorted(db2.query("SELECT v FROM pers")) == [[10], [30]]
    db2.query("DROP TABLE pers")
    db2.close()


def test_embedded_matches_shell(spark):
    from risinglight_spark.sql.shell import Shell

    db = risinglight_spark.open_in_memory()
    sh = Shell(spark)
    stmts = [
        "CREATE TABLE par_t (x INT, y DOUBLE)",
        "INSERT INTO par_t VALUES (1, 1.5), (2, NULL), (3, 4.5)",
    ]
    q = "SELECT x, y, x * 2 AS d FROM par_t ORDER BY x"
    for s in stmts:
        db.query(s)
    emb = db.query(q)
    # the shell shares the session catalog, so par_t resolves there too
    shl = [list(r) for r in sh.run(q).collect()]
    assert emb == shl == [[1, 1.5, 2], [2, None, 4], [3, 4.5, 6]]
    db.query("DROP TABLE par_t")
    db.close()


def test_close_isolates_databases(spark, tmp_path):
    """close() must detach the catalog entries so a later open() at a
    DIFFERENT path does not see the previous database's tables."""
    import pytest

    db1 = risinglight_spark.open(str(tmp_path / "a"))
    db1.query("CREATE TABLE iso_t (v INT)")
    db1.query("INSERT INTO iso_t VALUES (1)")
    db1.close()
    db2 = risinglight_spark.open(str(tmp_path / "b"))
    with pytest.raises(Exception):
        db2.query("SELECT * FROM iso_t")
    db2.close()


def test_empty_table_survives_reopen(spark, tmp_path):
    path = str(tmp_path / "db")
    db = risinglight_spark.open(path)
    db.query("CREATE TABLE emp_t (v INT)")
    db.query("INSERT INTO emp_t VALUES (1)")
    db.query("DELETE FROM emp_t")
    assert db.query("SELECT count(*) AS n FROM emp_t") == [[0]]
    db.close()
    db2 = risinglight_spark.open(path)
    assert db2.query("SELECT count(*) AS n FROM emp_t") == [[0]]
    db2.close()
