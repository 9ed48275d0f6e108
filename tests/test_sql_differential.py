"""Seeded differential SQL fuzzing: random expression/query shapes run
through the engine's pinned-semantics session AND DuckDB over identical
parquet data, results compared as normalized multisets.

The 303 registry oracles verify every OPERATOR; the slt corpus replays
the reference's own test files.  What neither covers is the
combinatorial space of expression COMPOSITIONS (CASE inside a
comparison inside a filter under a grouped sum...).  This fuzzer
samples that space deterministically (fixed seed -> same queries every
run, so a failure is a reproducible regression, not flake) and asserts
cross-engine agreement, the same bar the oracle gate applies.

Grammar constraints keep the comparison exact, mirroring the rules the
handwritten oracles follow everywhere else:
- int literals/columns are small (no overflow ambiguity; Spark ANSI-off
  wraps, DuckDB widens — out of scope exactly as SURVEY.md pins it),
- division/modulo always guard the divisor with NULLIF (the div-by-zero
  pin has its own registry entries; compositions shouldn't re-test it),
- double aggregation goes through fixed-point (round -> BIGINT cast ->
  sum), the fpsum discipline, so partition order can't move a ulp,
- cross-engine ordering is never trusted: frames are sorted in pandas
  after normalization.

Env knob: SQLFUZZ_N (default 40 per shape) scales depth for the deep
run recorded in SCALE.md; the suite default keeps CI fast.
"""

from __future__ import annotations

import math
import os
import random

import duckdb
import pandas as pd
import pytest

N_PER_SHAPE = int(os.environ.get("SQLFUZZ_N", "40"))
SEED = 0xA10


# ---------------------------------------------------------------------------
# fixture: one typed table with NULLs, identical bytes for both engines
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    rng = random.Random(SEED)
    words = ["alpha", "Bravo", "charlie x", "", "dAta", "zebra", "ab", "Abc"]
    rows = []
    for i in range(64):
        rows.append(
            (
                i,
                rng.randint(0, 4),  # g: group key
                rng.choice([None, *range(-50, 51)]),  # i1
                rng.choice([None, *range(-9, 10)]),  # i2
                rng.choice([None, round(rng.uniform(-20, 20), 3)]),  # d1
                rng.choice([None, round(rng.uniform(-2, 2), 3)]),  # d2
                rng.choice([None, *words]),  # s1
                rng.choice([None, *words]),  # s2
                rng.choice([None, True, False]),  # b1
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["rid", "g", "i1", "i2", "d1", "d2", "s1", "s2", "b1"]
    )
    path = str(tmp_path_factory.mktemp("sqlfuzz") / "fz.parquet")
    sdf = spark.createDataFrame(
        pdf.astype(
            {
                "rid": "int64",
                "g": "int64",
                "i1": "Int64",
                "i2": "Int64",
                "d1": "float64",
                "d2": "float64",
                "b1": "object",
            }
        )
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(path)
    from risinglight_spark.tables import pin_semantics

    pin_semantics(spark)
    spark.read.parquet(path).createOrReplaceTempView("fz")
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW fz AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return spark, duck


# ---------------------------------------------------------------------------
# grammar
# ---------------------------------------------------------------------------


def int_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.35:
        return rng.choice(["i1", "i2", "g", str(rng.randint(-9, 9))])
    pick = rng.randrange(6)
    a, b = int_expr(rng, depth + 1), int_expr(rng, depth + 1)
    if pick == 0:
        return f"({a} + {b})"
    if pick == 1:
        return f"({a} - {b})"
    if pick == 2:
        return f"({a} * {b})"
    if pick == 3:
        return f"abs({a})"
    if pick == 4:
        return f"({a} % NULLIF({b}, 0))"
    return (
        f"(CASE WHEN {bool_expr(rng, depth + 1)} THEN {a} ELSE {b} END)"
    )


def dbl_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.4:
        # fractional literals are CAST to DOUBLE: Spark types `0.24` as
        # DECIMAL (exact arithmetic, as the reference does) where DuckDB
        # types it DOUBLE — a literal-TYPING policy difference, not a
        # computation bug; the deep run at N=400 caught it as a last-ulp
        # round() divergence.  The fuzzer pins the type so every engine
        # difference it reports is a real computation mismatch.
        return rng.choice(
            [
                "d1",
                "d2",
                f"CAST({round(rng.uniform(-5, 5), 2)!r} AS DOUBLE)",
            ]
        )
    pick = rng.randrange(5)
    a, b = dbl_expr(rng, depth + 1), dbl_expr(rng, depth + 1)
    if pick == 0:
        return f"({a} + {b})"
    if pick == 1:
        return f"({a} - {b})"
    if pick == 2:
        return f"({a} * {b})"
    if pick == 3:
        # scale-0 only: fractional-scale round() diverges on ties
        # (Spark rounds the shortest-decimal repr, DuckDB the binary
        # value), but every "x.5" shortest repr IS an exact binary
        # half (k+0.5 is always representable), so both engines see
        # the same tie and both round away from zero.
        return f"round({a}, 0)"
    return f"({a} / NULLIF({b}, 0.0))"


def str_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.45:
        return rng.choice(["s1", "s2", "'ab'", "'Xy z'", "''"])
    pick = rng.randrange(6)
    a = str_expr(rng, depth + 1)
    if pick == 0:
        return f"({a} || {str_expr(rng, depth + 1)})"
    if pick == 1:
        return f"upper({a})"
    if pick == 2:
        return f"lower({a})"
    if pick == 3:
        return f"substring({a}, 1, 4)"
    if pick == 4:
        return f"replace({a}, 'a', '_')"
    return f"trim({a})"


def bool_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2:
        kind = rng.randrange(4)
        if kind == 0:
            return f"({int_expr(rng, 2)} {rng.choice(['<', '<=', '=', '<>', '>', '>='])} {int_expr(rng, 2)})"
        if kind == 1:
            return f"({rng.choice(['i1', 'i2', 'd1', 's1', 'b1'])} IS {rng.choice(['', 'NOT '])}NULL)"
        if kind == 2:
            return f"(s1 LIKE '{rng.choice(['%a%', 'a%', '%z', '%b_a%', 'A%'])}')"
        return f"(i1 IN ({', '.join(str(rng.randint(-9, 9)) for _ in range(3))}))"
    pick = rng.randrange(7)
    if pick == 0:
        return f"({bool_expr(rng, depth + 1)} AND {bool_expr(rng, depth + 1)})"
    if pick == 1:
        return f"({bool_expr(rng, depth + 1)} OR {bool_expr(rng, depth + 1)})"
    if pick == 2:
        return f"(NOT {bool_expr(rng, depth + 1)})"
    if pick == 3:
        lo, hi = sorted(rng.sample(range(-9, 10), 2))
        return f"({int_expr(rng, 1)} BETWEEN {lo} AND {hi})"
    if pick == 4:
        return f"({dbl_expr(rng, 1)} {rng.choice(['<', '<=', '>', '>='])} {dbl_expr(rng, 1)})"
    if pick == 5:
        return f"({str_expr(rng, 1)} {rng.choice(['=', '<>', '<', '>'])} {str_expr(rng, 1)})"
    return bool_expr(rng, 2)


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def _normalize(df: pd.DataFrame) -> list[tuple]:
    import decimal

    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if hasattr(v, "item"):  # numpy scalar -> python
                v = v.item()
            if isinstance(v, decimal.Decimal):
                # Spark keeps decimal-literal arithmetic in DecimalType
                # where DuckDB yields DOUBLE; compare numerically.
                v = float(v)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<NULL>")
            elif isinstance(v, bool):
                vals.append(str(v))
            elif isinstance(v, float):
                if v == 0.0:
                    v = 0.0  # fold IEEE -0.0 (0.0*-x) into +0.0
                vals.append(f"{round(v, 8):.8f}")
            elif isinstance(v, int):
                vals.append(str(v))
            else:
                vals.append(f"s:{v}")
        out.append(tuple(vals))
    return sorted(out)


def _run_both(fuzz_env, sql: str) -> None:
    spark, duck = fuzz_env
    got = _normalize(spark.sql(sql).toPandas())
    want = _normalize(duck.execute(sql).df())
    assert got == want, f"engine mismatch for:\n{sql}\nspark={got[:5]}\nduck={want[:5]}"


# ---------------------------------------------------------------------------
# shapes
# ---------------------------------------------------------------------------


def test_projection_filter_differential(fuzz_env):
    rng = random.Random(SEED + 1)
    for _ in range(N_PER_SHAPE):
        cols = [
            f"CAST({int_expr(rng)} AS BIGINT) AS c0",
            # fixed-point, not round(x, 6): fractional-scale round() is
            # decimal-string-based in Spark (BigDecimal.valueOf) but
            # numeric in DuckDB, and a 240k-round deep run found a value
            # whose shortest decimal repr sits exactly on a "...5" digit
            # while the binary x*1e6 falls on the other side — the two
            # engines legitimately disagree by one ulp-at-scale.
            # Scale-0 rounding is safe (a shortest repr must round-trip,
            # so it can never fabricate a trailing .5), which is exactly
            # the repo-wide fpsum discipline.
            f"CAST(round(({dbl_expr(rng)}) * 100000.0, 0) AS BIGINT) AS c1",
            f"{str_expr(rng)} AS c2",
            f"{bool_expr(rng)} AS c3",
        ]
        sql = (
            f"SELECT rid, {', '.join(rng.sample(cols, rng.randint(2, 4)))} "
            f"FROM fz WHERE {bool_expr(rng)}"
        )
        _run_both(fuzz_env, sql)


def test_cte_nesting_differential(fuzz_env):
    # a two-level CTE chain: stage 1 projects computed columns under a
    # filter, stage 2 filters/aggregates over stage 1's outputs, the
    # outer query reads stage 2 — exercising name resolution and
    # optimizer flattening across WITH boundaries.
    rng = random.Random(SEED + 9)
    for _ in range(N_PER_SHAPE // 2):
        agg = rng.random() < 0.5
        outer = (
            "SELECT g2, count(*) AS a0, CAST(sum(k0) AS BIGINT) AS a1 "
            "FROM t2 GROUP BY g2"
            if agg
            else "SELECT rid, g2, k0 FROM t2 WHERE k0 IS NOT NULL"
        )
        sql = (
            f"WITH t1 AS ("
            f"  SELECT rid, g, CAST({int_expr(rng)} AS BIGINT) AS k0,"
            f"         {str_expr(rng)} AS k1"
            f"  FROM fz WHERE {bool_expr(rng)}"
            f"), t2 AS ("
            f"  SELECT rid, (g + length(k1)) AS g2, k0 FROM t1"
            f"  WHERE {rng.choice(['k0 >= 0', 'k0 < 0', 'k1 <> chr(7)'])}"
            f") {outer}"
        )
        _run_both(fuzz_env, sql)


def test_grouped_aggregate_differential(fuzz_env):
    rng = random.Random(SEED + 2)
    for _ in range(N_PER_SHAPE):
        fixed_dbl = (
            f"CAST(sum(CAST(round(({dbl_expr(rng)}) * 1000, 0) AS BIGINT))"
            " AS BIGINT)"
        )
        aggs = [
            "count(*) AS a0",
            f"count({rng.choice(['i1', 's1', 'd1'])}) AS a1",
            f"CAST(sum({int_expr(rng)}) AS BIGINT) AS a2",
            f"min({str_expr(rng)}) AS a3",
            f"max({int_expr(rng)}) AS a4",
            f"{fixed_dbl} AS a5",
        ]
        having = (
            f" HAVING count(*) > {rng.randint(0, 3)}"
            if rng.random() < 0.4
            else ""
        )
        sql = (
            f"SELECT g, {', '.join(rng.sample(aggs, rng.randint(2, 5)))} "
            f"FROM fz WHERE {bool_expr(rng)} GROUP BY g{having}"
        )
        _run_both(fuzz_env, sql)


def test_self_join_differential(fuzz_env):
    import re

    # whole-token qualification: odd-numbered columns bind to side a,
    # even-numbered to side b, the group key to a (never inside string
    # literals — no literal in the grammar contains these tokens).
    qual = {
        "i1": "a.i1", "d1": "a.d1", "s1": "a.s1", "b1": "a.b1",
        "g": "a.g", "rid": "a.rid",
        "i2": "b.i2", "d2": "b.d2", "s2": "b.s2",
    }

    def q(expr: str) -> str:
        return re.sub(
            r"\b(i1|i2|d1|d2|s1|s2|b1|g|rid)\b",
            lambda m: qual[m.group(1)],
            expr,
        )

    rng = random.Random(SEED + 3)
    for _ in range(N_PER_SHAPE // 2):
        jtype = rng.choice(["JOIN", "LEFT JOIN"])
        sql = (
            f"SELECT a.rid AS ar, b.rid AS br, "
            f"CAST({q(int_expr(rng))} AS BIGINT) AS c0 "
            f"FROM fz a {jtype} fz b ON a.g = b.g AND a.rid < b.rid "
            f"WHERE {q(bool_expr(rng))}"
        )
        _run_both(fuzz_env, sql)


def test_window_function_differential(fuzz_env):
    # deterministic frames only: partition by the group key, order by
    # the unique rid — cross-engine window semantics agree when the
    # ordering is total, which is the discipline every registry window
    # entry already follows.
    rng = random.Random(SEED + 5)
    for _ in range(N_PER_SHAPE // 2):
        wfns = [
            "row_number() OVER (PARTITION BY g ORDER BY rid) AS w0",
            # nullable sort keys carry an explicit NULLS FIRST (the
            # reference's ASC default, operators/relational.py order):
            # Spark defaults ASC to NULLS FIRST, DuckDB to NULLS LAST —
            # caught by the deep run as a rank() divergence on i2.
            f"rank() OVER (PARTITION BY g ORDER BY {rng.choice(['i2', 'g'])} NULLS FIRST, rid) AS w1",
            f"CAST(sum({int_expr(rng)}) OVER (PARTITION BY g ORDER BY rid) AS BIGINT) AS w2",
            f"lag({rng.choice(['i1', 's1'])}, 1) OVER (PARTITION BY g ORDER BY rid) AS w3",
            f"lead(rid, {rng.randint(1, 2)}) OVER (ORDER BY rid) AS w4",
            f"CAST(count(*) OVER (PARTITION BY g ORDER BY rid "
            f"ROWS BETWEEN {rng.randint(1, 3)} PRECEDING AND CURRENT ROW) AS BIGINT) AS w5",
            f"min({int_expr(rng)}) OVER (PARTITION BY g) AS w6",
        ]
        sql = (
            f"SELECT rid, {', '.join(rng.sample(wfns, rng.randint(2, 4)))} "
            f"FROM fz WHERE {bool_expr(rng)}"
        )
        _run_both(fuzz_env, sql)


def test_subquery_differential(fuzz_env):
    rng = random.Random(SEED + 6)
    for _ in range(N_PER_SHAPE // 2):
        kind = rng.randrange(4)
        if kind == 0:  # correlated EXISTS
            sql = (
                f"SELECT rid, i1 FROM fz o WHERE "
                f"{rng.choice(['', 'NOT '])}EXISTS (SELECT 1 FROM fz i "
                f"WHERE i.g = o.g AND i.rid <> o.rid AND "
                f"{bool_expr(rng).replace('i1', 'i.i1').replace('s1', 'i.s1')})"
            )
        elif kind == 1:  # uncorrelated IN subquery
            sql = (
                f"SELECT rid, g FROM fz WHERE i2 IN "
                f"(SELECT i2 FROM fz WHERE {bool_expr(rng)})"
            )
        elif kind == 2:  # scalar subquery in projection
            sql = (
                f"SELECT rid, CAST((SELECT max(i1) FROM fz WHERE "
                f"{bool_expr(rng)}) AS BIGINT) AS c0 FROM fz "
                f"WHERE g = {rng.randint(0, 4)}"
            )
        else:  # correlated scalar aggregate
            sql = (
                f"SELECT o.rid, CAST((SELECT count(*) FROM fz i "
                f"WHERE i.g = o.g AND i.rid < o.rid) AS BIGINT) AS c0 "
                f"FROM fz o WHERE {bool_expr(rng).replace('i1', 'o.i1')}"
            )
        _run_both(fuzz_env, sql)


def test_setop_differential(fuzz_env):
    rng = random.Random(SEED + 7)
    for _ in range(N_PER_SHAPE // 2):
        op = rng.choice(
            ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
        )
        cols = rng.choice(["g, i2", "g, s1", "i1, i2"])
        sql = (
            f"SELECT {cols} FROM fz WHERE {bool_expr(rng)} "
            f"{op} "
            f"SELECT {cols} FROM fz WHERE {bool_expr(rng)}"
        )
        _run_both(fuzz_env, sql)


def test_orderby_limit_differential(fuzz_env):
    # LIMIT under a TOTAL order (explicit NULLS direction + unique rid
    # tie-break) selects the identical row set on both engines; the
    # normalized-multiset compare then checks the set, not the order.
    rng = random.Random(SEED + 8)
    for _ in range(N_PER_SHAPE // 2):
        direction = rng.choice(
            ["ASC NULLS FIRST", "DESC NULLS LAST"]
        )
        sql = (
            f"SELECT rid, CAST({int_expr(rng)} AS BIGINT) AS c0, "
            f"{str_expr(rng)} AS c2 "
            f"FROM fz WHERE {bool_expr(rng)} "
            f"ORDER BY c0 {direction}, c2 {direction}, rid "
            f"LIMIT {rng.randint(1, 20)}"
        )
        _run_both(fuzz_env, sql)


def test_dialect_executor_differential(fuzz_env, tmp_path):
    """Same grammar, but SELECTs routed through the reference-dialect
    executor (StatementExecutor.execute_query -> rewrite_query ->
    spark.sql) over a table the executor itself created and populated —
    so the fuzz also exercises the dialect translation layer and the
    permissive INSERT path, not just vanilla spark.sql."""
    spark, duck = fuzz_env
    from risinglight_spark.sql.executor import StatementExecutor

    ex = StatementExecutor(spark, scratch=str(tmp_path))
    ex.execute_statement(
        "CREATE TABLE fzd (rid BIGINT, g BIGINT, i1 INT, i2 INT, "
        "d1 DOUBLE, d2 DOUBLE, s1 VARCHAR, s2 VARCHAR, b1 BOOLEAN)"
    )
    src = spark.sql("SELECT * FROM fz").toPandas()

    def lit(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            return repr(v)
        return str(int(v))

    values = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")"
        for row in src.itertuples(index=False)
    )
    ex.execute_statement(f"INSERT INTO fzd VALUES {values}")
    duck.execute("CREATE TABLE fzd AS SELECT * FROM fz")
    try:
        rng = random.Random(SEED + 4)
        for _ in range(max(N_PER_SHAPE // 2, 10)):
            cols = [
                f"CAST({int_expr(rng)} AS BIGINT) AS c0",
                # fixed-point for the same round()-tie reason as the
                # projection shape
                f"CAST(round(({dbl_expr(rng)}) * 100000.0, 0) AS BIGINT)"
                " AS c1",
                f"{str_expr(rng)} AS c2",
            ]
            sql = (
                f"SELECT rid, {', '.join(rng.sample(cols, rng.randint(2, 3)))} "
                f"FROM fzd WHERE {bool_expr(rng)}"
            )
            got = _normalize(ex.execute_query(sql).toPandas())
            want = _normalize(duck.execute(sql).df())
            assert got == want, f"dialect-path mismatch for:\n{sql}"
    finally:
        ex.execute_statement("DROP TABLE fzd")
        duck.execute("DROP TABLE fzd")
        from risinglight_spark.tables import pin_semantics

        pin_semantics(spark)
