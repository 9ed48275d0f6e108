"""Seeded differential SQL fuzzing: random expression/query shapes run
through the engine's pinned-semantics session AND DuckDB over identical
parquet data, results compared as normalized multisets.

The 309 registry oracles verify every OPERATOR; the slt corpus replays
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
VDIM = 4  # shape-19 vector columns (v1, v2) dimension


# ---------------------------------------------------------------------------
# fixture: one typed table with NULLs, identical bytes for both engines
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    import datetime

    rng = random.Random(SEED)
    # SEPARATE stream for the shape-19 vector columns: drawing them
    # from `rng` would shift every later row's draws and silently
    # change the data all earlier shapes were tuned against.
    vrng = random.Random(SEED ^ 0x13)

    def _vec():
        if vrng.random() < 0.15:
            return None  # whole-vector NULL (propagates as NULL dist)
        while True:
            v = [round(vrng.uniform(-3, 3), 3) for _ in range(VDIM)]
            if any(x != 0.0 for x in v):  # zero-norm would hit the
                return v  # div-by-zero policy, pinned elsewhere

    words = ["alpha", "Bravo", "charlie x", "", "dAta", "zebra", "ab", "Abc"]
    epoch_d = datetime.date(1995, 1, 1)
    epoch_t = datetime.datetime(1995, 1, 1)
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
                # the datetime draws come AFTER every pre-existing draw
                # so the seeded values of the original columns — and
                # therefore every previously recorded shape's data —
                # are unchanged.  Whole-second timestamps only: the
                # cross-engine formatting/rounding of fractional
                # seconds is a formatting policy, not a semantics to
                # fuzz.
                rng.choice(
                    [
                        None,
                        epoch_d + datetime.timedelta(days=rng.randint(0, 730)),
                    ]
                ),  # dt1
                rng.choice(
                    [
                        None,
                        epoch_t
                        + datetime.timedelta(
                            hours=rng.randint(0, 730 * 24),
                            seconds=rng.randint(0, 3599),
                        ),
                    ]
                ),  # ts1
                _vec(),  # v1 (separate stream, see above)
                _vec(),  # v2
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "rid", "g", "i1", "i2", "d1", "d2", "s1", "s2", "b1",
            "dt1", "ts1", "v1", "v2",
        ],
    )
    # explicit datetime64 for ts1 (a mixed object column would make
    # createDataFrame re-infer per cell); dt1 stays object(date) ->
    # DateType.
    pdf["ts1"] = pd.to_datetime(pdf["ts1"])
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
    # Spark writes ts1 as TIMESTAMP(isAdjustedToUTC=true), which DuckDB
    # reads as TIMESTAMPTZ: pin the DuckDB session zone so extract()/
    # date_trunc() localize identically to the Spark session's UTC pin,
    # independent of the host TZ.
    duck.execute("SET TimeZone='UTC'")
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


def date_expr(rng: random.Random, depth: int = 0) -> str:
    # date +/- INTERVAL 'n' DAY|MONTH — both engines clamp month-adds
    # to the last valid day (Jan 31 + 1 MONTH = Feb 28), and the
    # quoted-quantity INTERVAL form parses identically.
    base = rng.choice(["dt1", "DATE '1995-06-15'", "DATE '1996-01-31'"])
    if depth >= 2 or rng.random() < 0.5:
        return base
    n = rng.randint(1, 40)
    unit = rng.choice(["DAY", "DAY", "MONTH"])
    op = rng.choice(["+", "-"])
    return f"({date_expr(rng, depth + 1)} {op} INTERVAL '{n}' {unit})"


def ts_expr(rng: random.Random, depth: int = 0) -> str:
    base = rng.choice(["ts1", "TIMESTAMP '1995-06-15 12:30:00'"])
    if depth >= 2 or rng.random() < 0.5:
        return base
    n = rng.randint(1, 96)
    unit = rng.choice(["HOUR", "MINUTE", "DAY"])
    op = rng.choice(["+", "-"])
    return f"({ts_expr(rng, depth + 1)} {op} INTERVAL '{n}' {unit})"


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
    import datetime
    import decimal

    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is pd.NaT:  # NaTType subclasses datetime — catch first
                vals.append("<NULL>")
                continue
            if isinstance(v, pd.Timedelta):
                v = v.to_pytimedelta()
            if isinstance(v, datetime.timedelta):
                # Spark DayTimeIntervalType and DuckDB INTERVAL both
                # come back as timedeltas; whole-second fixtures keep
                # total_seconds exact.
                vals.append(f"i:{v.total_seconds():.1f}")
                continue
            if isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            if hasattr(v, "item"):  # numpy scalar -> python
                v = v.item()
            if isinstance(v, datetime.datetime):
                # DuckDB hands Spark-written TIMESTAMP back tz-aware
                # (it reads isAdjustedToUTC as TIMESTAMPTZ) while Spark
                # returns session-zone-naive; both sessions are pinned
                # UTC, so normalizing to UTC-naive compares values.
                if v.tzinfo is not None:
                    v = v.astimezone(datetime.timezone.utc).replace(
                        tzinfo=None
                    )
                vals.append("t:" + v.isoformat())
                continue
            if isinstance(v, datetime.date):
                # DATE and midnight-TIMESTAMP unify: DuckDB's .df()
                # widens DATE to datetime64 where Spark keeps date.
                vals.append(
                    "t:"
                    + datetime.datetime(v.year, v.month, v.day).isoformat()
                )
                continue
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


def test_datetime_function_differential(fuzz_env):
    """The reference's date surface (extract year/month/day, typed DATE/
    TIMESTAMP literals, date +/- INTERVAL — SURVEY §2.5) composed under
    filters: the handoff-flagged gap in the int/double/string/bool
    grammar.  Whole-second fixtures keep fractional-second formatting
    policy out of scope; both sessions pin UTC."""
    rng = random.Random(SEED + 10)
    for _ in range(N_PER_SHAPE // 2):
        cols = [
            f"CAST(extract(YEAR FROM {date_expr(rng)}) AS BIGINT) AS c0",
            f"CAST(extract(MONTH FROM {date_expr(rng)}) AS BIGINT) AS c1",
            f"CAST(extract(DAY FROM {date_expr(rng)}) AS BIGINT) AS c2",
            f"{date_expr(rng)} AS c3",
            f"date_trunc('{rng.choice(['month', 'day', 'hour'])}', "
            f"{ts_expr(rng)}) AS c4",
            f"CAST(extract(HOUR FROM {ts_expr(rng)}) AS BIGINT) AS c5",
            f"(CASE WHEN {bool_expr(rng)} THEN {date_expr(rng)} "
            f"ELSE {date_expr(rng)} END) AS c6",
        ]
        pred = rng.choice(
            [
                f"dt1 >= (DATE '1995-06-01' + INTERVAL "
                f"'{rng.randint(1, 300)}' DAY)",
                "dt1 IS NOT NULL",
                f"ts1 < (TIMESTAMP '1996-01-01 00:00:00' - INTERVAL "
                f"'{rng.randint(1, 400)}' HOUR)",
                f"extract(MONTH FROM dt1) = {rng.randint(1, 12)}",
                bool_expr(rng),
            ]
        )
        sql = (
            f"SELECT rid, {', '.join(rng.sample(cols, rng.randint(2, 4)))} "
            f"FROM fz WHERE {pred}"
        )
        _run_both(fuzz_env, sql)


def test_derived_table_differential(fuzz_env):
    """FROM-subquery nesting (the other handoff-flagged gap): a grouped
    derived table joined back to the base table, and two-deep inline
    derived tables — name scoping/pruning across subquery aliases,
    which the CTE shape's WITH binding does not exercise."""
    rng = random.Random(SEED + 11)
    for _ in range(N_PER_SHAPE // 2):
        if rng.random() < 0.5:
            # grouped derived table joined to the base relation; the
            # derived key is RENAMED (mg) so the outer filter's bare
            # column references bind to f unambiguously — Spark rejects
            # an ambiguous bare `g` here (AMBIGUOUS_REFERENCE) and the
            # fuzzer samples engine semantics, not resolution policy.
            sql = (
                f"SELECT f.rid, m.cnt, m.mx "
                f"FROM fz f JOIN ("
                f"  SELECT g AS mg, count(*) AS cnt, "
                f"         max({int_expr(rng)}) AS mx"
                f"  FROM fz WHERE {bool_expr(rng)} GROUP BY g"
                f") m ON f.g = m.mg "
                f"WHERE {bool_expr(rng)}"
            )
        else:
            # two-deep inline nesting with column rebinding per level
            sql = (
                f"SELECT g, k2, count(*) AS a0 FROM ("
                f"  SELECT g, (k0 + length(k1)) AS k2 FROM ("
                f"    SELECT rid, g, CAST({int_expr(rng)} AS BIGINT) AS k0,"
                f"           {str_expr(rng)} AS k1"
                f"    FROM fz WHERE {bool_expr(rng)}"
                f"  ) s1 WHERE {rng.choice(['k0 <> 0', 'k0 IS NOT NULL', 'length(k1) > 1'])}"
                f") s2 GROUP BY g, k2"
            )
        _run_both(fuzz_env, sql)


def test_aggregate_equality_differential(fuzz_env):
    """The SF100-q15 class, continuously sampled: equality/comparison
    predicates BETWEEN aggregate results.  Raw double-sum equality is
    FP-ill-conditioned (the q15 lesson), so the shape composes it under
    the repo-wide fixed-point discipline (round -> BIGINT -> sum) —
    any mismatch here is a real engine divergence, not a ulp."""
    rng = random.Random(SEED + 12)
    for _ in range(N_PER_SHAPE // 2):
        fp = (
            f"CAST(sum(CAST(round(({dbl_expr(rng)}) * 1000, 0) AS BIGINT))"
            " AS BIGINT)"
        )
        kind = rng.randrange(3)
        if kind == 0:
            # group whose fixed-point sum equals the global max (q15)
            sql = (
                f"WITH t AS (SELECT g, {fp} AS s FROM fz "
                f"WHERE {bool_expr(rng)} GROUP BY g) "
                f"SELECT g, s FROM t WHERE s = (SELECT max(s) FROM t)"
            )
        elif kind == 1:
            # HAVING comparing two aggregates of the same group
            sql = (
                f"SELECT g, count(*) AS a0, {fp} AS a1 FROM fz "
                f"GROUP BY g HAVING {fp} {rng.choice(['>', '<=', '<>'])} "
                f"CAST(count(*) AS BIGINT) * {rng.randint(-20, 20)}"
            )
        else:
            # aggregate-vs-scalar-subquery-aggregate comparison
            sql = (
                f"SELECT g, {fp} AS a1 FROM fz GROUP BY g "
                f"HAVING {fp} >= (SELECT {fp} / 5 FROM fz "
                f"WHERE {bool_expr(rng)})"
            )
        _run_both(fuzz_env, sql)


def test_grouping_sets_differential(fuzz_env):
    """GROUPING SETS / ROLLUP / CUBE over a derived pair of group keys:
    the multi-grouping Expand path (agg_rollup/agg_cube are the
    operator pins; this samples their composition with fuzzed
    aggregates).  grouping(col) disambiguates set-NULLs from data
    NULLs so the multiset compare stays exact.

    Pinned policy divergence (found by this shape's first run): on an
    EMPTY input, the grand-total set `()` yields one count=0 row in
    DuckDB/Postgres (the standard's global-aggregate behavior) but ZERO
    rows in Spark — Spark only restores the empty-input global-agg row
    for a plain ungrouped aggregate, not through the Expand path.  The
    filter below keeps a 4-row floor so the fuzzer samples the
    semantics both engines define identically."""
    rng = random.Random(SEED + 13)
    for _ in range(N_PER_SHAPE // 2):
        spec = rng.choice(
            [
                "GROUPING SETS ((g), (i2g), (g, i2g), ())",
                "GROUPING SETS ((g, i2g), (g))",
                "ROLLUP (g, i2g)",
                "CUBE (g, i2g)",
            ]
        )
        fp = (
            f"CAST(sum(CAST(round(({dbl_expr(rng)}) * 1000, 0) AS BIGINT))"
            " AS BIGINT)"
        )
        sql = (
            f"SELECT g, i2g, CAST(grouping(g) AS BIGINT) AS gg, "
            f"CAST(grouping(i2g) AS BIGINT) AS gi, "
            f"count(*) AS a0, {fp} AS a1, max({int_expr(rng)}) AS a2 "
            f"FROM (SELECT g, (i2 % NULLIF(3, 0)) AS i2g, i1, i2, d1, d2, "
            f"s1, s2, b1 FROM fz WHERE {bool_expr(rng)} OR rid < 4) t "
            f"GROUP BY {spec}"
        )
        _run_both(fuzz_env, sql)


def test_interval_arith_differential(fuzz_env):
    """Timestamp/interval ARITHMETIC (the last handoff-flagged datetime
    gap): timestamp differences as values, interval-shifted timestamps,
    and interval comparisons in predicates.  Both engines return
    TIMESTAMP - TIMESTAMP as an interval (timedelta after transfer) and
    whole-second fixtures keep total_seconds exact.  DATE - DATE is
    deliberately OUT of the grammar: Spark types it INTERVAL DAY where
    DuckDB types it BIGINT days — a literal-TYPING policy difference of
    the same class as the pinned DECIMAL literal, not a computation to
    fuzz."""
    rng = random.Random(SEED + 14)
    for _ in range(N_PER_SHAPE // 2):
        diff = f"({ts_expr(rng)} - {ts_expr(rng)})"
        cols = [
            f"{diff} AS c0",
            f"(ts1 + {diff}) AS c1",
            f"(CASE WHEN {bool_expr(rng)} THEN {ts_expr(rng)} "
            f"ELSE ts1 END - TIMESTAMP '1995-06-15 00:00:00') AS c2",
            f"{ts_expr(rng)} AS c3",
        ]
        pred = rng.choice(
            [
                f"(ts1 - TIMESTAMP '1995-06-15 00:00:00') > "
                f"INTERVAL '{rng.randint(1, 400)}' HOUR",
                f"({ts_expr(rng)} - ts1) <= INTERVAL "
                f"'{rng.randint(1, 300)}' DAY",
                "ts1 IS NOT NULL",
                bool_expr(rng),
            ]
        )
        sql = (
            f"SELECT rid, {', '.join(rng.sample(cols, rng.randint(2, 4)))} "
            f"FROM fz WHERE {pred}"
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
        "d1 DOUBLE, d2 DOUBLE, s1 VARCHAR, s2 VARCHAR, b1 BOOLEAN, "
        "dt1 DATE, ts1 TIMESTAMP)"
    )
    # the 11 scalar columns only: fzd's DDL above predates the
    # shape-19 vector columns, and lit() renders scalars, not arrays
    _fzd_cols = (
        "rid, g, i1, i2, d1, d2, s1, s2, b1, dt1, ts1"
    )
    src = spark.sql(f"SELECT {_fzd_cols} FROM fz").toPandas()

    def lit(v):
        import datetime

        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (pd.Timestamp, datetime.datetime)):
            return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
        if isinstance(v, datetime.date):
            return f"DATE '{v.isoformat()}'"
        return str(int(v))

    values = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")"
        for row in src.itertuples(index=False)
    )
    ex.execute_statement(f"INSERT INTO fzd VALUES {values}")
    duck.execute(f"CREATE TABLE fzd AS SELECT {_fzd_cols} FROM fz")
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


def test_outer_join_differential(fuzz_env):
    """Shape 15: FULL/RIGHT outer joins — the NULL-extension semantics
    the self-join shape (INNER/LEFT only) never exercises.  Projections
    COALESCE both sides so the null-extended rows are distinguishable
    from genuinely-NULL columns; the optional WHERE applies post-join
    (both engines filter the padded rows identically)."""
    import re

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

    rng = random.Random(SEED + 15)
    for _ in range(N_PER_SHAPE // 2):
        jtype = rng.choice(["FULL JOIN", "RIGHT JOIN", "FULL JOIN"])
        on = rng.choice(
            [
                "a.g = b.g AND a.rid < b.rid",
                "a.g = b.g AND a.rid + 7 = b.rid",
                "a.rid = b.rid AND a.g < b.g",
            ]
        )
        where = (
            f" WHERE {q(bool_expr(rng))} OR a.rid IS NULL OR b.rid IS NULL"
            if rng.random() < 0.5
            else ""
        )
        sql = (
            f"SELECT COALESCE(a.rid, -1) AS ar, COALESCE(b.rid, -1) AS br, "
            f"CAST({q(int_expr(rng))} AS BIGINT) AS c0, "
            f"COALESCE({q(str_expr(rng))}, '<null>') AS c1 "
            f"FROM fz a {jtype} fz b ON {on}{where}"
        )
        _run_both(fuzz_env, sql)


def test_distinct_aggregate_differential(fuzz_env):
    """Shape 16: DISTINCT aggregates — multiple COUNT(DISTINCT) over
    different columns force Spark's Expand-based rewrite (a plan family
    no other shape reaches); sum/avg(DISTINCT) stay exact because the
    distinct value sets are small integers (< 2^53 in double)."""
    rng = random.Random(SEED + 16)
    for _ in range(N_PER_SHAPE // 2):
        aggs = [
            "CAST(count(DISTINCT i1) AS BIGINT) AS a0",
            "CAST(count(DISTINCT s1) AS BIGINT) AS a1",
            f"CAST(count(DISTINCT {int_expr(rng)}) AS BIGINT) AS a2",
            "CAST(sum(DISTINCT i1) AS BIGINT) AS a3",
            "CAST(sum(DISTINCT i2) AS BIGINT) AS a4",
            "CAST(avg(DISTINCT i2) AS DOUBLE) AS a5",
            "CAST(count(DISTINCT b1) AS BIGINT) AS a6",
        ]
        chosen = rng.sample(aggs, rng.randint(2, 4))
        grouped = rng.random() < 0.6
        having = (
            f" HAVING count(DISTINCT i1) > {rng.randint(0, 2)}"
            if grouped and rng.random() < 0.4
            else ""
        )
        if grouped:
            sql = (
                f"SELECT g, {', '.join(chosen)} FROM fz "
                f"WHERE {bool_expr(rng)} GROUP BY g{having}"
            )
        else:
            sql = (
                f"SELECT {', '.join(chosen)} FROM fz "
                f"WHERE {bool_expr(rng)}"
            )
        _run_both(fuzz_env, sql)


# substring with the REFERENCE's negative-start/backwards-window rule —
# the fuzzer composes the SHIM ITSELF (the exact SQL the oracles
# render), imported so a future formula fix cannot leave the fuzzer
# exercising a stale copy (round-12 review finding).
from risinglight_spark.functions.scalar import substring_rl_sql as _rl_substr


def rich_str_expr(rng: random.Random, depth: int = 0) -> str:
    """String grammar for shape 17: everything str_expr has PLUS the
    families only unit-tested until now — the substring_rl formula with
    RANDOM (negative) start/length subexpressions, repeat with a
    computed clamped count, lpad/rpad, and nested replace."""
    if depth >= 2 or rng.random() < 0.35:
        return rng.choice(["s1", "s2", "'ab'", "'Xy z'", "''", "'aAa'"])
    pick = rng.randrange(9)
    a = rich_str_expr(rng, depth + 1)
    if pick == 0:
        return f"({a} || {rich_str_expr(rng, depth + 1)})"
    if pick == 1:
        return f"upper({a})"
    if pick == 2:
        return f"lower({a})"
    if pick == 3:
        # the shim formula with fuzzed window: start in [-6, 6],
        # length in [-4, 6] — negative start counts from the end,
        # negative length selects backwards, exactly ops.rs:304-335
        start = rng.choice(
            [str(rng.randint(-6, 6)), f"({int_expr(rng, 2)} % 7)"]
        )
        length = str(rng.randint(-4, 6))
        return _rl_substr(a, start, length)
    if pick == 4:
        frm = rng.choice(["a", "b", "ab", "A", " "])
        to = rng.choice(["_", "", "zz"])
        return f"replace({a}, '{frm}', '{to}')"
    if pick == 5:
        # computed repeat count clamped to [0, 3]: both engines return
        # '' for 0; NULL propagates identically
        return f"repeat({a}, abs({int_expr(rng, 2)}) % 4)"
    if pick == 6:
        return f"trim({a})"
    if pick == 7:
        n = rng.randint(0, 10)
        pad = rng.choice(["x", "xy"])
        fn = rng.choice(["lpad", "rpad"])
        return f"{fn}({a}, {n}, '{pad}')"
    return f"substring({a}, {rng.randint(1, 5)}, {rng.randint(0, 5)})"


def test_string_function_differential(fuzz_env):
    """Shape 17 (VERDICT r11 item 6): string-function COMPOSITIONS —
    the one scalar family with a hand-written parity shim
    (substring_rl, functions/scalar.py: the reference's negative-start
    / backwards-window rule) was covered by unit tests and one registry
    entry but never composition-sampled.  Samples nested ||, upper/
    lower, replace, repeat(computed n), lpad/rpad, trim, and the
    substring_rl formula with fuzzed negative windows; projects them,
    filters on LIKE/equality over them, groups by a string expression,
    and aggregates min/max/count over them."""
    rng = random.Random(SEED + 17)
    for _ in range(N_PER_SHAPE):
        e1, e2 = rich_str_expr(rng), rich_str_expr(rng)
        mode = rng.randrange(3)
        if mode == 0:
            pat = rng.choice(["%a%", "a%", "%z", "%b_a%", "A%", "%_%"])
            sql = (
                f"SELECT rid, {e1} AS x, length({e2}) AS n FROM fz "
                f"WHERE {e2} LIKE '{pat}' OR ({e1}) = ({e2})"
            )
        elif mode == 1:
            sql = (
                f"SELECT {e1} AS k, CAST(count(*) AS BIGINT) AS n, "
                f"min({e2}) AS lo, max({e2}) AS hi "
                f"FROM fz WHERE {bool_expr(rng)} GROUP BY 1"
            )
        else:
            sql = (
                f"SELECT rid, (CASE WHEN {bool_expr(rng)} THEN {e1} "
                f"ELSE {e2} END) AS x, ({e1} || {e2}) AS y FROM fz"
            )
        _run_both(fuzz_env, sql)


# DECIMAL grammar: literals typed DECIMAL on both engines; +,-,* are
# EXACT in decimal arithmetic, so values agree bit-for-bit regardless
# of each engine's (p, s) result-typing policy (Spark: Hive rules;
# DuckDB: its own widening) — the normalizer compares VALUES.  Depth
# and literal ranges keep every product far from either engine's
# overflow/NULL edge (SURVEY §1.2 pins overflow handling out of
# scope the same way int overflow is).  Division is excluded: the
# result SCALE (hence rounding) is policy-typed per engine.
def dec_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.4:
        # literal fraction digits EXACTLY match the declared scale: a
        # scale-REDUCING decimal cast is a pinned policy divergence
        # (first run of this shape found it: Spark rounds HALF_UP,
        # DuckDB 1.0 truncates toward zero — CAST(42.458 AS
        # DECIMAL(9,2)) = 42.46 vs 42.45), so the grammar never
        # downscales; round(, k) IS sampled instead (both engines
        # round decimal ties away from zero).
        scale = rng.choice([1, 2, 3])
        whole = rng.randint(-99, 99)
        frac = rng.randint(0, 10**scale - 1)
        return f"CAST({whole}.{frac:0{scale}d} AS DECIMAL(9, {scale}))"
    pick = rng.randrange(5)
    a, b = dec_expr(rng, depth + 1), dec_expr(rng, depth + 1)
    if pick == 0:
        return f"({a} + {b})"
    if pick == 1:
        return f"({a} - {b})"
    if pick == 2:
        # nested products are bounded to ONE level: a product of
        # products pushes Spark's result precision past 38 (p1+p2+1),
        # where Spark ROUNDS to fit (HALF_UP at the cap) while DuckDB
        # keeps the exact value — a typing-policy divergence like the
        # downscale cast, confirmed live ((1.11*1.13)*(1.17*1.19):
        # 1.7463619 vs 1.74636189).  Leaf-only factors keep every
        # product exact on both engines.
        fa = dec_expr(rng, 2)  # depth 2 => literal leaf
        fb = dec_expr(rng, 2)
        return f"({fa} * {fb})"
    if pick == 3:
        return f"(- {a})"
    return f"(CASE WHEN {bool_expr(rng, depth + 1)} THEN {a} ELSE {b} END)"


def test_decimal_arithmetic_differential(fuzz_env):
    """Shape 18 (VERDICT r11 item 6): DECIMAL(p, s) arithmetic
    compositions — exact +/-/* chains over mixed scales, round() to a
    fuzzed scale, CAST rescaling, comparisons between decimal
    expressions, and exact grouped sum(decimal).  Result-type (p, s)
    policies differ per engine; VALUES of exact operations cannot."""
    rng = random.Random(SEED + 18)
    for _ in range(N_PER_SHAPE):
        e1, e2 = dec_expr(rng), dec_expr(rng)
        mode = rng.randrange(4)
        if mode == 0:
            sql = (
                f"SELECT rid, CAST({e1} AS DOUBLE) AS x, "
                f"round({e2}, {rng.randint(0, 3)}) AS r FROM fz "
                f"WHERE {bool_expr(rng)}"
            )
        elif mode == 1:
            # UPscaling CAST only (exact on both engines); DOWNscaling
            # is the pinned truncate-vs-round policy divergence noted
            # in dec_expr
            s = rng.randint(14, 16)
            sql = (
                f"SELECT rid, CAST({e1} AS DECIMAL(38, {s})) AS x "
                f"FROM fz WHERE {bool_expr(rng)}"
            )
        elif mode == 2:
            op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
            sql = (
                f"SELECT rid FROM fz "
                f"WHERE ({e1}) {op} ({e2}) AND {bool_expr(rng)}"
            )
        else:
            # exact grouped sum: sum of DECIMAL is exact on both
            # engines; multiply by i2 (small int) stays exact
            sql = (
                f"SELECT g, sum({e1} * COALESCE(i2, 0)) AS s "
                f"FROM fz GROUP BY g"
            )
        _run_both(fuzz_env, sql)


# ---------------------------------------------------------------------------
# shape 19: vector expressions through the DIALECT path (VERDICT r12
# item 6).  The pgvector operators <-> / <#> / <=> and
# '[..]'::VECTOR(n) literals are the one hand-rolled rewrite family
# (sql/dialect.py rewrite_vector -> zip_with/aggregate higher-order
# expressions); tests/sql/vector.slt covers them only in isolation.
# This shape samples COMPOSITIONS: distances projected beside each
# other, compared against thresholds, nested in CASE, driving a pinned
# ORDER BY ... LIMIT top-k, and aggregated under the fpsum discipline.
#
# Engine side: SQL in the reference's own dialect (infix operators,
# vector casts), run through sql.dialect.rewrite_query — exactly the
# path shell/slt queries take.  DuckDB side: the tandem-rendered
# left-fold expansion (0.0 + t1 + t2 + ...), element-indexed, the same
# chain every registry vector oracle uses — Spark's aggregate() fold is
# left-associated per element, so values are bit-exact, not approximate.
# Literal elements are CAST AS DOUBLE on the DuckDB side: a bare
# decimal literal would type DECIMAL and a lit*lit product would be
# EXACT where Spark's double*double rounds (the shape-18 lesson).
# ---------------------------------------------------------------------------


def _vec_operand(rng: random.Random) -> tuple[str, list[str]]:
    """-> (engine dialect src, per-element DuckDB srcs)."""
    pick = rng.randrange(4)
    if pick < 2:
        col = "v1" if pick == 0 else "v2"
        return col, [f"{col}[{i + 1}]" for i in range(VDIM)]
    while True:
        vals = [round(rng.uniform(-3, 3), 3) for _ in range(VDIM)]
        if any(v != 0.0 for v in vals):
            break
    txt = "[" + ",".join(repr(v) for v in vals) + "]"
    return (
        f"'{txt}'::VECTOR({VDIM})",
        [f"CAST({v!r} AS DOUBLE)" for v in vals],
    )


def _duck_dot(a: list[str], b: list[str]) -> str:
    return "(0.0 + " + " + ".join(f"{x}*{y}" for x, y in zip(a, b)) + ")"


def _duck_l2(a: list[str], b: list[str]) -> str:
    terms = " + ".join(f"({x} - {y})*({x} - {y})" for x, y in zip(a, b))
    return f"sqrt(0.0 + {terms})"


def _vec_dist(rng: random.Random) -> tuple[str, str]:
    """One fuzzed distance expression -> (engine dialect, duck SQL)."""
    op = rng.choice(["<->", "<#>", "<=>"])
    ea, da = _vec_operand(rng)
    eb, db = _vec_operand(rng)
    eng = f"{ea} {op} {eb}"
    if op == "<->":
        duck = _duck_l2(da, db)
    elif op == "<#>":
        duck = f"(- {_duck_dot(da, db)})"
    else:  # <=> : 1 - dot/(|a|*|b|), association mirrors rewrite_vector
        duck = (
            f"(1.0 - {_duck_dot(da, db)} / (sqrt({_duck_dot(da, da)}) "
            f"* sqrt({_duck_dot(db, db)})))"
        )
    return eng, duck


def _run_both_vec(fuzz_env, eng_sql: str, duck_sql: str) -> None:
    from risinglight_spark.sql.dialect import rewrite_query

    spark, duck = fuzz_env
    got = _normalize(spark.sql(rewrite_query(eng_sql)).toPandas())
    want = _normalize(duck.execute(duck_sql).df())
    assert got == want, (
        f"engine mismatch for:\n{eng_sql}\nduck: {duck_sql}\n"
        f"spark={got[:5]}\nduck={want[:5]}"
    )


def test_vector_expression_differential(fuzz_env):
    """Shape 19: vector-operator compositions through the dialect."""
    rng = random.Random(SEED + 19)
    for _ in range(N_PER_SHAPE):
        (e1, d1), (e2, d2) = _vec_dist(rng), _vec_dist(rng)
        mode = rng.randrange(5)
        if mode == 0:
            cond = bool_expr(rng)
            tpl = (
                "SELECT rid, ({e1}) AS x, ({e2}) AS y FROM fz "
                f"WHERE {cond}"
            )
        elif mode == 1:
            tau = f"CAST({round(rng.uniform(0.1, 6.0), 2)!r} AS DOUBLE)"
            op = rng.choice(["<", "<=", ">", ">="])
            # NULL distances (NULL vectors) fail the comparison on
            # both engines; no IS NOT NULL needed
            tpl = f"SELECT rid, ({{e1}}) AS x FROM fz WHERE ({{e2}}) {op} {tau}"
        elif mode == 2:
            k = rng.randint(3, 12)
            # pinned total order: bit-exact doubles + unique rid, and
            # an explicit NULLS FIRST (Spark's ASC default; DuckDB
            # defaults NULLS LAST — the shape-5 lesson)
            tpl = (
                "SELECT rid, ({e1}) AS d FROM fz "
                f"ORDER BY d ASC NULLS FIRST, rid LIMIT {k}"
            )
        elif mode == 3:
            # fpsum: scale-0 round of x*1000 (ties are exact binary
            # halves on both engines), BIGINT sum is partition-proof
            tpl = (
                "SELECT g, CAST(sum(CAST(round(({e1}) * 1000, 0) AS "
                "BIGINT)) AS BIGINT) AS s, CAST(count(({e2})) AS "
                "BIGINT) AS n FROM fz GROUP BY g"
            )
        else:
            tau = f"CAST({round(rng.uniform(0.2, 2.0), 2)!r} AS DOUBLE)"
            tpl = (
                "SELECT rid, (CASE WHEN ({e2}) < " + tau + " THEN ({e1}) "
                "ELSE (- ({e1})) END) AS x FROM fz"
            )
        _run_both_vec(
            fuzz_env,
            tpl.format(e1=e1, e2=e2),
            tpl.format(e1=d1, e2=d2),
        )


# ---------------------------------------------------------------------------
# shape 20: higher-order ARRAY expressions (round 13).  The engine's
# vector operators are built on Spark's higher-order array primitives
# (transform / filter / aggregate / sort_array / element_at / size);
# shape 19 samples only the three pgvector distance compositions, so
# the primitives themselves had no composition coverage.  Tandem
# rendering again: Spark higher-order calls on the engine side, the
# DuckDB list_* equivalents (or element-indexed left-fold chains where
# the fold init semantics differ: DuckDB's list_reduce seeds from the
# first element, Spark's aggregate takes an explicit 0D — the chain
# sidesteps the mismatch bit-exactly).  Scalar-valued expressions only
# (fold-of-transform, size-of-filter, sorted element_at, fold min/max,
# contains): array-valued results would compare element ORDER, which
# only sort_array pins — and each scalar is double/int/bool typed so
# the existing mode templates (project, threshold filter, fpsum
# group, CASE) compose unchanged.
# ---------------------------------------------------------------------------

_ARR_LAMBDAS = (
    # (spark lambda body, duck per-element template) over element {x}
    ("x * x", "({x} * {x})"),
    ("x * 2.0D", "({x} * CAST(2.0 AS DOUBLE))"),
    ("x + 1.0D", "({x} + CAST(1.0 AS DOUBLE))"),
    ("- x", "(- {x})"),
    ("abs(x)", "abs({x})"),
)


def arr_scalar_expr(rng: random.Random) -> tuple[str, str, str]:
    """-> (engine SQL, duck SQL, result kind in {'d', 'i', 'b'})."""
    v = rng.choice(["v1", "v2"])
    els = [f"{v}[{i + 1}]" for i in range(VDIM)]
    pick = rng.randrange(6)
    if pick == 0:
        # fold of transform: explicit 0D seed on the Spark side, the
        # element-indexed left chain on the DuckDB side
        body, tpl = rng.choice(_ARR_LAMBDAS)
        eng = (
            f"aggregate(transform({v}, x -> {body}), 0D, "
            f"(acc, x) -> acc + x)"
        )
        duck = "(0.0 + " + " + ".join(tpl.format(x=e) for e in els) + ")"
        return eng, duck, "d"
    if pick == 1:
        # non-ANSI Spark size(NULL) = -1 (legacy sizeOfNull); a
        # non-null array's size is never -1, so nullif restores the
        # NULL-in-NULL-out DuckDB len() semantics exactly
        return f"nullif(size({v}), -1)", f"len({v})", "i"
    if pick == 2:
        c = f"CAST({round(rng.uniform(-2, 2), 2)!r} AS DOUBLE)"
        op = rng.choice(["<", "<=", ">", ">="])
        return (
            f"nullif(size(filter({v}, x -> x {op} {c})), -1)",
            f"len(list_filter({v}, x -> x {op} {c}))",
            "i",
        )
    if pick == 3:
        k = rng.randint(1, VDIM)
        return (
            f"element_at(sort_array({v}), {k})",
            f"list_sort({v})[{k}]",
            "d",
        )
    if pick == 4:
        agg = rng.choice(["max", "min"])
        return (
            f"array_{agg}({v})",
            f"list_aggregate({v}, '{agg}')",
            "d",
        )
    # membership: exact double equality — a drawn probe value almost
    # never matches (FALSE on both engines), an element re-probe always
    # does (TRUE); both branches sampled
    if rng.random() < 0.5:
        c = f"CAST({round(rng.uniform(-3, 3), 3)!r} AS DOUBLE)"
        return (
            f"array_contains({v}, {c})",
            f"list_contains({v}, {c})",
            "b",
        )
    k = rng.randint(1, VDIM)
    return (
        f"array_contains({v}, element_at({v}, {k}))",
        f"list_contains({v}, {v}[{k}])",
        "b",
    )


def test_array_function_differential(fuzz_env):
    """Shape 20: higher-order array-expression compositions."""
    rng = random.Random(SEED + 20)
    for _ in range(N_PER_SHAPE):
        e1, d1, k1 = arr_scalar_expr(rng)
        e2, d2, k2 = arr_scalar_expr(rng)
        mode = rng.randrange(4)
        if mode == 0:
            cond = bool_expr(rng)
            tpl = f"SELECT rid, ({{e1}}) AS x, ({{e2}}) AS y FROM fz WHERE {cond}"
        elif mode == 1:
            if k2 == "d":
                tau = f"CAST({round(rng.uniform(-2, 6), 2)!r} AS DOUBLE)"
            elif k2 == "i":
                tau = str(rng.randint(0, VDIM))
            else:
                tau = rng.choice(["TRUE", "FALSE"])
            op = rng.choice(["<", "<=", ">", ">=", "=", "<>"]) if k2 != "b" else "="
            tpl = f"SELECT rid, ({{e1}}) AS x FROM fz WHERE ({{e2}}) {op} {tau}"
        elif mode == 2:
            # fpsum of a double-kind expr, plain sum of int kind,
            # count-filter of bool kind — per kind of e1
            if k1 == "d":
                agg = (
                    "CAST(sum(CAST(round(({e1}) * 1000, 0) AS BIGINT)) "
                    "AS BIGINT) AS s"
                )
            elif k1 == "i":
                agg = "CAST(sum({e1}) AS BIGINT) AS s"
            else:
                agg = "CAST(count(CASE WHEN ({e1}) THEN 1 END) AS BIGINT) AS s"
            tpl = f"SELECT g, {agg}, CAST(count(*) AS BIGINT) AS n FROM fz GROUP BY g"
        else:
            cond = (
                "({e2}) IS NOT NULL"
                if k2 != "b"
                else "COALESCE(({e2}), FALSE)"
            )
            tpl = (
                "SELECT rid, (CASE WHEN " + cond + " THEN ({e1}) "
                "ELSE NULL END) AS x FROM fz"
            )
        _run_both_vec(
            fuzz_env,
            tpl.format(e1=e1, e2=e2),
            tpl.format(e1=d1, e2=d2),
        )


# ---------------------------------------------------------------------------
# shape 21: WINDOW functions through the DIALECT executor (round 14,
# VERDICT r13 item 5).  The window.py shims (frames, ntile, value
# functions, the EXCLUDE CURRENT ROW algebraic rewrite, the bare
# OVER () scan-order rewrite) compose with the dialect path but were
# fuzzed only via the Spark-native path (shape 5).  Engine side runs
# through sql.dialect.rewrite_query — the shell/slt path — exercising
# rewrite_over_scan_order compositionally; DuckDB side is either the
# identical SQL (frames/ranking/value fns are ANSI on both engines) or
# the tandem-rendered native form (SQL:2011 EXCLUDE CURRENT ROW vs the
# engine's frame-minus-self rewrite; running-over-rid vs the bare
# OVER () rewrite).  Every ordering is total (unique rid tiebreak) and
# NULL placement is explicit — the shape-5 lesson (Spark defaults
# NULLS FIRST asc, DuckDB NULLS LAST).
# ---------------------------------------------------------------------------

_FRAMES = (
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING",
    "ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING",  # detached: empty at tail
    "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING",  # detached: empty at head
)


def win_item(rng: random.Random, alias: str) -> tuple[str, str]:
    """-> (engine select-item, duck select-item), alias applied."""
    pick = rng.randrange(7)
    if pick == 0:
        # aggregate with an explicit ROWS frame — identical SQL
        agg = rng.choice(["sum", "min", "max", "count"])
        ie = int_expr(rng)
        frame = rng.choice(_FRAMES)
        s = (
            f"CAST({agg}({ie}) OVER (PARTITION BY g ORDER BY rid "
            f"{frame}) AS BIGINT) AS {alias}"
        )
        return s, s
    if pick == 1:
        # cumulative RANGE over a tie-ful key: peers enter together
        ie = int_expr(rng)
        key = rng.choice(["i2", "g"])
        dirn = rng.choice(["ASC NULLS FIRST", "DESC NULLS LAST"])
        s = (
            f"CAST(sum({ie}) OVER (PARTITION BY g ORDER BY {key} {dirn} "
            f"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"AS BIGINT) AS {alias}"
        )
        return s, s
    if pick == 2:
        # numeric-offset RANGE over the unique rid
        a, b = rng.randint(0, 5), rng.randint(0, 5)
        s = (
            f"CAST(count(*) OVER (ORDER BY rid RANGE BETWEEN "
            f"{a} PRECEDING AND {b} FOLLOWING) AS BIGINT) AS {alias}"
        )
        return s, s
    if pick == 3:
        # ranking / ntile; ntile+row_number need the unique tiebreak
        fn = rng.choice(
            ["row_number()", "rank()", "dense_rank()",
             f"ntile({rng.randint(1, 5)})",
             "percent_rank()", "cume_dist()"]
        )
        key = rng.choice(["i2", "i1", "g"])
        dirn = rng.choice(["ASC NULLS FIRST", "DESC NULLS LAST"])
        tie = (
            ", rid"
            if fn.startswith(("row_number", "ntile"))
            else rng.choice(["", ", rid"])
        )
        s = (
            f"{fn} OVER (PARTITION BY g ORDER BY {key} {dirn}{tie}) "
            f"AS {alias}"
        )
        return s, s
    if pick == 4:
        # value functions over a total order
        col = rng.choice(["i1", "s1", "i2"])
        if rng.random() < 0.5:
            n = rng.randint(1, 3)
            dflt = "'zz'" if col == "s1" else str(rng.randint(-9, 9))
            fn = rng.choice(["lead", "lag"])
            use_dflt = rng.random() < 0.5
            args = f"{col}, {n}" + (f", {dflt}" if use_dflt else "")
            s = (
                f"{fn}({args}) OVER (PARTITION BY g ORDER BY rid) "
                f"AS {alias}"
            )
            return s, s
        fn = rng.choice(
            [f"first_value({col})", f"last_value({col})",
             f"nth_value({col}, {rng.randint(1, 4)})"]
        )
        frame = rng.choice(_FRAMES[:5])  # attached frames only
        s = (
            f"{fn} OVER (PARTITION BY g ORDER BY rid {frame}) "
            f"AS {alias}"
        )
        return s, s
    if pick == 5:
        # EXCLUDE CURRENT ROW tandem: DuckDB native SQL:2011 clause vs
        # the engine's algebraic frame-minus-self rewrite (the
        # window.py:331 pattern, incl. NULL-on-empty-excluded-frame)
        ie = int_expr(rng)
        if rng.random() < 0.5:
            eng = (
                f"(CASE WHEN (count({ie}) OVER (PARTITION BY g)) "
                f"- (CASE WHEN ({ie}) IS NOT NULL THEN 1 ELSE 0 END) = 0 "
                f"THEN NULL ELSE CAST((sum({ie}) OVER (PARTITION BY g)) "
                f"- coalesce({ie}, 0) AS BIGINT) END) AS {alias}"
            )
            duck = (
                f"CAST(sum({ie}) OVER (PARTITION BY g ROWS BETWEEN "
                f"UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING "
                f"EXCLUDE CURRENT ROW) AS BIGINT) AS {alias}"
            )
        else:
            eng = (
                f"CAST((count({ie}) OVER (PARTITION BY g)) "
                f"- (CASE WHEN ({ie}) IS NOT NULL THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS {alias}"
            )
            duck = (
                f"CAST(count({ie}) OVER (PARTITION BY g ROWS BETWEEN "
                f"UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING "
                f"EXCLUDE CURRENT ROW) AS BIGINT) AS {alias}"
            )
        return eng, duck
    # bare OVER () — the reference's running-in-scan-order semantics:
    # the dialect rewrite pins it to __rl_rid (scan position); DuckDB
    # renders the running frame over rid explicitly.  fz is a single
    # parquet file, so scan order IS rid order (the slt
    # window_function.slt mechanism).
    if rng.random() < 0.5:
        ie = rng.choice(["i1", "i2", "g", "rid"])
        eng = f"CAST(sum({ie}) OVER () AS BIGINT) AS {alias}"
        duck = (
            f"CAST(sum({ie}) OVER (ORDER BY rid ROWS BETWEEN "
            f"UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS {alias}"
        )
        return eng, duck
    eng = f"row_number() OVER () AS {alias}"
    duck = f"row_number() OVER (ORDER BY rid) AS {alias}"
    return eng, duck


def test_window_dialect_differential(fuzz_env):
    """Shape 21: window compositions through the dialect executor."""
    rng = random.Random(SEED + 21)
    for _ in range(N_PER_SHAPE):
        n_items = rng.randint(1, 3)
        pairs = [win_item(rng, f"w{i}") for i in range(n_items)]
        eng = (
            "SELECT rid, "
            + ", ".join(p[0] for p in pairs)
            + " FROM fz"
        )
        duck = (
            "SELECT rid, "
            + ", ".join(p[1] for p in pairs)
            + " FROM fz"
        )
        _run_both_vec(fuzz_env, eng, duck)


# ---------------------------------------------------------------------------
# shape 22: GROUPING SETS / ROLLUP / CUBE compositions (round 14).
# agg_grouping_sets / agg_rollup / agg_cube / agg_grouping_id verify
# one handwritten query each; this samples the composition space —
# random grouping-set lattices over nullable keys (the classic
# NULL-group-key vs rollup-NULL ambiguity, disambiguated by emitting
# grouping(<col>) markers), mixed aggregate lists, HAVING over
# aggregates.  Integer aggregates only (exact on both engines);
# identical ANSI SQL runs on both sides via the dialect path.
# ---------------------------------------------------------------------------


def _gs_aggs(rng: random.Random) -> list[str]:
    pool = [
        lambda: f"CAST(sum({int_expr(rng)}) AS BIGINT)",
        lambda: "CAST(count(*) AS BIGINT)",
        lambda: f"CAST(min({int_expr(rng)}) AS BIGINT)",
        lambda: f"CAST(max({int_expr(rng)}) AS BIGINT)",
        lambda: "CAST(count(DISTINCT i2) AS BIGINT)",
    ]
    n = rng.randint(1, 3)
    return [rng.sample(pool, 1)[0]() for _ in range(n)]


def test_grouping_sets_differential(fuzz_env):
    """Shape 22: grouping-set lattice compositions."""
    rng = random.Random(SEED + 22)
    for _ in range(N_PER_SHAPE):
        cols = rng.sample(["g", "i2", "s1"], rng.randint(1, 2))
        mode = rng.randrange(3)
        if mode == 0:
            # random subset lattice, always including the full set so
            # every selected column is grouped somewhere
            subsets = [tuple(cols)]
            for _ in range(rng.randint(1, 2)):
                k = rng.randint(0, len(cols))
                subsets.append(tuple(rng.sample(cols, k)))
            uniq = sorted(set(subsets), key=lambda s: (-len(s), s))
            spec = "GROUPING SETS (" + ", ".join(
                "(" + ", ".join(s) + ")" for s in uniq
            ) + ")"
        elif mode == 1:
            spec = f"ROLLUP({', '.join(cols)})"
        else:
            spec = f"CUBE({', '.join(cols)})"
        aggs = _gs_aggs(rng)
        items = (
            cols
            + [f"CAST(grouping({c}) AS INT) AS gr_{c}" for c in cols]
            + [f"({a}) AS a{i}" for i, a in enumerate(aggs)]
        )
        having = ""
        if rng.random() < 0.3:
            having = f" HAVING CAST(count(*) AS BIGINT) > {rng.randint(0, 8)}"
        sql = (
            "SELECT "
            + ", ".join(items)
            + f" FROM fz GROUP BY {spec}{having}"
        )
        _run_both(fuzz_env, sql)


# ---------------------------------------------------------------------------
# shape 23: correlated subqueries + LATERAL through the DIALECT path
# (round 15, VERDICT r14 item 6).  The subquery_* registry entries and
# shape 7 cover the Spark-NATIVE subquery path; the dialect/shell route
# (sql.dialect.rewrite_query -> spark.sql -> Catalyst decorrelation,
# the analog of reference rules/plan.rs:205-280's apply-pushdown) was
# exercised by only 6 static entries.  This shape samples correlated
# compositions: scalar aggregates in SELECT and WHERE, EXISTS / NOT
# EXISTS with non-equi correlation, IN / NOT IN (3VL over nullable
# inner draws), and LATERAL derived tables (aggregate body — exactly
# one row per outer row on both engines).
#
# Grammar guards, same discipline as every shape: integer aggregates
# only (no FP association drift); sum/min/max — never count(*) — in
# correlated SCALAR position (empty correlation group yields NULL on
# both engines; count's 0-vs-NULL is the classic decorrelation trap
# and Spark's rewrite handles it, but the 0 row would then hinge on
# engine-specific outer-join fill semantics the handwritten oracles
# already pin); unqualified inner references resolve inner-first on
# both engines (ANSI scoping).
# ---------------------------------------------------------------------------


def _corr_agg(rng: random.Random) -> str:
    fn = rng.choice(["sum", "min", "max"])
    return f"CAST({fn}({int_expr(rng)}) AS BIGINT)"


def _corr_pred(rng: random.Random) -> str:
    """Correlated inner predicate: the b.g = a.g anchor (Spark requires
    an equality for scalar-subquery decorrelation) plus optionally a
    non-equi outer/inner comparison and an inner-only residual.

    The outer operand of the non-equi comparison is NON-NULL (a.g /
    a.rid) — the second pinned ORACLE divergence this shape found
    (2k-soak, first at iteration ~45): with a NULLABLE outer operand,
    DuckDB 1.0.0's correlated-EXISTS decorrelation treats the
    NULL-valued comparison as a MATCH (repro:
      o(g,x): (1,NULL); t(g,i): (1,5);
      SELECT * FROM o a WHERE EXISTS (SELECT 1 FROM t b
        WHERE b.g = a.g AND b.i <> a.x)
    returns the (1,NULL) row; ANSI: b.i <> NULL is NULL for every b,
    EXISTS is FALSE — Spark agrees with ANSI).  Inner-side NULLs
    (b.i1) take the same comparison path correctly on both engines
    and stay in the grammar."""
    parts = ["b.g = a.g"]
    if rng.random() < 0.5:
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        outer = rng.choice(["a.g", "(a.rid % 7)"])
        parts.append(f"b.i1 {op} {outer}")
    if rng.random() < 0.4:
        parts.append(f"({bool_expr(rng, 1)})")
    return " AND ".join(parts)


def test_correlated_subquery_dialect_differential(fuzz_env):
    """Shape 23: correlated subquery + LATERAL compositions through
    the dialect executor."""
    rng = random.Random(SEED + 23)
    for _ in range(N_PER_SHAPE):
        mode = rng.randrange(6)
        if mode == 0:
            # correlated scalar aggregate in SELECT
            sql = (
                f"SELECT a.rid, CAST(a.i1 AS BIGINT) AS c0, "
                f"(SELECT {_corr_agg(rng)} FROM fz b "
                f"WHERE {_corr_pred(rng)}) AS c1 "
                f"FROM fz a WHERE {bool_expr(rng)}"
            )
        elif mode == 1:
            # correlated scalar aggregate in WHERE comparison (NULL
            # scalar fails the comparison on both engines)
            op = rng.choice(["<", "<=", ">", ">="])
            sql = (
                f"SELECT a.rid, CAST(a.i2 AS BIGINT) AS c0 FROM fz a "
                f"WHERE a.i1 {op} (SELECT {_corr_agg(rng)} FROM fz b "
                f"WHERE {_corr_pred(rng)})"
            )
        elif mode == 2:
            # EXISTS / NOT EXISTS with non-equi correlation
            neg = rng.choice(["", "NOT "])
            sql = (
                f"SELECT a.rid, CAST(a.g AS BIGINT) AS c0 FROM fz a "
                f"WHERE {neg}EXISTS (SELECT 1 FROM fz b "
                f"WHERE {_corr_pred(rng)})"
            )
        elif mode == 3:
            # correlated IN / NOT IN.  The inner projection is NULL-
            # stripped — pinned ORACLE divergence, found by this
            # shape's first run at N=40: DuckDB 1.0.0's correlated-IN
            # decorrelation matches NULL = NULL (repro:
            #   o(g,x): (1,NULL); t(g,i): (1,5),(1,NULL);
            #   SELECT * FROM o a WHERE a.x IN
            #     (SELECT i FROM t b WHERE b.g = a.g)
            # returns the (1,NULL) row), while its own UNCORRELATED
            # IN and Spark both yield ANSI NULL -> row filtered.  With
            # a null-free inner set, both engines agree on the full
            # 3VL: NULL probe -> NULL (filtered), empty group ->
            # FALSE, and the NOT IN variants (verified including
            # NULL-in-inner, where both engines filter everything).
            neg = rng.choice(["", "NOT "])
            inner = rng.choice(["b.i2", "b.i1", f"({int_expr(rng)})"])
            sql = (
                f"SELECT a.rid, CAST(a.i1 AS BIGINT) AS c0 FROM fz a "
                f"WHERE a.i2 {neg}IN (SELECT {inner} FROM fz b "
                f"WHERE b.g = a.g AND ({inner}) IS NOT NULL)"
            )
        elif mode == 4:
            # LATERAL derived table, aggregate body (exactly one row
            # per outer row), optionally consumed in the outer WHERE.
            # Tandem-rendered (the shape-21 pattern) — third pinned
            # ORACLE divergence this shape found: an ungrouped
            # aggregate subquery is one row even over empty input
            # (max -> NULL), so ANSI comma-LATERAL keeps every outer
            # row; Spark does, DuckDB 1.0.0's comma-LATERAL drops
            # outer rows whose correlated group is empty (repro:
            #   o(g): (1),(2); t(g,i): (1,5);
            #   SELECT a.g, l.m FROM o a, LATERAL (SELECT max(b.i)
            #     AS m FROM t b WHERE b.g = a.g) l
            # loses the g=2 row).  DuckDB's LEFT JOIN LATERAL .. ON
            # TRUE restores the ANSI result, so the duck side renders
            # that — identical output by construction.
            m1, m2 = _corr_agg(rng), _corr_agg(rng)
            body = (
                f"LATERAL (SELECT {m1} AS m1, {m2} AS m2 FROM fz b "
                f"WHERE {_corr_pred(rng)}) l"
            )
            tail = ""
            if rng.random() < 0.4:
                tail = f" WHERE l.m1 IS NOT NULL AND l.m1 > {rng.randint(-9, 9)}"
            eng = f"SELECT a.rid, l.m1, l.m2 FROM fz a, {body}{tail}"
            duck_sql = (
                f"SELECT a.rid, l.m1, l.m2 FROM fz a "
                f"LEFT JOIN {body} ON TRUE{tail}"
            )
            _run_both_vec(fuzz_env, eng, duck_sql)
            continue
        else:
            # nested composition: EXISTS whose inner predicate holds a
            # correlated scalar one level down.  The innermost
            # correlates to the MIDDLE scope (c.g = b.g), not the
            # outermost: Spark's analyzer rejects outer references
            # that skip a nesting level (one-level correlation only —
            # the same restriction the reference's apply-pushdown has,
            # rules/plan.rs:205-280), and c.g = b.g = a.g makes the
            # result identical anyway.
            sql = (
                f"SELECT a.rid FROM fz a "
                f"WHERE EXISTS (SELECT 1 FROM fz b WHERE b.g = a.g "
                f"AND b.i1 <= (SELECT CAST(max(c.i1) AS BIGINT) FROM fz c "
                f"WHERE c.g = b.g))"
            )
        _run_both_vec(fuzz_env, sql, sql)
