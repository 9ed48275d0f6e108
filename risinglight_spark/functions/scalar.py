"""Scalar expression builders with reference-exact semantics.

Everything here is a *Column expression* built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, never a
row-at-a-time Python UDF.  Each builder cites the reference behavior it
reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def substring_rl(s: Column, start: Column | int, length: Column | int) -> Column:
    """risinglight ``substring(s, from, for)``.

    Reference: src/array/ops.rs:304-335 — 1-based; start>=0 maps to
    0-based ``start-1``; negative start counts from the end
    (``chars + start``); end = start+len; if start > end they swap
    (negative length selects *backwards*); the window is then clamped to
    [0, chars].

    This differs from both Spark's and DuckDB's substring for start<1
    or negative length, so we materialize the formula with built-ins.
    """
    start = F.lit(start) if isinstance(start, int) else start
    length = F.lit(length) if isinstance(length, int) else length
    # LONG arithmetic: the reference saturating_adds i32 (ops.rs:324);
    # INT here would wrap on huge offsets and invert the window.
    start = start.cast("long")
    length = length.cast("long")
    chars = F.length(s).cast("long")
    st = F.when(start >= 0, start - 1).otherwise(chars + start)
    en = st + length
    lo = F.least(st, en)
    hi = F.greatest(st, en)
    skip = F.greatest(lo, F.lit(0).cast("long"))
    take = F.greatest(hi - skip, F.lit(0).cast("long"))
    # Spark substring is 1-based on the already-computed window; clamp
    # back into INT range (the window is at most `chars` long anyway).
    imax = F.lit(2147483647).cast("long")
    return F.substring(
        s, F.least(skip + 1, imax).cast("int"), F.least(take, imax).cast("int")
    )


def substring_rl_sql(s: str, start: str, length: str) -> str:
    """Same formula as :func:`substring_rl`, rendered as DuckDB SQL so the
    oracle can verify the parity shim itself."""
    st = f"(CASE WHEN ({start}) >= 0 THEN ({start}) - 1 ELSE length({s}) + ({start}) END)"
    en = f"({st} + ({length}))"
    skip = f"greatest(least({st}, {en}), 0)"
    take = f"greatest(greatest({st}, {en}) - {skip}, 0)"
    return f"substring({s}, {skip} + 1, {take})"


def repeat_rl(s: Column, n: Column | int) -> Column:
    """``repeat(s, n)`` — reference src/array/ops.rs:638-653; n<=0 gives
    the empty string (the reference loops 0..n).  Spark's repeat returns
    '' for n<=0 as well, so this is a direct mapping kept for the
    function inventory."""
    n = F.lit(n) if isinstance(n, int) else n
    return F.repeat(s, n)


def replace_rl(s: Column, pat: str, to: str) -> Column:
    """``replace(s, from, to)`` — reference src/array/ops.rs:628-636
    (literal, non-regex replace).  Spark's F.replace is also literal."""
    return F.replace(s, F.lit(pat), F.lit(to))


def div_rl(a: Column, b: Column) -> Column:
    """Division with div-by-zero -> NULL.

    Reference: src/array/ops.rs:159-168 clears the validity bit where the
    divisor is 0.  Spark with ``spark.sql.ansi.enabled=false`` already
    returns NULL on x/0 for all numeric types; session.py pins that
    config, so plain ``/`` is parity.  Kept as an explicit builder for
    callers who want it visible in the plan."""
    return a / b


def extract_rl(part: str, d: Column) -> Column:
    """``extract(year|month|day FROM date)`` — reference
    src/array/ops.rs:245-267 (only these three parts exist)."""
    part = part.lower()
    if part == "year":
        return F.year(d)
    if part == "month":
        return F.month(d)
    if part == "day":
        return F.dayofmonth(d)
    raise ValueError(f"reference extract supports year/month/day, not {part!r}")


def count_rl(c: Column) -> Column:
    """``count(x)`` returns Int32 in the reference
    (src/executor/evaluator.rs:238); Spark count is bigint — cast for
    type parity where the surface requires it."""
    return F.count(c).cast("int")


def avg_rl(c: Column) -> Column:
    """avg -> sum/count rewrite (reference src/binder/expr.rs:443-447).
    Matters for integer inputs where the reference's integer sum /
    integer count stays integer-typed division semantics; on doubles it
    is equivalent to F.avg but we keep the rewrite to mirror the plan."""
    return F.sum(c) / F.count(c)
