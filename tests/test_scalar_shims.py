"""Unit tests for the reference-exact scalar shims, ported from the
reference's own expectations.

substring_rl replays src/array/ops.rs:304-335 (1-based, negative start
from the end, negative length selects backwards, clamped) — the cases
here are the reference's tests/sql/substring.slt lines 45-200, which
diverge from both Spark's and DuckDB's builtin substring and therefore
can't run through the slt runner.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from risinglight_spark.functions.scalar import (
    count_rl,
    repeat_rl,
    replace_rl,
    substring_rl,
)

ROWS = [
    Row(s="hello", off=1, length=2),
    Row(s="world", off=2, length=3),
    Row(s="b", off=1, length=1),
    Row(s=None, off=2, length=2),
]


@pytest.fixture(scope="module")
def strings(spark):
    return spark.createDataFrame(ROWS, "s STRING, off INT, length INT")


def _col(df, col):
    return [r[0] for r in df.select(col).collect()]


# (start, length, expected) — reference tests/sql/substring.slt
CONST_CASES = [
    (1, 2, ["he", "wo", "b", None]),
    (2, 2, ["el", "or", "", None]),
    (-2, 2, ["lo", "ld", "b", None]),  # negative start counts from end
    (2, -2, ["h", "w", "b", None]),  # negative length selects backwards
    (-2, -2, ["el", "or", "", None]),
    (2, 0, ["", "", "", None]),
    (2147483647, 2147483646, ["", "", "", None]),  # huge offset clamps
]


@pytest.mark.parametrize("start,length,expected", CONST_CASES)
def test_substring_rl_const(strings, start, length, expected):
    got = _col(
        strings, substring_rl(F.col("s"), start, length).alias("x")
    )
    assert got == expected


def test_substring_rl_variable_args(strings):
    got = _col(
        strings,
        substring_rl(F.col("s"), F.col("off"), F.col("length")).alias("x"),
    )
    assert got == ["he", "orl", "b", None]


def test_substring_rl_zero_offset(strings):
    # slt: substring(s from 0 for length) — start 0 maps to -1, window
    # clamps to [0, ..), eating one character of the length
    got = _col(
        strings, substring_rl(F.col("s"), 0, F.col("length")).alias("x")
    )
    assert got == ["h", "wo", "", None]


def test_substring_rl_const_string(strings):
    got = _col(
        strings,
        substring_rl(F.lit("hello"), F.col("off"), F.col("length")).alias("x"),
    )
    assert got == ["he", "ell", "h", "el"]


def test_repeat_replace_count(spark):
    df = spark.createDataFrame(
        [Row(s="ab", n=3), Row(s="x", n=0), Row(s=None, n=2)],
        "s STRING, n INT",
    )
    assert _col(df, repeat_rl(F.col("s"), F.col("n")).alias("x")) == [
        "ababab",
        "",
        None,
    ]
    assert _col(df, replace_rl(F.col("s"), "a", "zz").alias("x")) == [
        "zzb",
        "x",
        None,
    ]
    # count(x) skips NULLs and returns Int32 (evaluator.rs:238)
    out = df.agg(count_rl(F.col("s")).alias("c"))
    assert out.collect()[0].c == 2
    assert dict(out.dtypes)["c"] == "int"
