"""The local correctness gate: every registry entry with an oracle must
match DuckDB on row count, column names, and order-insensitive value
hash at sf0.001 (the driver repeats this at sf0.01).

Mirrors the reference's sqllogictest strategy (reference:
tests/sqllogictest.rs:17-61 — every .slt file runs against both
engines); here the 'two engines' are our Spark implementation and
DuckDB.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)
from oracle_check import value_hash  # noqa: E402

from risinglight_spark.registry import collect  # noqa: E402

ENTRIES = collect()


@pytest.mark.parametrize("name", sorted(ENTRIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    e = ENTRIES[name]
    sdf = e.fn(spark, sf_dir).toPandas()
    if e.oracle is None:
        # rows-only contract: must run and be deterministic across reruns
        sdf2 = e.fn(spark, sf_dir).toPandas()
        assert len(sdf) == len(sdf2)
        assert value_hash(sdf) == value_hash(sdf2)
        return
    odf = oracle.sql(e.oracle).df()
    assert len(sdf) == len(odf), f"row count {len(sdf)} != oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), "value hash mismatch vs DuckDB"
