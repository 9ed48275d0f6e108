"""Hot-cell cap for dedup_semdedup (SCALE.md / round-9 item).

A cell with m distinct representatives costs O(m^2) in the pair join;
cells above SEM_MAX_CELL reps are split by a secondary hash, bounding
per-cell work at O(m * SEM_MAX_CELL).  The cap is a recall trade:
cross-sub-cell pairs are never compared, so the capped drop set must
be a SUBSET of the exact drop set — never a superset (no false
drops), and the survivor/total row accounting must be unchanged.
"""

from __future__ import annotations

import pytest


def _drops(spark, sf_dir):
    from risinglight_spark.operators.dedup import dedup_semdedup

    rows = dedup_semdedup(spark, sf_dir).collect()
    return (
        {r["vec_id"] for r in rows if r["is_dropped"]},
        {r["vec_id"] for r in rows},
    )


def _evict(sf_dir):
    # dedup_semdedup memoizes its mined assets; evict so the capped
    # run actually re-mines instead of reading the exact-run cache.
    from risinglight_spark import operators as ops

    for kind in ("semdedup_assign", "semdedup_dropped"):
        ops._evict_cached(kind, sf_dir)


def test_capped_drops_are_subset_of_exact(spark, sf_dir, monkeypatch):
    from risinglight_spark.operators import dedup as dd

    assert dd.SEM_MAX_CELL >= 1024  # test SFs must stay below the cap
    exact_drops, exact_ids = _drops(spark, sf_dir)

    # Force the cap to fire: sf0.001 has ~50 reps/cell, so a cap of 8
    # splits every cell ~7 ways.
    _evict(sf_dir)
    monkeypatch.setattr(dd, "SEM_MAX_CELL", 8)
    try:
        capped_drops, capped_ids = _drops(spark, sf_dir)
    finally:
        _evict(sf_dir)  # don't poison later tests with capped assets

    assert capped_ids == exact_ids  # row accounting unchanged
    assert capped_drops <= exact_drops  # recall trade only, no false drops
    # The split must actually have removed comparisons on this corpus
    # (otherwise the test isn't exercising the cap at all).
    assert capped_drops != exact_drops


def test_cap_inactive_below_threshold(spark, sf_dir):
    """At test SF the cap never fires, so the registry entry remains
    byte-identical to the exact DuckDB oracle (checked by the main
    correctness gate); here we just pin the plan precondition."""
    from risinglight_spark.operators import dedup as dd
    from risinglight_spark.tables import Tables

    import pyspark.sql.functions as F

    t = Tables(spark, sf_dir)
    max_cell = (
        t.embeddings.groupBy("label")
        .agg(F.count_distinct("embedding").alias("m"))
        .agg(F.max("m"))
        .collect()[0][0]
    )
    assert max_cell <= dd.SEM_MAX_CELL
