"""NSW hot-group cap (NSW_MAX_GROUP): a (cell, bkt) group whose
DISTINCT-vector count exceeds the threshold splits into deterministic
sub-groups, bounding the rep-pair join at O(m * NSW_MAX_GROUP) — the
SemDeDup SEM_MAX_CELL treatment applied to the graph build
(tests/test_dedup_semdedup_cap.py is the model).

Below the cap the join predicate degenerates to the exact uncapped
form — that path is also pinned by tests/test_replica_collapse.py's
edge-equality tests, which compare against the UNcapped direct
formulation.

Expected edges are computed with a Spark-side direct (member-pair)
join, not a Python model, so the float32 embedding arithmetic is
identical on both sides of the comparison."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F


def _mk_nodes(spark, n: int):
    """n distinct vectors, all in one (cell, bkt) group — the hot-group
    shape the cap exists for.  Distinct vectors mean every node is its
    own replica class (rep == vec_id), isolating the sub-group logic
    from the replica collapse."""
    rng = random.Random(7)
    rows = [
        (
            vid,
            [round(rng.uniform(-1, 1), 3) for _ in range(4)],
            0,
            0,
        )
        for vid in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT, bkt INT"
    )


def _direct_edges(nodes, extra_key=None):
    """The pre-collapse member-pair formulation, optionally restricted
    to pairs sharing `extra_key` — quadratic, fine at test size."""
    from pyspark.sql import Window

    from risinglight_spark.functions.vector import l2_distance
    from risinglight_spark.operators.vector_search import NSW_M

    x, y = nodes.alias("x"), nodes.alias("y")
    cond = (
        (F.col("x.cell") == F.col("y.cell"))
        & (F.col("x.bkt") == F.col("y.bkt"))
        & (F.col("x.vec_id") != F.col("y.vec_id"))
    )
    if extra_key is not None:
        cond = cond & (F.col(f"x.{extra_key}") == F.col(f"y.{extra_key}"))
    d = l2_distance(F.col("x.embedding"), F.col("y.embedding"))
    w = Window.partitionBy("src").orderBy("d", "dst")
    return (
        x.join(y, cond)
        .select(
            F.col("x.vec_id").alias("src"),
            F.col("y.vec_id").alias("dst"),
            d.alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NSW_M)
        .select("src", "dst")
    )


def test_hot_group_splits_and_matches_subgrouped_direct(spark, monkeypatch):
    from risinglight_spark.operators import vector_search as vs

    monkeypatch.setattr(vs, "NSW_MAX_GROUP", 4)
    n = 12
    nodes = _mk_nodes(spark, n)

    # replicate the engine's sub-group assignment exactly (same
    # xxhash64 + pmod expressions; rep == vec_id for distinct vectors)
    n_sub = math.ceil(n / 4)
    keyed = nodes.withColumn(
        "subg", F.pmod(F.xxhash64("vec_id"), F.lit(n_sub)).cast("int")
    )
    n_groups = keyed.select("subg").distinct().count()
    assert n_groups > 1, "hash must actually split the group"

    want = sorted(
        (r["src"], r["dst"])
        for r in _direct_edges(keyed, extra_key="subg").collect()
    )
    got = sorted(
        (r["src"], r["dst"]) for r in vs.nsw_edges(nodes).collect()
    )
    assert got == want and len(got) > 0
    # the capped graph must differ from the uncapped one (the split is
    # real), while every src keeps <= NSW_M out-edges
    uncapped = sorted(
        (r["src"], r["dst"]) for r in _direct_edges(nodes).collect()
    )
    assert got != uncapped


def test_below_cap_group_is_exact_uncapped(spark, monkeypatch):
    """At exactly the threshold the group must NOT split: edges equal
    the plain direct formulation over the whole group."""
    from risinglight_spark.operators import vector_search as vs

    monkeypatch.setattr(vs, "NSW_MAX_GROUP", 12)
    nodes = _mk_nodes(spark, 12)
    want = sorted(
        (r["src"], r["dst"]) for r in _direct_edges(nodes).collect()
    )
    got = sorted(
        (r["src"], r["dst"]) for r in vs.nsw_edges(nodes).collect()
    )
    assert got == want and len(got) > 0
