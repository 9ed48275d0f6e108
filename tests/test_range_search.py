"""Prune-losslessness for ann_range_search_ivf: at EVERY eps the
triangle-inequality cell prune must return exactly the brute-force
eps-filter — including eps values tight enough that cells actually
get pruned (the scale path the sf oracles never exercise, because at
fixture scale every cell usually survives)."""

from __future__ import annotations

import pytest


def _brute(spark, sf_dir, eps):
    import pyspark.sql.functions as F

    from risinglight_spark.functions.vector import l2_distance, lit_vector
    from risinglight_spark.operators.vector_search import QUERY_VEC
    from risinglight_spark.tables import Tables

    t = Tables(spark, sf_dir)
    d = l2_distance(F.col("embedding"), lit_vector(QUERY_VEC))
    return {
        (r["vec_id"], r["d"])
        for r in t.embeddings.select(
            "vec_id", F.round(d, 10).alias("d")
        )
        .filter(d <= F.lit(eps))
        .collect()
    }


@pytest.mark.parametrize("eps", [2.60, 2.70, 2.75, 2.85, 3.20])
def test_range_prune_is_lossless(spark, sf_dir, eps, monkeypatch):
    from risinglight_spark.operators import vector_search as vs

    monkeypatch.setattr(vs, "RANGE_EPS", eps)
    got = {
        (r["vec_id"], r["d"])
        for r in vs.ann_range_search_ivf(spark, sf_dir).collect()
    }
    assert got == _brute(spark, sf_dir, eps)


def test_prune_fires_and_stays_exact(spark, tmp_path, monkeypatch):
    """Synthetic 3-cluster corpus where the query sits INSIDE one tight
    cluster and the other two are far away: at eps=1.0 the prune must
    drop the far cells (asserted by replaying the survivor decision)
    while the result still equals the brute-force filter — matches
    exist AND pruning fires, the combination the fixture geometry
    never produces (its cells all overlap the query shell)."""
    import math

    import pyspark.sql.functions as F

    from risinglight_spark.operators import vector_search as vs

    rows = []
    vid = 0
    for cell, (offset, n) in enumerate(
        [(0.05, 40), (5.0, 40), (-5.0, 40)]
    ):
        for j in range(n):
            v = [
                vs.QUERY_VEC[i]
                + offset
                + 0.01 * ((i * 7 + j * 13) % 5 - 2)
                for i in range(vs.DIM)
            ]
            rows.append((vid, [float(x) for x in v], cell))
            vid += 1
    sf_dir = str(tmp_path / "range_corpus")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/embeddings.parquet"
    )

    eps = 1.0
    monkeypatch.setattr(vs, "RANGE_EPS", eps)
    got = {
        (r["vec_id"], r["d"])
        for r in vs.ann_range_search_ivf(spark, sf_dir).collect()
    }
    want = _brute(spark, sf_dir, eps)
    assert got == want
    assert len(want) == 40  # exactly the near cluster

    # replay the survivor decision: the two far cells must be pruned
    cents = vs.ivf_centroids_cached(spark, sf_dir)
    maxrad = {
        r["cell"]: r["maxrad"]
        for r in vs._cell_maxrad_cached(spark, sf_dir).collect()
    }
    survivors = []
    for r in cents.collect():
        acc = 0.0
        for i in range(vs.DIM):
            diff = float(r[f"c{i}"]) - vs.QUERY_VEC[i]
            acc += diff * diff
        dq = math.sqrt(acc)
        if dq - maxrad[r["cell"]] <= eps + vs._RANGE_PRUNE_SLACK:
            survivors.append(r["cell"])
    assert survivors == [0]  # both far cells pruned
