"""Partitioning-invariance gate: the engine's core claim is that
results are bit-identical at ANY parallelism (SCALE.md principle 6 —
fixed-point sums, order-pinned argmax/argmin, rounded transcendentals,
hash-keyed sampling).  This test runs a float-heavy sample of the
registry under a deliberately different shuffle layout (7 partitions +
repartitioned inputs vs the default) and asserts the value hash is
unchanged — the property that makes re-runs reproducible when a 100 TB
job moves between cluster sizes.
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

# Float-aggregation-heavy queries where naive double sums WOULD drift
# with partition count — exactly the surface the fixed-point machinery
# protects.
SAMPLE = [
    "tpch_q1",
    "agg_simple",
    "avg_rewrite",
    "text_unigram_logprob",
    "text_kl_source_divergence",
    "text_dsir_importance",
    "events_ab_ttest",
    "vector_pca_power_iteration",
    "agg_stats_library",
    "events_linear_trend",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_partitioning(spark, sf_dir, name):
    baseline = value_hash(ENTRIES[name].fn(spark, sf_dir).toPandas())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = value_hash(ENTRIES[name].fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert baseline == again, (
        f"{name}: result depends on shuffle partitioning"
    )
