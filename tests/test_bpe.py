"""BPE trainer unit tests (text_bpe_train has no SQL oracle — the
argmax-per-round loop isn't SQL-expressible — so its semantics are
pinned here instead)."""

from __future__ import annotations

import pandas as pd

from risinglight_spark.operators.text_analysis import N_BPE_MERGES, _apply_merge
from risinglight_spark.registry import collect


def test_apply_merge_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "b", "c"],), (["a", "a", "b"],), (["x"],)],
        "t array<string>",
    )
    out = [r.t for r in df.select(_apply_merge("a", "b")(df.t).alias("t")).collect()]
    assert out == [["a b", "a b", "c"], ["a", "a b"], ["x"]]


def test_apply_merge_non_overlapping(spark):
    # "a a a" with merge (a,a): greedy left-to-right pairs the first
    # two, never the overlapping middle
    df = spark.createDataFrame([(["a", "a", "a"],)], "t array<string>")
    out = df.select(_apply_merge("a", "a")(df.t).alias("t")).collect()[0].t
    assert out == ["a a", "a"]


def test_bpe_train_shape_and_determinism(spark, sf_dir):
    fn = collect()["text_bpe_train"].fn
    a = [tuple(r) for r in fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert a == b  # deterministic tie-break
    assert len(a) == N_BPE_MERGES
    assert [r[0] for r in a] == list(range(1, N_BPE_MERGES + 1))
    assert len({r[1] for r in a}) == N_BPE_MERGES  # merges are distinct
    assert all(r[2] > 0 for r in a)
