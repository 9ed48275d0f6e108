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


def test_bpe_encode_roundtrip_and_monotonic(spark, sf_dir):
    # Splitting every merged token on its internal spaces must
    # reproduce the base whitespace token stream exactly (lossless),
    # and merging can only shrink the sequence.
    from pyspark.sql import functions as F

    from risinglight_spark.functions import text as T
    from risinglight_spark.operators.text_analysis import _bpe_train_corpus
    from risinglight_spark.tables import Tables

    _, enc = _bpe_train_corpus(spark, sf_dir)
    base = (
        Tables(spark, sf_dir)
        .documents.select(
            "doc_id", T.tokens(T.normalized_text(F.col("text"))).alias("b")
        )
        .filter(F.size("b") >= 2)
    )
    j = enc.join(base, "doc_id").select(
        F.size("b").alias("nb"),
        F.size("t").alias("nt"),
        (
            F.flatten(F.transform("t", lambda x: F.split(x, " ")))
            == F.col("b")
        ).alias("roundtrip_ok"),
    )
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("roundtrip_ok"), 1).otherwise(0)).alias("bad"),
        F.sum(F.when(F.col("nt") > F.col("nb"), 1).otherwise(0)).alias("grew"),
    ).collect()[0]
    assert agg.n > 0
    assert agg.bad == 0
    assert agg.grew == 0


def test_bpe_encode_counts_match_registry_entry(spark, sf_dir):
    df = collect()["text_bpe_encode"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(r.n_bpe_tokens <= r.n_base_tokens for r in rows)
    assert all(0 < r.compression <= 1.0 for r in rows)
