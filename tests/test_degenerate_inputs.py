"""Degenerate-input regressions for the round-3 advisor findings:

- text_mlm_masking on a zero-token / whitespace-only / NULL document
  (Spark sequence(1, 0) yields descending [1, 0] and element_at(t, 0)
  throws — the masking transform must iterate the token array itself);
- agg_histogram_equiwidth on a constant-valued column (hi == lo makes
  the bin width 0; engines disagree on x/0, so the degenerate case is
  pinned to bin 0 on both sides).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mlm_masking_empty_docs(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "hello world foo bar", "en", "web", 19),
            (2, "", "en", "web", 0),
            (3, "   ", "en", "web", 3),
            (4, None, "en", "web", 0),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT",
    )
    sf = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    from risinglight_spark.operators.text_analysis import text_mlm_masking

    rows = {r["doc_id"]: r for r in text_mlm_masking(spark, sf).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_masked"] == 0
    assert rows[3]["n_tokens"] == 0 and rows[3]["n_masked"] == 0


def test_histogram_constant_column(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, 7.5) for i in range(10)], "event_id BIGINT, value DOUBLE"
    ).withColumns(
        {
            "user_id": F.lit(1).cast("bigint"),
            "event_type": F.lit("x"),
            "ts": F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
            "properties": F.lit(None).cast("string"),
        }
    )
    sf = str(tmp_path)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    from risinglight_spark.operators.aggregates import agg_histogram_equiwidth

    out = agg_histogram_equiwidth(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["bin"] == 0 and out[0]["n"] == 10
    assert out[0]["bin_lo"] == 7.5 and out[0]["bin_hi"] == 7.5


def test_gopher_rules_degenerate_docs(spark, tmp_path):
    """text_gopher_rules on empty / whitespace-only / NULL / single-line
    documents: NULL text is excluded; zero-token docs keep all-NULL
    ratios and keep=false (no division-by-zero divergence between
    engines)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and that dog be with it of", "en",
             "web", 47),
            (2, "", "en", "web", 0),
            (3, "   \n  \n ", "en", "web", 8),
            (4, None, "en", "web", 0),
            (5, "- bullet\n- bullet two\n- three", "en", "web", 29),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT",
    )
    sf = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    from risinglight_spark.operators.text_analysis import text_gopher_rules

    rows = {r["doc_id"]: r for r in text_gopher_rules(spark, sf).collect()}
    assert 4 not in rows  # NULL text excluded
    assert rows[2]["word_count"] == 0
    assert rows[2]["mean_word_len"] is None
    assert rows[2]["keep"] is False
    assert rows[3]["word_count"] == 0 and rows[3]["keep"] is False
    # short doc: word-count rule fails but per-rule columns are exact
    assert rows[1]["stop_hits"] >= 2 and rows[1]["keep"] is False
    assert abs(rows[5]["bullet_line_frac"] - 1.0) < 1e-9


def test_semdedup_zero_and_duplicate_vectors(spark, tmp_path):
    """dedup_semdedup replica collapse: identical embeddings keep only
    the min-vec_id representative; zero vectors (cos undefined) are
    never dropped."""
    import risinglight_spark.operators.dedup as D

    dim = D.DIM
    v1 = [1.0] + [0.0] * (dim - 1)
    z = [0.0] * dim
    emb = spark.createDataFrame(
        [
            (1, v1, 0),
            (2, v1, 0),  # exact replica of 1 -> dropped
            (3, z, 0),   # zero vector -> never dropped
            (4, z, 0),   # zero replica -> still not dropped (cos NaN)
        ],
        f"vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT",
    )
    sf = str(tmp_path)
    emb.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    rows = {
        r["vec_id"]: r["is_dropped"]
        for r in D.dedup_semdedup(spark, sf).collect()
    }
    assert rows[1] is False
    assert rows[2] is True
    assert rows[3] is False and rows[4] is False
