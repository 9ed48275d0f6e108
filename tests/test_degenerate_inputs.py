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
