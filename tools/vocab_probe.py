"""Vocabulary-growth probe: the replica-probe variant that grows
DISTINCT KEYS instead of row counts.

    PYTHONPATH=/root/repo python tools/vocab_probe.py [factor] [name ...]

tools/scale_probe.py replicates documents verbatim, so every
replicated token is an EXISTING vocabulary key: the (token) /
(source, token) aggregates gain count mass but never rows, which
makes that probe structurally blind to vocabulary-sized funnels (the
flaw class behind the round-8 text_kl_source_divergence fix — see
SCALE.md "input cardinality classes").  This probe closes the gap:
replica k rewrites every token with a ``_k`` suffix, so R replicas
multiply the vocabulary (and every distinct-token-keyed intermediate)
by exactly R while per-token counts stay constant — the dimension the
fixed aggregate+broadcast form must stay flat in, and the dimension
the old window form serialized.

Only the documents table is rewritten (token-keyed text ops read
nothing else); timings print per entry at the given factor.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
DOC_STRIDE = 1_000_000_000

DEFAULT_QUERIES = (
    "text_kl_source_divergence",
    "text_doc_frequency",
    "text_zipf_fit",
    "text_oov_rate",
)


def build_vocab_replica(spark, factor: int) -> str:
    out = f"/tmp/vocab_probe_{factor}x"
    if os.path.isdir(out):
        return out
    from risinglight_spark.tables import load

    os.makedirs(out, exist_ok=True)
    df = load(spark, BASE, "documents")
    parts = []
    for k in range(factor):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.when(
                    F.length(t) > 0, F.concat(t, F.lit(f"_{k}"))
                ).otherwise(t),
            ),
            " ",
        )
        parts.append(
            df.select(
                (F.col("doc_id") + F.lit(k * DOC_STRIDE)).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionAll(p)
    rep.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or list(DEFAULT_QUERIES)
    from risinglight_spark.registry import collect
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name=f"vocab_probe_{factor}x")
    entries = collect()
    rep_dir = build_vocab_replica(spark, factor)
    n_tok = spark.read.parquet(f"{rep_dir}/documents.parquet").select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.length("t") > 0).select("t").distinct().count()
    print(f"# vocab at {factor}x: {n_tok:,} distinct raw tokens", file=sys.stderr)
    for name in names:
        entries[name].fn(spark, rep_dir).collect()  # warm / compile
        t0 = time.perf_counter()
        entries[name].fn(spark, rep_dir).collect()
        print(f"{name:36s} {factor}x-vocab  {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
