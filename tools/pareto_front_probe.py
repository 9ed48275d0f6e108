"""Adversarial-front probe for pipeline_pareto_front.

    PYTHONPATH=/root/repo python tools/pareto_front_probe.py [n ...]

The skyline's two-phase divide-and-conquer is scan-bound on real text
(fronts are tiny: sf0.1 keeps 290 of 5,000 docs).  Its documented
worst case is ANTI-CORRELATED signals — every document Pareto-optimal,
front = n — where phase 2's per-source merge receives the whole corpus
as one Arrow group.  This probe builds exactly that corpus: doc i has
i+1 DISTINCT tokens plus (n - i) repeats of a filler token, so
n_tok = n + i + 1 strictly increases while n_uniq... also increases —
so instead the filler count runs the OPPOSITE way: doc i = (i+1)
distinct tokens + 2*(n - i) fillers gives n_tok = 2n - i + 1 strictly
DECREASING in i while n_uniq = i + 2 strictly increases (the filler is
itself one distinct token).  No doc dominates any other: the true
front is ALL n documents, and phase 2 funnels n rows through one
group per source.

Reported: wall time and front size at each n, one source (worst case:
the whole front in ONE root-merge Arrow group) vs 20 sources
(realistic sharding).  Note the corpus itself is QUADRATIC in n by
construction — an all-on-front antichain needs n distinct n_tok
values, so doc lengths span up to 2n tokens — which is also why real
corpora don't look like this; the probe sizes stay where that
synthetic corpus is tractable.

Round 12 (VERDICT r11 item 5): the promised fix landed as (a) the
salt-tree merge (32 -> 8 -> 1 per source) and (b) the Kung/Luccio/
Preparata O(n log n) staircase kernel replacing the O(n * front)
pairwise loop — on an antichain the root merge necessarily ingests
the whole front (it IS the output), so the KERNEL is what flattens
the cliff.  Because the Spark-side corpus is quadratic in n, the
kernel's asymptotics are probed directly on synthetic antichain
batches at n far past what the corpus generator can reach
(--kernel mode below, no Spark session needed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
SYMLINK_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "embeddings".split()
)


def build(spark, n: int, n_sources: int, out: str) -> str:
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    i = F.col("doc_id")
    distinct_part = F.transform(
        F.sequence(F.lit(0), i.cast("int")),
        lambda j: F.concat(F.lit("u"), i.cast("string"), F.lit("_"), j.cast("string")),
    )
    filler_part = F.transform(
        F.sequence(F.lit(1), (F.lit(2 * n) - 2 * i).cast("int")),
        lambda _: F.lit("zz"),
    )
    text = F.concat_ws(" ", F.concat(distinct_part, filler_part))
    docs = d.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(
            F.lit("src_"), F.pmod(i, F.lit(n_sources)).cast("string")
        ).alias("source"),
        F.length(text).alias("n_chars"),
    )
    docs.repartition(64).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    for t in SYMLINK_TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return out


def kernel_bench(ns: list[int]) -> None:
    """Time _pareto_local_front alone on an all-on-front antichain
    pandas batch (n_tok desc, n_uniq asc — nothing dominates), the
    exact shape that made the old O(n * front) loop do ~n^2/2
    comparisons.  No Spark session; this is the root-merge task's
    inner cost in isolation."""
    import pandas as pd

    from risinglight_spark.operators.pipeline_ops import (
        _pareto_local_front,
    )

    print(f"{'orientation':>12} {'n':>9} {'kernel_s':>9} {'front':>9}")
    for n in ns:
        # two antichain orientations: y ascending (inserts append-ish)
        # and y descending with z breaking the antichain (inserts land
        # at the structure's front) — the round-12 review measured the
        # first-cut sorted-list staircase quadratic on the second;
        # the Fenwick kernel must stay flat on BOTH.
        for name, pdf in (
            ("y-asc", pd.DataFrame({
                "doc_id": range(n), "source": "s",
                "n_tok": [2 * n - i + 1 for i in range(n)],
                "n_uniq": [i + 2 for i in range(n)],
                "alpha_ratio": [0.5] * n,
            })),
            ("y-desc", pd.DataFrame({
                "doc_id": range(n), "source": "s",
                "n_tok": [2 * n - i + 1 for i in range(n)],
                "n_uniq": [n - i for i in range(n)],
                "alpha_ratio": [i * 1e-9 for i in range(n)],
            })),
        ):
            _pareto_local_front(pdf.head(100))  # warm imports
            t0 = time.perf_counter()
            front = len(_pareto_local_front(pdf))
            dt = time.perf_counter() - t0
            print(f"{name:>12} {n:>9,} {dt:>9.3f} {front:>9,}", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--kernel":
        kernel_bench(
            [int(a) for a in sys.argv[2:]] or [5_000, 50_000, 500_000]
        )
        return
    ns = [int(a) for a in sys.argv[1:]] or [1_000, 5_000]
    from risinglight_spark.operators.pipeline_ops import (
        pipeline_pareto_front,
    )
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name="pareto_front_probe")
    print(f"{'n':>8} {'sources':>8} {'wall_s':>8} {'front':>9}")
    for n in ns:
        for n_sources in (20, 1):
            out = build(
                spark, n, n_sources, f"/tmp/pareto_probe_{n}_{n_sources}"
            )
            t0 = time.perf_counter()
            front = pipeline_pareto_front(spark, out).count()
            dt = time.perf_counter() - t0
            print(
                f"{n:>8} {n_sources:>8} {dt:>8.2f} {front:>9,}",
                flush=True,
            )


if __name__ == "__main__":
    main()
