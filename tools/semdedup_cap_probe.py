"""Hot-cell probe for dedup_semdedup's SEM_MAX_CELL cap.

    PYTHONPATH=/root/repo python tools/semdedup_cap_probe.py [factor ...]

tools/scale_probe.py replicates embeddings VERBATIM, so replicas
collapse onto one representative per cell and the pair join never
grows — that probe is structurally blind to the quadratic axis the
cap bounds (DISTINCT representatives per cell).  This probe closes
the gap the same way vocab_probe.py does for token keys: replica k
perturbs embedding[0] by (k+1)*1e-4, so R replicas multiply the
DISTINCT vectors in every cell by exactly R (the perturbation is far
too small to move a vector to a different centroid, and cosine to the
original stays ~1 >= tau, mirroring a real near-duplicate cluster).

For each factor the MINING stage (both memoized assets evicted, so
the timing covers assignment + pair join, not a cache read) is timed
twice: once with the production cap (SEM_MAX_CELL=1024) and once
uncapped (cap = 2**62).  Uncapped cost grows ~R^2 in the replica
factor; capped must grow ~linearly (O(m * cap) per cell).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
VEC_STRIDE = 10_000_000


def build_hotcell_replica(spark, factor: int) -> str:
    out = f"/tmp/semcap_probe_{factor}x"
    if os.path.isdir(out):
        return out
    from risinglight_spark.tables import load

    os.makedirs(out, exist_ok=True)
    df = load(spark, BASE, "embeddings")
    parts = []
    for k in range(factor):
        parts.append(
            df.withColumn("vec_id", F.col("vec_id") + F.lit(k * VEC_STRIDE))
            .withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (
                            F.col("embedding").getItem(0)
                            + F.lit(float((k + 1) * 1e-4))
                        ).cast("float")
                    ),
                    F.slice(F.col("embedding"), 2, 10_000),
                ),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionAll(p)
    rep.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def _evict(sf_dir: str) -> None:
    from risinglight_spark import operators as ops

    for kind in ("semdedup_assign", "semdedup_dropped"):
        ops._evict_cached(kind, sf_dir)


def _time_mining(spark, sf_dir: str) -> tuple[float, int]:
    from risinglight_spark.operators.dedup import dedup_semdedup

    _evict(sf_dir)
    t0 = time.perf_counter()
    df = dedup_semdedup(spark, sf_dir)
    n_drop = df.agg(
        F.sum(F.col("is_dropped").cast("long")).alias("d")
    ).collect()[0]["d"]
    dt = time.perf_counter() - t0
    _evict(sf_dir)
    return dt, int(n_drop)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 30]
    from risinglight_spark.operators import dedup as dd
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name="semdedup_cap_probe")
    # Warm codegen/worker paths once at base scale.
    _time_mining(spark, BASE)
    print(f"{'factor':>6} {'mode':>9} {'mining_s':>9} {'dropped':>9}")
    for factor in factors:
        sf_dir = build_hotcell_replica(spark, factor)
        for mode, cap in (("capped", 1024), ("uncapped", 2**62)):
            dd.SEM_MAX_CELL = cap
            try:
                dt, n_drop = _time_mining(spark, sf_dir)
            finally:
                dd.SEM_MAX_CELL = 1024
            print(
                f"{factor:>5}x {mode:>9} {dt:>9.2f} {n_drop:>9}",
                flush=True,
            )


if __name__ == "__main__":
    main()
