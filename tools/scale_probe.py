"""Scaling probe: replicate the sf0.1 fixtures 10x/100x with shifted ids
and time registry queries against the replicas.

    python tools/scale_probe.py [10|100] name [name ...]

Replicas are exact copies with shifted ids (documents keep identical
text — deliberately the dup-heavy worst case for near-dup ops; pair
mining over R-way replicas grows O(R^2) by construction, which is a
property of the synthetic replication, not the operator).  Results feed
the "Measured scaling" tables in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
# Per-table key shifts.  TPC-H foreign keys shift with the SAME stride
# as the primary key they reference, so replica k is a self-contained
# copy of the star schema: join cardinalities stay exactly linear in
# the replication factor (shifting only primary keys would cross-match
# replicas and inflate joins quadratically).  nation/region stay single
# (true dimensions).
_S = 10_000_000
SHIFTS = {
    "documents": [("doc_id", 1_000_000_000)],
    "embeddings": [("vec_id", _S)],
    "events": [("event_id", 1_000_000_000)],
    "orders": [("o_orderkey", _S), ("o_custkey", _S)],
    "lineitem": [("l_orderkey", _S), ("l_partkey", _S), ("l_suppkey", _S)],
    "customer": [("c_custkey", _S)],
    "part": [("p_partkey", _S)],
    "supplier": [("s_suppkey", _S)],
}


def build_replica(spark, factor: int) -> str:
    out = f"/tmp/scale_probe_{factor}x"
    if os.path.isdir(out):
        return out
    from risinglight_spark.tables import TABLES, load

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = load(spark, BASE, t)
        if t in SHIFTS:
            parts = []
            for k in range(factor):
                p = df
                for key, stride in SHIFTS[t]:
                    p = p.withColumn(key, F.col(key) + F.lit(k * stride))
                parts.append(p)
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.unionAll(p)
            rep.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        else:
            df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def main() -> None:
    factor = int(sys.argv[1])
    names = sys.argv[2:]
    from risinglight_spark.registry import collect
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name=f"scale_probe_{factor}x")
    entries = collect()
    sf_dir = build_replica(spark, factor)
    for name in names:
        fn = entries[name].fn
        fn(spark, BASE).collect()  # warm: codegen + workers
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            # Fresh plan per sample (ops may localCheckpoint internally —
            # reusing one DataFrame would time a cached materialization);
            # xxhash64 reduce forces every output row without a driver
            # transfer.
            df = fn(spark, sf_dir)
            df.agg(
                F.count("*"), F.sum(F.xxhash64(*df.columns))
            ).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"{name:36s} {factor}x {best:8.2f}s", flush=True)


if __name__ == "__main__":
    main()
