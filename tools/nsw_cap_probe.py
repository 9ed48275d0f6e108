"""Hot-group probe for nsw_edges' NSW_MAX_GROUP cap.

    PYTHONPATH=/root/repo python tools/nsw_cap_probe.py [m ...]

tools/scale_probe.py replicates embeddings VERBATIM, so replicas
collapse onto one representative per class and the rep-pair join never
grows — structurally blind to the quadratic axis the cap bounds
(DISTINCT vectors per (cell, bkt) group), exactly the blind spot
semdedup_cap_probe.py closes for SEM_MAX_CELL.  This probe feeds
nsw_edges (a pure function of its nodes frame) ONE group of m distinct
DIM-dim vectors — the worst case the static NSW_GRAPH_PLANES bound was
previously trusted to prevent — and times the graph build with the
production cap (NSW_MAX_GROUP=1024) vs uncapped (2**62).

Uncapped pair count is m^2; capped is ~m * NSW_MAX_GROUP (linear in m
once m > cap).  Expect capped wall to grow ~linearly with m while
uncapped grows ~quadratically.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_nodes(spark, m: int):
    from risinglight_spark.operators.vector_search import DIM

    rng = random.Random(m)
    rows = [
        (
            vid,
            [round(rng.uniform(-1.0, 1.0), 4) for _ in range(DIM)],
            0,
            0,
        )
        for vid in range(m)
    ]
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT, bkt INT"
    ).repartition(32)


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [1000, 4000, 16000]
    from risinglight_spark.operators import vector_search as vs
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name="nsw_cap_probe")
    # warm codegen/worker paths once at a small size
    vs.nsw_edges(_mk_nodes(spark, 200)).count()
    print(f"{'m':>7} {'mode':>9} {'build_s':>9} {'edges':>9}")
    for m in ms:
        nodes = _mk_nodes(spark, m)
        nodes.persist().count()  # input off the timer
        for mode, cap in (("capped", 1024), ("uncapped", 2**62)):
            vs.NSW_MAX_GROUP = cap
            try:
                t0 = time.perf_counter()
                n_edges = vs.nsw_edges(nodes).count()
                dt = time.perf_counter() - t0
            finally:
                vs.NSW_MAX_GROUP = 1024
            print(f"{m:>7} {mode:>9} {dt:>9.2f} {n_edges:>9}", flush=True)
        nodes.unpersist()


if __name__ == "__main__":
    main()
