"""Median-of-3 recheck of the two BENCH_r11 drift outliers (VERDICT r11
item 1): ann_nsw_graph_search (1.75x vs r10; its plan DID change in
round 11 — NSW_MAX_GROUP split + shuffle_merge) and text_dsir_importance
(1.83x; code untouched since r10, presumptively noise).

Controls: tpch_q14 / tpch_q15 (1.64x / 1.61x in the same driver run with
ZERO code change — the environmental-drift fingerprint) and tpch_q6 (the
cheapest scan query).  Calibration probe runs BEFORE and AFTER the timed
section (the r12 bench.py hardening, applied here first) so mid-run box
drift is visible instead of inferred.

Usage: python tools/outlier_recheck_probe.py [sf_dir]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = (
    "ann_nsw_graph_search",
    "text_dsir_importance",
    "tpch_q14",
    "tpch_q15",
    "tpch_q6",
)

# BENCH_r10 driver medians (the comparison base the verdict names).
R10 = {
    "ann_nsw_graph_search": 1.154,
    "text_dsir_importance": 0.749,
    "tpch_q14": 0.355,
    "tpch_q15": 0.422,
    "tpch_q6": 0.165,
}
R10_CALIB = 0.308
R11 = {
    "ann_nsw_graph_search": 2.024,
    "text_dsir_importance": 1.374,
    "tpch_q14": 0.583,
    "tpch_q15": 0.678,
    "tpch_q6": 0.218,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from risinglight_spark.registry import collect
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name="outlier_recheck", shuffle_partitions=16)
    entries = collect()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(2_000_000_000).select(
            F.xxhash64("id").alias("h")
        ).agg(F.sum("h")).collect()
        return time.perf_counter() - t0

    calib()  # compile
    calib_before = round(statistics.median(calib() for _ in range(3)), 3)

    # Warm every target at sf0.001 (codegen/UDF-worker compile), then
    # warm the timed SF footers — identical to bench.py methodology.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in TARGETS:
        entries[name].fn(spark, warm_dir).collect()
    from risinglight_spark.tables import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()
    entries["tpch_q6"].fn(spark, sf_dir).collect()

    timed: dict[str, float] = {}
    for name in TARGETS:
        obs = []
        for _ in range(3):
            t0 = time.perf_counter()
            entries[name].fn(spark, sf_dir).collect()
            obs.append(time.perf_counter() - t0)
        timed[name] = round(statistics.median(obs), 3)
        print(f"# {name}: {timed[name]:.3f}s (obs {[round(o,3) for o in obs]})",
              file=sys.stderr)

    calib_after = round(statistics.median(calib() for _ in range(3)), 3)
    c = statistics.median([calib_before, calib_after])
    scale = R10_CALIB / c  # <1 means this box is SLOWER than the r10 box

    rows = {}
    for name in TARGETS:
        cal = round(timed[name] * scale, 3)
        rows[name] = {
            "r10": R10[name],
            "r11_driver": R11[name],
            "now_raw": timed[name],
            "now_calibrated_to_r10_box": cal,
            "ratio_vs_r10": round(cal / R10[name], 3),
        }
    out = {
        "probe": "outlier_recheck",
        "sf_dir": sf_dir,
        "calib_before": calib_before,
        "calib_after": calib_after,
        "calib_r10_ref": R10_CALIB,
        "rows": rows,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
