"""Stage-level spill attribution for dedup_semdedup on the bounded-heap
probe corpus (VERDICT r11 item 4 prep): which stage produces the
super-linear disk spill (916 MB -> 4.6 GB -> 20 GB at 1x/2x/4x) that
made the 8x run outgrow the sandbox's scratch volume?

    PYTHONPATH=/root/repo python tools/semdedup_stage_audit.py [n_docs n_vecs]

Requires the probe corpus at /tmp/pipeline_probe_<n_docs>_<n_vecs>
(built by tools/pipeline_scale_probe.py) or builds it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_800_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 480_000
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from pyspark.sql import SparkSession

    from risinglight_spark.tables import pin_semantics

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("semdedup_stage_audit")
        .config("spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"])
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/tmp/spark_pipeline_scratch")
        .getOrCreate()
    )
    pin_semantics(spark)
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId

    from tools.pipeline_scale_probe import build_corpus

    out = f"/tmp/pipeline_probe_{n_docs}_{n_vecs}"
    build_corpus(spark, n_docs, n_vecs, out)

    from risinglight_spark.registry import collect

    entries = collect()
    t0 = time.time()
    n = entries["dedup_semdedup"].fn(spark, out).count()
    wall = time.time() - t0
    print(f"# dedup_semdedup: {n:,} rows in {wall:.1f}s", file=sys.stderr)

    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    rows = []
    for s in stages:
        spill = s.get("diskBytesSpilled", 0)
        rows.append(
            (
                spill,
                s.get("memoryBytesSpilled", 0),
                s.get("shuffleWriteBytes", 0),
                s.get("shuffleReadBytes", 0),
                s.get("inputBytes", 0),
                s.get("outputBytes", 0),
                s.get("stageId"),
                s.get("numTasks"),
                (s.get("description") or s.get("name", ""))[:110],
            )
        )
    rows.sort(reverse=True)
    print(
        f"{'diskSpill':>12} {'memSpill':>12} {'shufW':>10} {'shufR':>10}"
        f" {'input':>10} {'stage':>6} {'tasks':>6} name"
    )
    gb = 1 / (1024**3)
    for r in rows[:18]:
        print(
            f"{r[0]*gb:>11.2f}G {r[1]*gb:>11.2f}G {r[2]*gb:>9.2f}G"
            f" {r[3]*gb:>9.2f}G {r[4]*gb:>9.2f}G {r[6]:>6} {r[7]:>6} {r[8]}"
        )
    tot_spill = sum(r[0] for r in rows)
    print(f"# total disk spill: {tot_spill*gb:.2f} GB")


if __name__ == "__main__":
    main()
