"""Shuffle-volume audit: measures actual shuffle read/write bytes and
spilled bytes per headline query at a given scale factor.

    PYTHONPATH=/root/repo python tools/shuffle_audit.py [sf_dir] [name...]

"Minimize shuffles" is this repo's first scale rule (SCALE.md); this
tool turns it from a plan-shape claim into a measured number.  Each
query runs in its own job group with the Spark UI's REST API enabled;
completed stages are attributed to the query through the job-group ->
job -> stage mapping and their shuffle metrics summed.  Results print
as a markdown table (pasted into SCALE.md per round).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4057

# The shuffle-interesting headline set: joins, aggs, dedup, pipelines.
DEFAULT_QUERIES = (
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18", "tpch_q21",
    "dedup_exact", "dedup_minhash_lsh", "text_line_dedup_c4",
    "pipeline_clean_corpus", "pipeline_pretraining_e2e",
    "events_sessionization", "events_asof_join", "pack_sequences",
    "agg_incremental_merge", "ml_logreg_train_step",
    "events_variant_json", "ann_cosine_topk", "pairs_contrastive_mining",
)


def _rest(app_path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(DEFAULT_QUERIES)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from risinglight_spark.registry import collect
    from risinglight_spark.tables import pin_semantics

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
        )
        .appName("shuffle_audit")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    pin_semantics(spark)
    sc = spark.sparkContext
    entries = collect()
    app_id = sc.applicationId

    # warm-up at the smallest SF so codegen/JIT doesn't pollute stage
    # metrics attribution (it can't — job groups isolate — but warm
    # timings make the wall column meaningful too)
    for n in names:
        entries[n].fn(spark, "/root/testdata/sf0.001").count()

    rows = []
    for n in names:
        sc.setJobGroup(n, n)
        t0 = time.time()
        entries[n].fn(spark, sf_dir).count()
        wall = time.time() - t0
        sc.setJobGroup("", "")
        # map this query's job group -> job ids -> stage ids
        jobs = _rest(f"applications/{app_id}/jobs")
        stage_ids = {
            s
            for j in jobs
            if j.get("jobGroup") == n
            for s in j.get("stageIds", [])
        }
        sread = swrite = spill = 0
        for st in _rest(f"applications/{app_id}/stages?status=COMPLETE"):
            if st["stageId"] in stage_ids:
                sread += st.get("shuffleReadBytes", 0)
                swrite += st.get("shuffleWriteBytes", 0)
                spill += st.get("diskBytesSpilled", 0)
        rows.append((n, wall, swrite, sread, spill))

    print(f"\n| query | wall s | shuffle write | shuffle read | spilled |")
    print("|---|---|---|---|---|")

    def fmt(b: int) -> str:
        if b >= 1 << 20:
            return f"{b / (1 << 20):.1f} MB"
        if b >= 1 << 10:
            return f"{b / (1 << 10):.1f} KB"
        return f"{b} B" if b else "0"

    for n, wall, sw, sr, sp in rows:
        print(f"| {n} | {wall:.2f} | {fmt(sw)} | {fmt(sr)} | {fmt(sp)} |")


if __name__ == "__main__":
    main()
