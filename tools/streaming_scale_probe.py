"""Streaming state-size probe at replica scale.

    PYTHONPATH=/root/repo python tools/streaming_scale_probe.py [factor] [name ...]

The batch replica probe (tools/scale_probe.py) skips the streaming
entries; this closes that gap.  For stateful streaming the scale axis
is STATE SIZE, not wall time: an operator whose state grows with the
stream's lifetime dies on an unbounded ingest no matter how fast a
micro-batch runs.  The probe runs each entry over the events replica
(Spark-written directory — `_events_stream` streams part files
directly) and records, from the final StreamingQueryProgress, every
state operator's numRowsTotal and memoryUsedBytes alongside wall time
and output rows.

Expected shapes (the module docstrings' claims, now measured):
- session/sliding/tumbling/chained agg: state ~ windows x keys,
  bounded by the watermark horizon — grows with KEY cardinality,
  never with total rows ingested;
- interval join: state ~ events inside watermark + lookback;
- dropDuplicatesWithinWatermark: state ~ distinct keys per horizon
  (the fixture's 60-day delay exceeds the 30-day span, so here it is
  the distinct-key count — the documented worst case).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = (
    "streaming_session_window",
    "streaming_chained_agg",
    "streaming_interval_join",
    "streaming_dropdup_within_watermark",
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or list(DEFAULT_QUERIES)

    from risinglight_spark import registry
    from risinglight_spark.session import get_spark
    from risinglight_spark.streaming import ops as sops

    spark = get_spark(app_name=f"streaming_scale_probe_{factor}x")

    from scale_probe import BASE

    # scale_probe's replica shifts only event_id, so replicas share
    # user_ids/timestamps: key cardinality — the axis streaming STATE
    # actually grows along — stays flat, and the stream-stream join
    # cross-matches replicas (quadratic by construction).  Shift
    # user_id with the same stride so replica k is an independent
    # user population: honest linear growth in keys AND rows.
    rep_dir = f"/tmp/streaming_probe_{factor}x"
    if not os.path.isdir(rep_dir):
        from pyspark.sql import functions as F

        from risinglight_spark.tables import load

        os.makedirs(rep_dir, exist_ok=True)
        df = load(spark, BASE, "events")
        parts = [
            df.withColumn("event_id", F.col("event_id") + F.lit(k * 10**9))
            .withColumn("user_id", F.col("user_id") + F.lit(k * 10**7))
            for k in range(factor)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionAll(p)
        rep.write.mode("overwrite").parquet(f"{rep_dir}/events.parquet")

    # Capture the final progress of every query _run_to_table starts.
    captured: list[dict] = []
    orig = sops._run_to_table

    def capturing(stream_df, spark, mode):
        sops._SINK_SEQ[0] += 1
        name = f"rl_stream_sink_{sops._SINK_SEQ[0]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        captured.append(q.lastProgress or {})
        return stream_df.sparkSession.table(name)

    sops._run_to_table = capturing
    try:
        entries = registry.collect()
        hdr = (
            f"{'entry':38s} {'dir':>5} {'wall_s':>7} {'out_rows':>9} "
            f"{'state_rows':>10} {'state_mem':>10}"
        )
        print(hdr)
        for name in names:
            entries[name].fn(spark, BASE).count()  # warm codegen/workers
            for tag, d in (("1x", BASE), (f"{factor}x", rep_dir)):
                captured.clear()
                t0 = time.perf_counter()
                out_rows = entries[name].fn(spark, d).count()
                dt = time.perf_counter() - t0
                rows = mem = 0
                for prog in captured:
                    for so in prog.get("stateOperators") or []:
                        rows += so.get("numRowsTotal", 0)
                        mem += so.get("memoryUsedBytes", 0)
                print(
                    f"{name:38s} {tag:>5} {dt:>7.2f} {out_rows:>9} "
                    f"{rows:>10} {mem:>10}",
                    flush=True,
                )
    finally:
        sops._run_to_table = orig


if __name__ == "__main__":
    main()
