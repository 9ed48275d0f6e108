"""Watermark late-data semantics across micro-batches.

The oracle-checked streaming queries (streaming/ops.py) verify
end-state equivalence with batch SQL; what they cannot show is the
*late-data* behavior — a row arriving after the watermark has passed
its window must be dropped, not aggregated.  This test stages three
parquet files processed as separate micro-batches
(maxFilesPerTrigger=1, mtime-ordered) and asserts the late row's
window never reaches the sink and shows up in the
numRowsDroppedByWatermark metric.
"""

from __future__ import annotations

import datetime
import os
import tempfile
import time

from pyspark.sql import functions as F


def _write_batch(spark, path: str, times: list[str], mtime: float) -> None:
    rows = [(datetime.datetime.fromisoformat(t), 1) for t in times]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, v INT")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_watermark_drops_late_rows(spark):
    src = tempfile.mkdtemp(prefix="rl_wm_src_")
    now = time.time()
    # batch 1: two rows in [10:00, 11:00), one in [11:00, 12:00)
    # -> watermark after the batch: 11:05 - 30 min = 10:35
    _write_batch(
        spark,
        os.path.join(src, "b1"),
        ["2024-01-01 10:05:00", "2024-01-01 10:10:00", "2024-01-01 11:05:00"],
        now - 1000,
    )
    # batch 2: advances the watermark to 12:10 — every window up to
    # 12:00 is now finalized and emitted
    _write_batch(
        spark, os.path.join(src, "b2"), ["2024-01-01 12:40:00"], now - 500
    )
    # batch 3: a LATE row at 09:30, hours behind the 12:10 watermark —
    # must be dropped, never re-opening the already-emitted window
    _write_batch(
        spark,
        os.path.join(src, "b3"),
        ["2024-01-01 09:30:00", "2024-01-01 13:30:00"],
        now - 50,
    )

    stream = (
        spark.readStream.schema("ts TIMESTAMP, v INT")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rl_wm_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    out = {
        r.win_start.strftime("%H:%M"): r.n
        for r in spark.table("rl_wm_sink").collect()
    }
    # closed windows emitted with on-time rows only
    assert out.get("10:00") == 2
    assert out.get("11:00") == 1
    assert out.get("12:00") == 1
    # the late 09:30 row was dropped: metric counts it, and its window
    # never appears in the sink
    assert dropped == 1
    assert "09:00" not in out
