"""Structured Streaming operators over the events table.

The reference is batch-only (SURVEY §1.1: "no streaming engine at
all"), so there is no parity surface to match — this module adds the
streaming capabilities a Spark-native engine is expected to have:

- watermarked tumbling-window aggregation,
- streaming exact dedup (dropDuplicates with watermark),
- a custom stateful operator via applyInPandasWithState.

Each query runs the stream with ``Trigger.AvailableNow`` over the
parquet fixture and returns the materialized memory-sink table, which
makes the result deterministic and lets the DuckDB oracle verify it
like any batch query.  In production the same code reads a live
directory/Kafka source and runs continuously; watermarks bound state
for late data.

Scale notes: windowed aggregation state is (window x type) — bounded
and tiny; dedup state is bounded by the watermark horizon; the
stateful max keeps one row per user.  All three shuffle only on their
state keys.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risinglight_spark.operators import fpsum_sql
from risinglight_spark.registry import register
from risinglight_spark.tables import load, pin_semantics

_SINK_SEQ = [0]


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream (schema from the batch
    reader, including the ns->us conversion)."""
    pin_semantics(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # Spark-written corpus: events.parquet is a DIRECTORY of part
        # files — stream it directly (a pathGlobFilter of
        # 'events.parquet' matches no part file and yields a silent
        # 0-row stream)
        sdf = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # driver fixtures: events.parquet is a single FILE; readStream
        # wants a directory, so stream the parent filtered to the file
        sdf = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    # Fixtures have shipped ts both as TIMESTAMP(NANOS) (read as int64
    # nanos under legacy.parquet.nanosAsLong) and as TIMESTAMP(MICROS)
    # (read natively); convert only in the legacy-int64 case, mirroring
    # the batch loader in tables.load.
    ts_type = dict(sdf.dtypes).get("ts")
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (with local tz); session tz is
        # pinned UTC so this cast is value-preserving.
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def _run_to_table(stream_df: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    _SINK_SEQ[0] += 1
    name = f"rl_stream_sink_{_SINK_SEQ[0]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@register(
    "streaming_tumbling_counts",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n, {fpsum_sql("value")} AS sum_value
    FROM events
    GROUP BY win_start, event_type
    """,
    doc="Structured Streaming watermarked tumbling-window aggregation "
    "(1 h windows, 30 min watermark), run to completion with "
    "AvailableNow and verified against the batch oracle — the "
    "streaming/batch unification Spark promises.",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(
                    F.round(F.col("value").cast("double") * 1e8, 0).cast(
                        "long"
                    )
                ).cast("double")
                / F.lit(1e8)
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )
    return _run_to_table(agg, spark, "complete")


@register(
    "streaming_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming exact dedup: dropDuplicates on the key columns with "
    "a watermark bounding state.  The surviving key set is "
    "deterministic (which physical row arrives first is not, so only "
    "keys are emitted).",
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    dedup = (
        sdf.withWatermark("ts", "1 hour")
        .select("user_id", "event_type", "ts")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_table(dedup, spark, "append")


_STATE_SCHEMA = "n BIGINT, mx DOUBLE"
_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, max_value DOUBLE"


def _max_per_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, mx = state.get
    else:
        n, mx = 0, None
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        if len(vals):
            m = float(vals.max())
            mx = m if mx is None or m > mx else mx
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "max_value": [mx]}
    )


@register(
    "streaming_stateful_max",
    oracle="""
    SELECT user_id, count(*) AS n_events, max(value) AS max_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful streaming operator via applyInPandasWithState "
    "(GroupState keyed by user): running count + max per user.  With "
    "AvailableNow the final state equals the batch aggregate, which "
    "the oracle checks.  One row of state per user, shuffled once on "
    "the state key.",
)
def streaming_stateful_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    sdf = _events_stream(spark, sf_dir)
    out = (
        sdf.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _max_per_user,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_table(out, spark, "update")


def streaming_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch plan streaming_tumbling_counts must agree with (used
    by tests; not registered)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("win_start"), "event_type"
    ).agg(F.count("*").alias("n"))


STREAM_SESSION_GAP_MIN = 30


@register(
    "streaming_session_window",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, (CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL {STREAM_SESSION_GAP_MIN} MINUTE
                      THEN 1 ELSE 0 END) AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {STREAM_SESSION_GAP_MIN} MINUTE AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    doc=f"Streaming session windows (F.session_window, "
    f"{STREAM_SESSION_GAP_MIN}-minute gap): Spark merges per-user "
    f"events into dynamic inactivity-gap sessions as they arrive; "
    f"state is one open session per user, merged on overlap.  Oracle "
    f"replays it as batch gaps-and-islands (session_end = last event "
    f"+ gap, Spark's convention).  Production runs append mode with "
    f"the watermark finalizing sessions; AvailableNow + complete here "
    f"for a deterministic full answer.",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(
            F.session_window("ts", f"{STREAM_SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_table(agg, spark, "complete")


STREAM_JOIN_LOOKBACK_MIN = 10


@register(
    "streaming_interval_join",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           c.value AS click_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL {STREAM_JOIN_LOOKBACK_MIN} MINUTE
     AND c.ts <= p.ts
    """,
    doc=f"Stream-stream interval self-join: purchases matched to the "
    f"same user's clicks in the preceding {STREAM_JOIN_LOOKBACK_MIN} "
    f"minutes.  Both sides carry watermarks and the join condition "
    f"bounds event-time distance, so Spark derives state expiry — "
    f"click state older than watermark + lookback is dropped, keeping "
    f"join state finite on an infinite stream.  Emitted pair set "
    f"equals the batch inner join (oracle).",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    p = (
        sdf.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        sdf.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - INTERVAL {STREAM_JOIN_LOOKBACK_MIN} MINUTES"
            " AND c_ts <= p_ts"
        ),
        "inner",
    ).select("purchase_id", "click_id", "click_value")
    return _run_to_table(j, spark, "append")


@register(
    "streaming_sliding_counts",
    oracle=f"""
    WITH w AS (
      SELECT TIMESTAMP '1970-01-01'
               + ((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - k * 900)
                 * INTERVAL 1 SECOND AS win_start,
             event_type
      FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    )
    SELECT win_start, event_type, count(*) AS n
    FROM w GROUP BY win_start, event_type
    """,
    doc="Streaming sliding-window aggregation (1 h windows sliding "
    "every 15 min — each event lands in 4 overlapping windows).  "
    "State is (window x type), bounded by the watermark horizon; the "
    "oracle replays Spark's epoch-aligned window assignment by "
    "explicit offset expansion.",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    return _run_to_table(agg, spark, "complete")


@register(
    "streaming_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
    doc="Stream-static join: the event stream enriched with the "
    "static customer dimension.  Stateless — the static side is a "
    "broadcast hash map re-resolved per micro-batch (picks up dim "
    "updates), so no streaming state at all; at 100 TB/day the "
    "stream side never shuffles.  Result equals the batch join "
    "(oracle).",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.tables import load

    sdf = _events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = (
        sdf.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            "value",
        )
    )
    return _run_to_table(j, spark, "append")


class _RangeProcessor:
    """Per-user running (n, min, max) via the Spark 4 transformWithState
    API — typed ValueState survives across micro-batches; TTL/timers
    available but unused here."""


def _make_range_processor():
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("mn", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )

    class RangeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("range", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self.state.exists():
                n, mn, mx = self.state.get()
            else:
                n, mn, mx = 0, None, None
            for pdf in rows:
                vals = pdf["value"].dropna()
                if len(vals):
                    n += int(len(vals))
                    lo, hi = float(vals.min()), float(vals.max())
                    mn = lo if mn is None else min(mn, lo)
                    mx = hi if mx is None else max(mx, hi)
            self.state.update((n, mn, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "min_value": [mn],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return RangeProcessor()


def _has_protobuf() -> bool:
    # transformWithState's Python worker talks to the state server
    # over protobuf.  Where no real distribution exists, the vendored
    # mini runtime (risinglight_spark/_vendor/google/protobuf,
    # path-installed by risinglight_spark/__init__.py and exported to
    # workers via PYTHONPATH in session.get_spark) satisfies this, so
    # the real typed-state path runs in this container as well.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_VENDOR_SHIPPED: set[str] = set()


def _ensure_worker_protobuf(spark: SparkSession) -> None:
    """Ship the vendored protobuf to Python workers when the JVM was
    started WITHOUT the PYTHONPATH export (a vanilla driver-style
    session: the env route in session.get_spark never ran).  addPyFile
    distributes a zip of the vendor tree and prepends it to every
    worker's sys.path — including the streaming preinit runner."""
    import importlib.util

    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        spec = None
    import risinglight_spark

    vendor = os.path.join(
        os.path.dirname(risinglight_spark.__file__), "_vendor"
    )
    if spec is not None and not (spec.origin or "").startswith(vendor):
        return  # a real distribution is importable everywhere
    app = spark.sparkContext.applicationId
    if app in _VENDOR_SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(
        tempfile.gettempdir(), "rl_vendor_protobuf.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(vendor):
                for fn in files:
                    if fn.endswith(".py"):
                        p = os.path.join(root, fn)
                        z.write(p, os.path.relpath(p, vendor))
    spark.sparkContext.addPyFile(zpath)
    # The streaming preinit runner builds its worker env from the
    # context's environment map rather than the pyFiles path — export
    # the vendor dir there too (workers merge PYTHONPATH).
    env = spark.sparkContext.environment
    pp = env.get("PYTHONPATH", "")
    if vendor not in pp.split(os.pathsep):
        env["PYTHONPATH"] = f"{pp}{os.pathsep}{vendor}" if pp else vendor
    _VENDOR_SHIPPED.add(app)


@register(
    "streaming_transform_with_state",
    oracle="""
    SELECT user_id, count(value) AS n_events,
           min(value) AS min_value, max(value) AS max_value
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
    """,
    doc="Arbitrary stateful streaming via transformWithStateInPandas "
    "(the Spark 4 successor to applyInPandasWithState): per-user "
    "running (count, min, max) held in a typed ValueState.  With "
    "AvailableNow the final state equals the batch aggregate "
    "(oracle).  One ValueState row per user on the state-key "
    "shuffle; the API adds typed composite state, timers, and TTL "
    "for production unbounded streams.  Environment gate: the typed-"
    "state Python worker talks to the state server over protobuf; "
    "where no google.protobuf distribution exists, the session "
    "factory exports the vendored wire-format-complete mini runtime "
    "(risinglight_spark/_vendor/google/protobuf) to the workers, so "
    "the REAL transformWithStateInPandas path runs in this container "
    "too.  The applyInPandasWithState twin below remains as the "
    "fallback for environments where neither is possible.",
)
def streaming_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = (
        _events_stream(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("user_id", "value")
        .groupBy("user_id")
    )
    if _has_protobuf():
        _ensure_worker_protobuf(spark)
        # transformWithState requires the RocksDB state store (typed
        # state with schema evolution lives outside the HDFS default)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        out = sdf.transformWithStateInPandas(
            statefulProcessor=_make_range_processor(),
            outputStructType=(
                "user_id BIGINT, n_events BIGINT, "
                "min_value DOUBLE, max_value DOUBLE"
            ),
            outputMode="Update",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import GroupStateTimeout

        out = sdf.applyInPandasWithState(
            _range_state_fallback,
            outputStructType=(
                "user_id BIGINT, n_events BIGINT, "
                "min_value DOUBLE, max_value DOUBLE"
            ),
            stateStructType="n BIGINT, mn DOUBLE, mx DOUBLE",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return _run_to_table(out, spark, "update")


def _range_state_fallback(key, pdfs, state):
    """applyInPandasWithState twin of _make_range_processor: running
    (count, min, max) of value per user — the identical fold the typed
    ValueState processor runs, expressed in the older state API."""
    n, mn, mx = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        if len(vals):
            n += int(len(vals))
            lo, hi = float(vals.min()), float(vals.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
    state.update((n, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "min_value": [mn],
            "max_value": [mx],
        }
    )


@register(
    "streaming_foreachbatch_upsert",
    oracle="""
    WITH last AS (
      SELECT user_id, coalesce(value, 0.0) AS last_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), agg AS (
      SELECT user_id, count(*) AS n_events, max(ts) AS last_ts
      FROM events GROUP BY user_id
    )
    SELECT a.user_id, a.n_events, l.last_value, a.last_ts
    FROM agg a JOIN last l ON a.user_id = l.user_id AND l.rn = 1
    """,
    doc="foreachBatch CDC-style upsert sink — the incremental "
    "materialized-view pattern: each micro-batch pre-aggregates per "
    "key, then MERGEs into the keyed state table (counts add, "
    "latest-by-(ts,event_id) wins), written copy-on-write and swapped "
    "atomically per batch.  The merge is associative and commutative "
    "across batches, so the final state equals the batch groupBy "
    "(the oracle) for ANY batch slicing.  At scale: state is "
    "one row per key, partitioned by key on storage; each batch "
    "shuffles only its own pre-aggregated keys, and the join against "
    "state is key-partitioned (never a full rewrite of untouched "
    "partitions with a real MERGE-capable table format).",
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    sdf = _events_stream(spark, sf_dir).withColumn(
        "value", F.coalesce(F.col("value"), F.lit(0.0))
    )
    root = tempfile.mkdtemp(prefix="rl_upsert_")
    state: dict[str, Any] = {"path": None, "n": 0}

    def merge(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        b = batch.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.max_by(
                F.struct("value", "ts", "event_id"), F.struct("ts", "event_id")
            ).alias("last"),
        )
        if state["path"] is not None:
            prior = sess.read.parquet(state["path"])
            b = (
                prior.unionByName(b)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.max_by(
                        F.col("last"), F.struct("last.ts", "last.event_id")
                    ).alias("last"),
                )
            )
        state["n"] += 1
        nxt = os.path.join(root, f"state_{state['n']}")
        b.write.mode("overwrite").parquet(nxt)
        state["path"] = nxt

    q = (
        sdf.writeStream.foreachBatch(merge)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(state["path"])
        .select(
            "user_id",
            "n_events",
            F.col("last.value").alias("last_value"),
            F.col("last.ts").alias("last_ts"),
        )
    )


@register(
    "streaming_chained_agg",
    oracle="""
    WITH q AS (
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS q_start,
             event_type, count(*) AS n15
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL 1 HOUR, q_start) AS hour_start, event_type,
           CAST(sum(n15) AS BIGINT) AS n, count(*) AS n_quarters
    FROM q
    -- append-mode semantics: only windows CLOSED by the final
    -- watermark (max event time - 30 min delay) are emitted; the tail
    -- hour stays in state awaiting more data.
    WHERE time_bucket(INTERVAL 1 HOUR, q_start) + INTERVAL 1 HOUR
          <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
    GROUP BY 1, 2
    """,
    doc="Chained stateful streaming aggregations (Spark 4: multiple "
    "stateful operators in one query): 15-minute tumbling counts "
    "roll up into hourly totals inside the SAME streaming query by "
    "windowing on the window column itself — the pre-aggregation "
    "cascade that cuts state and shuffle volume for high-cardinality "
    "rollups (second stage sees 4 rows/hour/type, not raw events).  "
    "Watermark propagates through the first aggregation.",
)
def streaming_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    s1 = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w1"), "event_type")
        .agg(F.count("*").alias("n15"))
    )
    s2 = (
        s1.groupBy(F.window(F.col("w1"), "1 hour").alias("w2"), "event_type")
        .agg(F.sum("n15").alias("n"), F.count("*").alias("n_quarters"))
        .select(
            F.col("w2.start").alias("hour_start"),
            "event_type",
            "n",
            "n_quarters",
        )
    )
    return _run_to_table(s2, spark, "append")


@register(
    "streaming_custom_source",
    oracle=f"""
    SELECT r AS id, r * 0.5 AS value,
           CAST(sum(r) OVER () AS BIGINT) AS id_sum
    FROM range(0, 1000) t(r)
    """,
    doc="Custom streaming source via the Spark 4 Python DataSource "
    "API (sources/ticker.py): offsets are row indexes, micro-batches "
    "are exact offset ranges, and readBetweenOffsets replays any "
    "committed batch — the recoverability contract of a real "
    "connector.  The stream runs micro-batches until the source "
    "drains (4 batches of <=300 rows), then the materialized sink "
    "must equal the closed-form range (the oracle).",
)
def streaming_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time as _time

    from risinglight_spark.sources.ticker import (
        TICKER_TOTAL,
        TickerDataSource,
    )

    pin_semantics(spark)
    try:
        spark.dataSource.register(TickerDataSource)
    except Exception:
        pass  # already registered in this session
    _SINK_SEQ[0] += 1
    name = f"rl_ticker_sink_{_SINK_SEQ[0]}"
    q = (
        spark.readStream.format("rl_ticker")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if spark.table(name).count() >= TICKER_TOTAL:
            break
        _time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    out = spark.table(name)
    from pyspark.sql import Window

    return out.select(
        "id", "value", F.sum("id").over(Window.partitionBy()).alias("id_sum")
    )


@register(
    "streaming_custom_sink",
    oracle="""
    SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    """,
    doc="Custom streaming SINK via the Python DataSource API "
    "(sources/ticker.py FileSinkDataSource): per-user event counts "
    "stream into a transactional file sink — tasks stage files, "
    "commit() publishes an atomic per-batch manifest (rename), "
    "abort() discards staged output, so readers only see fully "
    "committed batches.  The round trip (read manifests -> read "
    "staged files) must equal the batch aggregate.  Completes the "
    "connector quadrant: batch read (.tbl source), batch write "
    "(COPY), streaming read (rl_ticker), streaming write (here).",
)
def streaming_custom_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import tempfile

    from risinglight_spark.sources.ticker import FileSinkDataSource

    pin_semantics(spark)
    try:
        spark.dataSource.register(FileSinkDataSource)
    except Exception:
        pass
    out_dir = tempfile.mkdtemp(prefix="rl_filesink_")
    sdf = _events_stream(spark, sf_dir)
    agg = sdf.groupBy("user_id").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.format("rl_filesink")
        .option("path", out_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="rl_ckpt_"))
        .start()
    )
    q.awaitTermination()
    # read back through the committed manifests only
    import glob
    import os

    manifests = sorted(glob.glob(os.path.join(out_dir, "manifest-*.json")))
    files = []
    for m in manifests[-1:]:  # complete mode: last batch is the full state
        with open(m) as f:
            files += [e["path"] for e in json.load(f)]
    rows = []
    for p in files:
        with open(p) as f:
            rows += [
                (int(a), int(b))
                for a, b in (ln.split(",") for ln in f.read().splitlines())
            ]
    return spark.createDataFrame(rows, "user_id BIGINT, n BIGINT")


@register(
    "streaming_interval_join_outer",
    oracle=f"""
    WITH horizon AS (SELECT max(ts) - INTERVAL 3 HOUR AS h FROM events)
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           c.value AS click_value
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL {STREAM_JOIN_LOOKBACK_MIN} MINUTE
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
      AND p.ts <= (SELECT h FROM horizon)
    """,
    doc="Stream-stream LEFT OUTER interval join: every purchase emits — "
    "matched to preceding clicks, or with NULLs once the watermark "
    "proves no match can arrive (the harder outer-join protocol: "
    "Spark holds left rows in state until eviction).  Unmatched "
    "emission lags the watermark by an engine-internal eviction "
    "bound, so the query analyzes the CLOSED horizon (purchases "
    "older than max event time - 3h, comfortably past watermark "
    "delay + join range): every retained left row is guaranteed "
    "evicted and emitted, making the append output equal the plain "
    "batch left join — no emission modeling in the oracle.  The "
    "watermark still advances on the full stream (filter applied "
    "above the watermark node).",
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 3 HOURS")).alias("h")
    ).collect()[0].h
    sdf = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    p = (
        sdf.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") <= F.lit(horizon))
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = sdf.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    )
    j = p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - INTERVAL {STREAM_JOIN_LOOKBACK_MIN} MINUTES"
            " AND c_ts <= p_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id", "click_value")
    return _run_to_table(j, spark, "append")


@register(
    "streaming_rocksdb_state",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="Windowed aggregation on the RocksDB state store provider — "
    "the production state backend at scale: state lives off-heap / "
    "on-disk per executor instead of the default HDFS-backed in-memory "
    "map (which OOMs once keyed state exceeds executor heap, the "
    "failure mode for billions of keys at 100 TB).  Changelog "
    "checkpointing keeps commits incremental.  Results must be "
    "backend-invariant — same oracle as any batch rollup.",
)
def streaming_rocksdb_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        sdf = _events_stream(spark, sf_dir)
        agg = (
            sdf.withWatermark("ts", "1 hour")
            .groupBy(
                F.window("ts", "1 day").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("day"), "event_type", "n"
            )
        )
        return _run_to_table(agg, spark, "complete")
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)


@register(
    "streaming_dropdup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming dedup with bounded state via "
    "dropDuplicatesWithinWatermark: unlike plain dropDuplicates "
    "(state grows with the key universe forever), state for a key is "
    "evicted once the watermark passes its event time — the only "
    "streaming-dedup API whose state is O(keys per horizon), i.e. the "
    "one that survives an unbounded 100 TB ingest.  Duplicates "
    "arriving within the delay of each other are guaranteed dropped; "
    "re-emission after the horizon is the accepted trade.  The "
    "fixture's delay (60 days) exceeds the data's 30-day span, so the "
    "run is exactly DISTINCT and the oracle can hash-verify it.",
)
def streaming_dropdup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sdf = _events_stream(spark, sf_dir)
    dedup = (
        sdf.withWatermark("ts", "60 days")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_table(dedup, spark, "append")
