"""Time-series / event-log operators over ``events``
(event_id, ts, user_id, event_type, value, props-json).

The reference is a batch OLAP engine with no time-series surface
(SURVEY §1.1) — these queries cover what a log/metrics pipeline needs
on top of it: windowed aggregation (tumbling + sliding), gap
sessionization, as-of joins, JSON property extraction, and funnel
analysis.

Scale notes (100 TB):
- Window bucketing is a pure projection (date_trunc) followed by a
  partial-aggregated groupBy — the shuffle carries only
  (bucket, type) aggregates, not events.
- Sessionization and the as-of join are one sort per user partition
  (window functions over user_id) — Spark externalizes the sort and
  AQE coalesces partitions; no per-row subqueries, no driver loops.
- The funnel join is banded by user and bounded by the time window,
  so the join fan-out is per-user-bounded, not cross-corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from risinglight_spark.operators import Tables, fpsum, fpsum_sql
from risinglight_spark.registry import register

SESSION_GAP_MIN = 30


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n, {fpsum_sql("value")} AS sum_value
    FROM events
    GROUP BY win_start, event_type
    """,
    doc="Tumbling 1-hour window aggregation per event type — the "
    "Structured-Streaming-window shape run as a batch groupBy.",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("win_start"), "event_type"
        )
        .agg(F.count("*").alias("n"), fpsum(F.col("value")).alias("sum_value"))
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH w AS (
      SELECT unnest([
               date_trunc('hour', ts)
                 + (CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                         ELSE INTERVAL 0 MINUTE END),
               date_trunc('hour', ts)
                 + (CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                         ELSE INTERVAL 0 MINUTE END) - INTERVAL 30 MINUTE
             ]) AS win_start,
             value
      FROM events
    )
    SELECT win_start, count(*) AS n, {fpsum_sql("value")} AS sum_value
    FROM w GROUP BY win_start
    """,
    doc="Sliding window (1 h length, 30 min slide) via F.window — each "
    "event lands in 2 buckets; the oracle replays the window-start "
    "assignment rule explicitly.",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), )
        .agg(F.count("*").alias("n"), fpsum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


@register(
    "events_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, (CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE
                      THEN 1 ELSE 0 END) AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
    doc=f"Gap sessionization ({SESSION_GAP_MIN}-minute inactivity): "
    "lag + cumulative-sum session ids, then per-session rollup.  One "
    "sort per user partition — no per-row subqueries.",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = SESSION_GAP_MIN * 60
    marked = t.events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # timestamp difference as an interval comparison: legal for
                # both TIMESTAMP and TIMESTAMP_NTZ (cast-to-double is not)
                F.col("ts") - F.lag("ts").over(w)
                > F.expr(f"INTERVAL {gap_sec} SECOND")
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_asof_join",
    oracle="""
    WITH unioned AS (
      SELECT user_id, ts, event_id, 0 AS kind, value FROM events
      WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind, NULL AS value FROM events
      WHERE event_type = 'click'
    ),
    filled AS (
      SELECT user_id, ts, event_id, kind,
             last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view_value,
             last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view_ts
      FROM unioned
    )
    SELECT user_id, event_id AS click_id, ts AS click_ts,
           last_view_ts, last_view_value
    FROM filled WHERE kind = 1
    """,
    doc="As-of join (clicks to most recent view at-or-before, per "
    "user) — an operator Spark lacks natively, expressed as "
    "union + last_value(ignorenulls) over one ordered pass.  Total "
    "order (ts, kind, event_id) pins tie-breaks deterministically; "
    "one window sort replaces a per-row range subquery.",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    views = t.events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind"), "value"
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = views.unionByName(clicks).select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(F.when(F.col("kind") == 0, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("last_view_value"),
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_view_ts"),
    )
    return filled.filter(F.col("kind") == 1).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "last_view_ts",
        "last_view_value",
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_id, event_type,
           json_extract(props, '$.k')::INT AS k
    FROM events WHERE event_id < 500
    """,
    doc="JSON property extraction from the props column "
    "(get_json_object — JVM-side, no Python).",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("event_id") < 500).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "events_user_daily",
    oracle=f"""
    SELECT user_id, date_trunc('day', ts)::DATE AS day,
           count(*) AS n,
           count(DISTINCT event_type) AS n_types,
           {fpsum_sql("value")} AS sum_value
    FROM events
    GROUP BY user_id, day
    """,
    doc="Per-user daily rollup: counts, distinct types, value mass — "
    "partial aggregation does the heavy lifting map-side.",
)
def events_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("event_type").alias("n_types"),
        fpsum(F.col("value")).alias("sum_value"),
    )


@register(
    "events_funnel",
    oracle="""
    SELECT count(DISTINCT v.user_id) AS converted_users
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc="Funnel: users who clicked within 1 h of a view.  The join is "
    "user-keyed and time-bounded, so fan-out stays per-user-bounded.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v = t.events.filter(F.col("event_type") == "view").alias("v")
    c = t.events.filter(F.col("event_type") == "click").alias("c")
    return (
        v.join(
            c,
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") > F.col("v.ts"))
            & (
                F.col("c.ts")
                <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .agg(F.countDistinct("v.user_id").alias("converted_users"))
    )


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY event_type
    ),
    hours AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    counts AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
      FROM events GROUP BY event_type, hour
    )
    SELECT h.event_type, h.hour, coalesce(c.n, 0) AS n
    FROM hours h LEFT JOIN counts c
      ON h.event_type = c.event_type AND h.hour = c.hour
    """,
    doc="Dense hourly series with zero-filled gaps per event type "
    "(sequence + explode + left join) — the gap-fill shape behind "
    "monitoring rollups; the generated spine is bounded by "
    "(types x hours), not event volume.",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bounds = t.events.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    counts = t.events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    return (
        hours.alias("h")
        .join(
            counts.alias("c"),
            (F.col("h.event_type") == F.col("c.event_type"))
            & (F.col("h.hour") == F.col("c.hour")),
            "left",
        )
        .select(
            F.col("h.event_type").alias("event_type"),
            F.col("h.hour").alias("hour"),
            F.coalesce(F.col("c.n"), F.lit(0)).alias("n"),
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firstseen AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT cohort_week, active_week, count(*) AS active_users
    FROM activity JOIN firstseen USING (user_id)
    GROUP BY cohort_week, active_week
    """,
    doc="Weekly retention cohorts: users grouped by first-seen week, "
    "counted in each week they return — the standard growth-analytics "
    "rollup.  Two aggregations keyed on user_id share one shuffle "
    "partitioning; the cohort join is user-keyed (no broadcast of the "
    "user dimension needed at scale, it is co-partitioned).",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    firstseen = t.events.groupBy("user_id").agg(
        F.min(wk).alias("cohort_week")
    )
    activity = t.events.select(
        "user_id", wk.alias("active_week")
    ).distinct()
    return (
        activity.join(firstseen, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").alias("active_users"))
    )


@register(
    "events_windowed_topk",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, user_id, count(*) AS n
      FROM events GROUP BY hr, user_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY hr
                                   ORDER BY n DESC, user_id) AS rk
      FROM hourly
    )
    SELECT hr, user_id, n, rk FROM ranked WHERE rk <= 3
    """,
    doc="Top-3 most active users per hour: pre-aggregate to (hour, "
    "user) counts FIRST (map-side partials collapse the event stream), "
    "then a rank window over the small per-hour aggregate — the "
    "windowed-leaderboard pattern; the rank never sees raw events.",
)
def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "user_id"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("hr").orderBy(F.desc("n"), "user_id")
    return (
        hourly.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT user_id,
             {fpsum_sql("value")} / count(value) AS mu,
             {fpsum_sql("value * value", 1000000)} / count(value) AS m2,
             count(value) AS n
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           (e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu) AS z
    FROM events e JOIN stats s USING (user_id)
    WHERE s.n >= 10 AND s.m2 - s.mu * s.mu > 1e-12
      AND abs((e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu)) > 2.0
    """,
    doc="Per-user z-score anomaly flags (|z| > 2): population moments "
    "from deterministic fixed-point sums (built-in stddev is a "
    "float-associativity lottery across partitionings), one groupBy + "
    "one keyed join back.  The squared-value sum uses scale 1e6 — "
    "headroom ~9.2e12 value-units squared, documented bound.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.operators import fpsum

    t = Tables(spark, sf_dir)
    v = F.col("value")
    stats = t.events.groupBy("user_id").agg(
        (fpsum(v) / F.count(v)).alias("mu"),
        (fpsum(v * v, 1e6) / F.count(v)).alias("m2"),
        F.count(v).alias("n"),
    )
    j = t.events.join(stats, "user_id")
    var = F.col("m2") - F.col("mu") * F.col("mu")
    z = (v - F.col("mu")) / F.sqrt(var)
    return (
        j.filter((F.col("n") >= 10) & (var > 1e-12) & (F.abs(z) > 2.0))
        .select("event_id", "user_id", "value", z.alias("z"))
    )


EWMA_ALPHA = 0.1


@register(
    "events_ewma_user",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, len(vs)::BIGINT AS n,
           round(list_reduce(vs,
                 (acc, x) -> {1 - EWMA_ALPHA} * acc + {EWMA_ALPHA} * x),
                 6) AS ewma
    FROM ordered
    """,
    doc="Per-user exponentially weighted moving average — an "
    "order-dependent recurrence no built-in window expresses: "
    "collect each user's ordered sequence, fold it in one Arrow "
    "batch per partition (not per key — per-group pandas overhead "
    "is a constant that dominates at high key cardinality).  The "
    "DuckDB oracle replays the identical left fold with "
    "list_reduce over the same (ts, event_id) order, seeded with "
    "the first value — bit-identical IEEE operation order, rounded "
    "to 6.  One shuffle on user_id; state is one float per user, "
    "so it scales like any keyed aggregate.",
)
def events_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    t = Tables(spark, sf_dir)
    alpha = EWMA_ALPHA

    # Fold shape: collect each user's (ts, event_id, value) into a
    # sorted array (struct sort = lexicographic, ts first — the same
    # total order as the oracle's list(... ORDER BY ts, event_id)),
    # then ONE Arrow eval runs the recurrence over all users in a
    # batch.  An applyInPandas-per-user version measured ~2ms of
    # per-group pandas overhead per key — a constant that dominates
    # at high key cardinality; this shape pays one Arrow batch per
    # partition instead.
    @pandas_udf("double")
    def fold(seqs: pd.Series) -> pd.Series:
        out = []
        for seq in seqs:
            acc = seq[0]["value"]
            for row in seq[1:]:
                acc = (1 - alpha) * acc + alpha * row["value"]
            out.append(acc)
        return pd.Series(out)

    return (
        t.events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq"),
        )
        # round JVM-side: F.round is HALF_UP like the oracle's round()
        # (Python's round is banker's — diverges on exact ties)
        .select(
            "user_id", "n", F.round(fold(F.col("seq")), 6).alias("ewma")
        )
    )


@register(
    "events_time_rollup",
    oracle=f"""
    SELECT date_trunc('month', ts) AS month,
           CASE WHEN GROUPING(date_trunc('day', ts)) = 0
                THEN date_trunc('day', ts) END AS day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN date_trunc('hour', ts) END AS hour,
           GROUPING(date_trunc('day', ts))::INT
             + GROUPING(date_trunc('hour', ts))::INT AS lvl,
           count(*) AS n, {fpsum_sql("value")} AS sum_value
    FROM events
    GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts),
                     date_trunc('hour', ts))
    HAVING GROUPING(date_trunc('month', ts)) = 0
    """,
    doc="Hypertable-style multi-granularity rollup: hour, day, and "
    "month aggregates of the same measure in ONE pass (ROLLUP over "
    "truncation levels — Spark expands to a single Expand+HashAgg, "
    "one scan and one shuffle instead of three).  This is the batch "
    "form of a continuous aggregate; at 100 TB the pass is "
    "incremental per partition-day and coarser levels merge child "
    "partials.",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pre = t.events.select(
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    g = (
        pre.rollup("month", "day", "hour")
        .agg(
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.grouping("month").cast("int").alias("g_month"),
            F.count("*").alias("n"),
            fpsum(F.col("value")).alias("sum_value"),
        )
        .filter(F.col("g_month") == 0)
    )
    return g.select(
        "month",
        "day",
        "hour",
        (F.col("g_day") + F.col("g_hour")).alias("lvl"),
        "n",
        "sum_value",
    )


@register(
    "events_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT date_trunc('hour', ts) AS bar, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                event_type
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events WHERE value IS NOT NULL
    )
    SELECT bar, event_type,
           max(CASE WHEN rn_open = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_close = 1 THEN value END) AS close,
           count(*) AS n
    FROM ranked GROUP BY bar, event_type
    """,
    doc="OHLC bars per hour and type — the canonical time-series "
    "downsample.  Spark side: min_by/max_by over the (ts, event_id) "
    "total order gives open/close in the SAME single aggregation "
    "pass as high/low (no rank window, one shuffle); the oracle "
    "replays via rank windows since DuckDB arg_min rejects "
    "composite keys.",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bar = F.date_trunc("hour", F.col("ts"))
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        t.events.filter(F.col("value").isNotNull())
        .groupBy(bar.alias("bar"), "event_type")
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count("*").alias("n"),
        )
    )


# -- sequential pattern detection (funnel regex over event streams) ----------

PATTERN_SEQ = ("view", "click", "purchase")
PATTERN_WINDOW_MIN = 30


@register(
    "events_pattern_seq",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3,
             lead(ts, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, count(*) AS n_matches,
           min(ts) AS first_match_at
    FROM o
    WHERE event_type = '{PATTERN_SEQ[0]}' AND e2 = '{PATTERN_SEQ[1]}'
      AND e3 = '{PATTERN_SEQ[2]}'
      AND t3 <= ts + INTERVAL {PATTERN_WINDOW_MIN} MINUTE
    GROUP BY user_id
    """,
    doc=f"Sequential pattern detection (MATCH_RECOGNIZE-style): count, "
    f"per user, strictly consecutive {' -> '.join(PATTERN_SEQ)} event "
    f"runs completing within {PATTERN_WINDOW_MIN} minutes.  lead() "
    "windows express the fixed-length pattern as a single per-user "
    "sort — no self-joins, no per-row subqueries; ties broken by "
    "event_id for a deterministic total order.  Scales as one "
    "hash-partitioned sort per user shard; pattern length only widens "
    "the projected lead columns, never adds passes.",
)
def events_pattern_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = t.events.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("ts", 2).over(w).alias("t3"),
    )
    return (
        o.filter(
            (F.col("event_type") == PATTERN_SEQ[0])
            & (F.col("e2") == PATTERN_SEQ[1])
            & (F.col("e3") == PATTERN_SEQ[2])
            & (
                F.col("t3")
                <= F.col("ts") + F.expr(f"INTERVAL {PATTERN_WINDOW_MIN} MINUTE")
            )
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("ts").alias("first_match_at"),
        )
    )


# -- interval union (merge-overlaps) aggregation -----------------------------

COVER_WIN_MIN = 10  # each event covers [ts, ts + 10 min)


@register(
    "events_interval_union",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL {COVER_WIN_MIN} MINUTE AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM iv
    ), grp AS (
      SELECT user_id, s, e,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS g
      FROM marked
    )
    SELECT user_id, count(DISTINCT g) AS n_intervals,
           CAST(sum(span) AS BIGINT) AS covered_sec
    FROM (
      SELECT user_id, g,
             date_diff('second', min(s), max(e)) AS span
      FROM grp GROUP BY user_id, g
    ) GROUP BY user_id
    """,
    doc=f"Interval-union aggregation (merge overlapping intervals): "
    f"each event covers [ts, ts+{COVER_WIN_MIN}min); per user, merge "
    "overlaps and report merged-interval count + total covered "
    "seconds — the coverage/uptime analytic.  The classic sweep: "
    "running max(end) over the start-ordered intervals marks gap "
    "starts, a cumulative sum labels groups, two keyed aggregations "
    "finish — one shuffle on user_id, no self-joins, no explode of "
    "the timeline.",
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    iv = t.events.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {COVER_WIN_MIN} MINUTE")).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "is_new",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    grp = marked.withColumn(
        "g",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = grp.groupBy("user_id", "g").agg(
        (
            F.unix_timestamp(F.max("e")) - F.unix_timestamp(F.min("s"))
        ).alias("span")
    )
    return spans.groupBy("user_id").agg(
        F.count_distinct("g").alias("n_intervals"),
        F.sum("span").cast("bigint").alias("covered_sec"),
    )


# -- linear trend (exact-moment regression) ----------------------------------

TREND_SCALE = 1e6


@register(
    "events_linear_trend",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(round(x * {TREND_SCALE:.0f}.0, 0) AS BIGINT)) AS DOUBLE)
               / {TREND_SCALE:.0f}.0 AS sx,
             CAST(sum(CAST(round(y * {TREND_SCALE:.0f}.0, 0) AS BIGINT)) AS DOUBLE)
               / {TREND_SCALE:.0f}.0 AS sy,
             CAST(sum(CAST(round(x * x * {TREND_SCALE:.0f}.0, 0) AS BIGINT)) AS DOUBLE)
               / {TREND_SCALE:.0f}.0 AS sxx,
             CAST(sum(CAST(round(x * y * {TREND_SCALE:.0f}.0, 0) AS BIGINT)) AS DOUBLE)
               / {TREND_SCALE:.0f}.0 AS sxy
      FROM (
        SELECT event_type,
               date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                 / 86400.0 AS x,
               coalesce(value, 0.0) AS y
        FROM events
      )
      GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9)
             AS intercept
    FROM m
    """,
    doc="Per-event-type linear trend (least-squares value ~ days since "
    "epoch): the moments (n, Σx, Σy, Σx², Σxy) accumulate as exact "
    "fixed-point int64 sums — partitioning-invariant like every other "
    "deterministic aggregate here — and the slope/intercept close-form "
    "evaluates per group.  One shuffle of 5-number partials per type; "
    "regression over 100 TB costs exactly one scan.",
)
def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    x = (
        F.unix_timestamp(F.col("ts"))
        - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    ) / 86400.0
    y = F.coalesce(F.col("value"), F.lit(0.0))

    def xs(e):
        return (
            F.sum(F.round(e * TREND_SCALE, 0).cast("long")).cast("double")
            / TREND_SCALE
        )

    m = t.events.select(
        "event_type", x.alias("x"), y.alias("y")
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        xs(F.col("x")).alias("sx"),
        xs(F.col("y")).alias("sy"),
        xs(F.col("x") * F.col("x")).alias("sxx"),
        xs(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "event_type",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias(
            "intercept"
        ),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    )
    SELECT src, dst, count(*) AS n,
           round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY src)
                 AS DOUBLE), 8) AS p
    FROM o WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
    doc="Event-type transition matrix (Markov / Sankey counts): "
    "consecutive per-user event pairs via lead(), then a grouped "
    "count with a windowed row-normalization into transition "
    "probabilities.  One per-user sort + one tiny (src,dst) "
    "aggregation; the probability window runs over the k x k "
    "aggregate, not the events.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = t.events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = o.groupBy("src", "dst").agg(F.count("*").alias("n"))
    return counts.withColumn(
        "p",
        F.round(
            F.col("n")
            / F.sum("n").over(Window.partitionBy("src")).cast("double"),
            8,
        ),
    )


@register(
    "events_watermark_lateness",
    oracle="""
    WITH arr AS (
      SELECT ts,
             max(ts) OVER (ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS frontier
      FROM events
    ), lateness AS (
      SELECT date_diff('second', ts, frontier) AS late_sec FROM arr
    )
    SELECT count(*) AS n_events,
           count(*) FILTER (late_sec > 0) AS n_late,
           count(*) FILTER (late_sec > 600) AS late_10m,
           count(*) FILTER (late_sec > 1800) AS late_30m,
           count(*) FILTER (late_sec > 3600) AS late_1h,
           max(late_sec) AS max_late_sec
    FROM lateness
    """,
    doc="Watermark-delay sizing report: treating arrival order as "
    "event_id, each event's lateness = running event-time frontier "
    "minus its timestamp; the histogram over candidate delays "
    "(10 min / 30 min / 1 h) is exactly the data you need to choose "
    "withWatermark() — the fraction of events a given delay would "
    "drop.  The global running max is the one deliberately serial "
    "window here (arrival order is a total order by definition); at "
    "scale the same report runs per shard/hour and unions.",
)
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    arr = t.events.select(
        "ts", F.max("ts").over(w).alias("frontier")
    )
    late = arr.select(
        (
            F.unix_timestamp("frontier") - F.unix_timestamp("ts")
        ).alias("late_sec")
    )
    return late.agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("late_sec") > 0).alias("n_late"),
        F.count_if(F.col("late_sec") > 600).alias("late_10m"),
        F.count_if(F.col("late_sec") > 1800).alias("late_30m"),
        F.count_if(F.col("late_sec") > 3600).alias("late_1h"),
        F.max("late_sec").alias("max_late_sec"),
    )


@register(
    "events_pareto_share",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), ranked AS (
      SELECT user_id, n,
             sum(n) OVER (ORDER BY n DESC, user_id
                          ROWS UNBOUNDED PRECEDING) AS cum_n,
             row_number() OVER (ORDER BY n DESC, user_id) AS rk,
             count(*) OVER () AS n_users,
             sum(n) OVER () AS total
      FROM per_user
    )
    SELECT decile, count(*) AS n_users,
           CAST(sum(n) AS BIGINT) AS events,
           round(max(cum_share), 8) AS cum_share
    FROM (
      SELECT CAST(ceil(rk * 10.0 / n_users) AS INT) AS decile, n,
             cum_n / CAST(total AS DOUBLE) AS cum_share
      FROM ranked
    )
    GROUP BY decile
    """,
    doc="Pareto concentration report: users ranked by activity, "
    "bucketed into deciles, with each decile's cumulative share of "
    "all events — the who-generates-the-data skew profile that "
    "decides salting/partitioning strategy before a pipeline runs.  "
    "One per-user count, then the distributed count-desc rank "
    "(ranked_by_count_desc: histogram prefix via log2 buckets + "
    "hash-sub-bucketed tie numbering — no user-base-sized "
    "single-partition window), one decile rollup.  The wide stages "
    "all operate on user-cardinality data, never raw events.",
)
def events_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.operators import ranked_by_count_desc

    t = Tables(spark, sf_dir)

    def per_user() -> DataFrame:
        return t.events.groupBy("user_id").agg(F.count("*").alias("n"))

    # Distributed rank + running total (no user-base-sized
    # single-partition window).  The decile rollup is tie-order
    # invariant: users in an equal-n tie group are interchangeable —
    # per-decile counts depend only on rank positions, per-decile event
    # sums add the same n per slot, and max(cum_share) is the running
    # total at the decile's last rank — so parity with the oracle's
    # ORDER BY n DESC, user_id holds under any tie assignment.
    ranked, n_users, total = ranked_by_count_desc(
        spark, sf_dir, "pareto_users", per_user, "user_id", "n"
    )
    binned = ranked.select(
        F.ceil(F.col("rk") * 10.0 / F.lit(n_users))
        .cast("int")
        .alias("decile"),
        "n",
        (F.col("cum") / F.lit(float(total))).alias("cum_share"),
    )
    return binned.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.sum("n").cast("bigint").alias("events"),
        F.round(F.max("cum_share"), 8).alias("cum_share"),
    )


@register(
    "events_variant_json",
    oracle="""
    SELECT event_type,
           count(json_extract(props, '$.k')) AS n_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured ingestion through the open VARIANT type "
    "(Spark 4): parse_json once into Variant's binary encoding, then "
    "typed variant_get extraction feeding a plain aggregate.  At "
    "100 TB this is the schema-on-read path that beats per-access "
    "string JSON re-parsing (get_json_object re-tokenizes the text "
    "for every path probe; Variant decodes once and field access is "
    "an offset lookup), while staying columnar/shreddable in "
    "parquet.  Map-only until the final low-cardinality aggregate.",
)
def events_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    parsed = t.events.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "bigint")
    return parsed.groupBy("event_type").agg(
        F.count(k).alias("n_k"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_type_islands",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    marked AS (
      SELECT *, (CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END) AS is_new
      FROM ordered
    ),
    islands AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS island_id
      FROM marked
    )
    SELECT user_id, island_id::BIGINT AS island_id,
           min(event_type) AS event_type,
           count(*) AS run_len,
           min(ts) AS valid_from, max(ts) AS valid_to
    FROM islands GROUP BY user_id, island_id
    """,
    doc="Gaps-and-islands: collapse consecutive runs of the same "
    "event_type per user into [valid_from, valid_to] intervals — the "
    "SCD2 history-building primitive (each island is one dimension "
    "version).  Same single-exchange shape as sessionization: one "
    "shuffle+sort per user partition feeds the lag marker, the "
    "cumulative island id, and the final rollup.",
)
def events_type_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marked = t.events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    islands = marked.withColumn(
        "island_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("event_type").alias("event_type"),
        F.count("*").alias("run_len"),
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
    )


# -- SCD Type-2 dimension build from a change log ----------------------------


@register(
    "events_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)::BIGINT AS version,
           event_type AS status,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
    FROM changes
    """,
    doc="Slowly-changing-dimension Type-2 history build from the event "
    "log: collapse consecutive same-status events per user (lag "
    "compare), then open a versioned validity interval per change "
    "(valid_from = change ts, valid_to = next change, NULL = current). "
    "The standard warehouse dimension-maintenance op.  One shuffle on "
    "user_id; both window passes reuse the same (user, ts, event_id) "
    "sort order so Catalyst plans a single sort.  Ties break on "
    "event_id — deterministic on both engines.",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        t.events.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# -- debounce / rate limiting -------------------------------------------------

DEBOUNCE_SEC = 300  # suppress same-user same-type events within 5 minutes


@register(
    "events_debounce",
    oracle=f"""
    WITH ordered AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM ordered
    WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL {DEBOUNCE_SEC} SECOND
    """,
    doc=f"Debounce / rate-limit: suppress repeat (user, type) events "
    f"arriving within {DEBOUNCE_SEC}s of the previously KEPT-or-seen "
    "event — the burst-collapse pass upstream of alerting and billing "
    "pipelines.  (Lag-based variant: gap measured to the previous raw "
    "event; the strict token-bucket needs running state — that shape "
    "is streaming_stateful_max.)  One shuffle on (user, type); the "
    "filter is a per-row window compare, no self-joins.",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        t.events.select("event_id", "user_id", "event_type", "ts")
        .withColumn("prev_ts", prev)
        .filter(
            F.col("prev_ts").isNull()
            | (
                F.col("ts") - F.col("prev_ts")
                > F.expr(f"INTERVAL {DEBOUNCE_SEC} SECOND")
            )
        )
        .drop("prev_ts")
    )


# -- point-in-time join against the SCD2 dimension ---------------------------


@register(
    "events_pit_join_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    dim AS (
      SELECT user_id, event_type AS status, ts AS valid_from,
             event_id AS version_event,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, d.status,
           d.valid_from AS status_since
    FROM purchases p
    JOIN dim d
      ON p.user_id = d.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
     AND NOT (d.valid_from = p.ts AND d.version_event > p.event_id)
    """,
    doc="Point-in-time (temporal) join: every purchase event enriched "
    "with the SCD2 status version valid AT its timestamp — the "
    "time-correct dimension lookup that prevents feature leakage in "
    "training-data builds (vs joining today's attributes onto "
    "yesterday's facts).  Equi-join on user_id with the validity "
    "interval as residual predicate: a hash join + filter, never a "
    "cartesian (same shape as events_range_join); fan-in per user is "
    "bounded by that user's version count.  The same-timestamp edge "
    "(a fact coinciding with its own version-opening event) is pinned "
    "by event_id so both engines pick the same version.",
)
def events_pit_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        t.events.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            F.col("event_id").alias("version_event"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    cond = (
        (purchases.user_id == dim.d_user)
        & (dim.valid_from <= purchases.ts)
        & (dim.valid_to.isNull() | (purchases.ts < dim.valid_to))
        & ~(
            (dim.valid_from == purchases.ts)
            & (dim.version_event > purchases.event_id)
        )
    )
    return purchases.join(dim, cond).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "status",
        F.col("valid_from").alias("status_since"),
    )


# -- co-occurrence / lift analysis (market basket over sessions) -------------


@register(
    "events_cooccurrence_lift",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type,
             sum(CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    ),
    baskets AS (
      SELECT DISTINCT user_id, session_id, event_type FROM sess
    ),
    n_sessions AS (
      SELECT count(*) AS n
      FROM (SELECT DISTINCT user_id, session_id FROM baskets)
    ),
    singles AS (
      SELECT event_type, count(*) AS n_t FROM baskets GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_ab
      FROM baskets a
      JOIN baskets b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           round(p.n_ab::DOUBLE / (SELECT n FROM n_sessions), 10) AS support,
           round((p.n_ab::DOUBLE * (SELECT n FROM n_sessions))
                 / (sa.n_t::DOUBLE * sb.n_t), 10) AS lift
    FROM pairs p
    JOIN singles sa ON p.type_a = sa.event_type
    JOIN singles sb ON p.type_b = sb.event_type
    """,
    doc="Market-basket co-occurrence over gap sessions: which event "
    "types appear in the same session more often than independence "
    "predicts (support + lift per unordered type pair).  Baskets are "
    "the sessionization output deduped to (session, type); the pair "
    "join is keyed on the session — fan-out bounded by distinct types "
    "per session (small by construction), never cross-corpus.  The "
    "type marginals and session count are tiny broadcast sides.  At "
    "catalog scale (many item types) the same shape runs on hashed "
    "item pairs with a support-threshold pre-prune (a-priori).",
)
def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = SESSION_GAP_MIN * 60
    sess = t.events.select(
        "user_id",
        "event_type",
        F.sum(
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.col("ts") - F.lag("ts").over(w)
                    > F.expr(f"INTERVAL {gap_sec} SECOND")
                ),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    # One-exchange basket rollup (r15, guide §2.4): the window above
    # leaves the data hash-partitioned by user_id, which satisfies the
    # (user_id, session_id) grouping — so collecting each session's
    # distinct type set is exchange-FREE, where the former
    # distinct + self-join re-shuffled the basket rows three more
    # times.  Pairs are generated in-plan from the sorted type array
    # (bounded by the distinct-type count per session, exactly the
    # rows the a<b self-join produced), so only K² pair rows ever
    # shuffle.  localCheckpoint materializes the rollup once for its
    # three consumers (count, singles, pairs).
    baskets = (
        sess.groupBy("user_id", "session_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
        .localCheckpoint()
    )
    n_sessions = baskets.count()
    singles = baskets.select(
        F.explode("types").alias("event_type")
    ).groupBy("event_type").agg(F.count("*").alias("n_t"))
    pair_structs = F.flatten(
        F.transform(
            "types",
            lambda x, i: F.transform(
                F.slice("types", i + 2, F.size("types")),
                lambda y: F.struct(
                    x.alias("type_a"), y.alias("type_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.type_a").alias("type_a"),
            F.col("p.type_b").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / n_sessions, 10).alias(
                "support"
            ),
            F.round(
                (F.col("n_ab").cast("double") * n_sessions)
                / (F.col("na").cast("double") * F.col("nb")),
                10,
            ).alias("lift"),
        )
    )


# -- cumulative unique users (first-seen + running total) --------------------


@register(
    "events_cumulative_uniques",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT first_day AS day, count(*) AS new_users
      FROM firsts GROUP BY first_day
    )
    SELECT day, new_users,
           sum(new_users) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING)::BIGINT
               AS cumulative_users
    FROM daily
    """,
    doc="Cumulative unique users per day (growth-accounting curve): "
    "first-seen day per user via one keyed min-reduce (map-side "
    "combine collapses each user's events before the shuffle), a "
    "day-level rollup, then a running sum over the DAY table — the "
    "serial window runs on ~365 rows/year, not events.  The naive "
    "formulation (count(distinct) over an expanding window) rescans "
    "the id universe per day; this shape never does.",
)
def events_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


# -- DAU / WAU rolling active users ------------------------------------------

WAU_DAYS = 7


@register(
    "events_dau_wau",
    oracle=f"""
    WITH user_days AS MATERIALIZED (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    dau AS (
      SELECT day, count(*) AS dau FROM user_days GROUP BY day
    ),
    expanded AS (
      SELECT user_id, day + (k * INTERVAL 1 DAY) AS win_day
      FROM user_days,
           (SELECT unnest(generate_series(0, {WAU_DAYS - 1})) AS k)
    ),
    wau AS (
      SELECT win_day AS day, count(DISTINCT user_id) AS wau
      FROM expanded GROUP BY win_day
    )
    SELECT d.day, d.dau, w.wau
    FROM dau d JOIN wau w USING (day)
    """,
    doc=f"DAU + trailing {WAU_DAYS}-day WAU (rolling active users): "
    "events first collapse to DISTINCT (user, day) — the shuffle "
    "carries the activity matrix, not events — then each active day "
    f"fans out to the {WAU_DAYS} windows it supports and a distinct "
    "count per window day closes it.  The naive per-day expanding "
    "count(distinct) subquery rescans events per day; this is one "
    "dedup + bounded fan-out + one rollup.  (Trailing-window edge "
    "days beyond the data's end are inner-joined away.)",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    user_days = (
        t.events.select(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .distinct()
        .localCheckpoint()
    )
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(WAU_DAYS - 1))
        ).alias("k"),
        "day",
    ).select(
        "user_id",
        (F.col("day") + F.make_interval(days=F.col("k"))).alias("win_day"),
    )
    wau = expanded.groupBy(F.col("win_day").alias("day")).agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select("day", "dau", "wau")


# -- A/B experiment readout (deterministic assignment + Welch t) -------------

AB_MOD = 2  # user_id % 2 -> arm


@register(
    "events_ab_ttest",
    oracle=f"""
    WITH assigned AS (
      SELECT (user_id % {AB_MOD})::INT AS arm, value
      FROM events WHERE value IS NOT NULL
    ),
    moments AS (
      SELECT arm, count(*) AS n,
             CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT))
                  AS DOUBLE) / 1000000.0 AS s1,
             CAST(sum(CAST(round(value * value * 1000000.0, 0) AS BIGINT))
                  AS DOUBLE) / 1000000.0 AS s2
      FROM assigned GROUP BY arm
    ),
    stats AS (
      SELECT arm, n, round(s1 / n, 10) AS mean,
             round((s2 - s1 * s1 / n) / (n - 1), 10) AS var
      FROM moments
    )
    SELECT a.n AS n_control, b.n AS n_treatment,
           a.mean AS mean_control, b.mean AS mean_treatment,
           round(b.mean - a.mean, 10) AS lift,
           round((b.mean - a.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 8) AS t_stat
    FROM stats a, stats b
    WHERE a.arm = 0 AND b.arm = 1
    """,
    doc="A/B experiment readout: deterministic hash assignment "
    "(user_id % 2 — no rand(), the assignment IS the identity), "
    "per-arm mean/variance from exact fixed-point moments (one "
    "map-side-combined pass), and the Welch t-statistic from the "
    "2-row stats table.  The entire experiment analysis is one scan + "
    "one 2-group aggregate regardless of scale; moments are "
    "partition-order independent so the reported t replays "
    "bit-identically.",
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("value").isNotNull()).select(
        (F.col("user_id") % AB_MOD).cast("int").alias("arm"), "value"
    )

    def q(col):
        return (
            F.sum(F.round(col * 1e6, 0).cast("long")).cast("double") / 1e6
        )

    m = ev.groupBy("arm").agg(
        F.count("*").alias("n"),
        q(F.col("value")).alias("s1"),
        q(F.col("value") * F.col("value")).alias("s2"),
    )
    stats = m.select(
        "arm",
        "n",
        F.round(F.col("s1") / F.col("n"), 10).alias("mean"),
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1),
            10,
        ).alias("var"),
    )
    a = stats.filter(F.col("arm") == 0).alias("a")
    b = stats.filter(F.col("arm") == 1).alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_control"),
        F.col("b.n").alias("n_treatment"),
        F.col("a.mean").alias("mean_control"),
        F.col("b.mean").alias("mean_treatment"),
        F.round(F.col("b.mean") - F.col("a.mean"), 10).alias("lift"),
        F.round(
            (F.col("b.mean") - F.col("a.mean"))
            / F.sqrt(
                F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
            ),
            8,
        ).alias("t_stat"),
    )


# -- seasonal-naive forecast backtest ----------------------------------------

FORECAST_SPLIT_DAY = 21  # train on days < 21, test on the rest


@register(
    "events_forecast_backtest",
    oracle=f"""
    WITH hourly AS MATERIALIZED (
      SELECT date_trunc('hour', ts) AS h,
             extract(hour FROM ts)::INT AS hod,
             extract(day FROM ts)::INT AS dom,
             count(*) AS n
      FROM events
      GROUP BY 1, 2, 3
    ),
    model AS (
      SELECT hod,
             CAST(sum(n) AS DOUBLE) / count(*) AS predicted
      FROM hourly WHERE dom < {FORECAST_SPLIT_DAY} GROUP BY hod
    )
    SELECT t.hod,
           count(*) AS n_test_hours,
           round(any_value(m.predicted), 10) AS predicted,
           round(CAST(sum(CAST(round(abs(t.n - m.predicted)
                 * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0
                 / count(*), 6) AS mae
    FROM hourly t JOIN model m USING (hod)
    WHERE t.dom >= {FORECAST_SPLIT_DAY}
    GROUP BY t.hod
    """,
    doc="Seasonal-naive forecast with a held-out backtest: train the "
    "hour-of-day profile on the first 20 days (exact integer counts, "
    "one rollup), score the remaining days, report per-hour MAE — the "
    "baseline every capacity-planning forecast must beat, and the "
    "backtesting JOIN shape (model broadcast onto held-out actuals) "
    "that any model family reuses.  The time split is leakage-free by "
    "construction.  Absolute errors fixed-point summed; the 24-row "
    "model broadcasts.",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hourly = (
        t.events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.hour("ts").cast("int").alias("hod"),
            F.dayofmonth("ts").cast("int").alias("dom"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    model = (
        hourly.filter(F.col("dom") < FORECAST_SPLIT_DAY)
        .groupBy("hod")
        .agg(
            (F.sum("n").cast("double") / F.count("*")).alias("predicted")
        )
    )
    err = F.round(
        F.abs(F.col("n") - F.col("predicted")) * 1e6, 0
    ).cast("long")
    return (
        hourly.filter(F.col("dom") >= FORECAST_SPLIT_DAY)
        .join(F.broadcast(model), "hod")
        .groupBy("hod")
        .agg(
            F.count("*").alias("n_test_hours"),
            F.round(F.any_value("predicted"), 10).alias("predicted"),
            F.round(
                F.sum(err).cast("double") / 1e6 / F.count("*"), 6
            ).alias("mae"),
        )
    )


# -- global interval join (no equi key) via time-bucket explosion ------------

INCIDENT_TOP_N = 20  # highest-value events define incident windows
INCIDENT_HALF_MIN = 5  # window = incident ts +- 5 minutes
_BUCKET_MIN = 5  # bucket granularity >= half-window keeps fan-out <= 3


@register(
    "join_interval_bucketed_global",
    oracle=f"""
    WITH incidents AS (
      SELECT event_id AS incident_id, ts AS incident_ts
      FROM events
      ORDER BY value DESC, event_id
      LIMIT {INCIDENT_TOP_N}
    )
    SELECT i.incident_id, count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM incidents i
    JOIN events e
      ON e.ts >= i.incident_ts - INTERVAL {INCIDENT_HALF_MIN} MINUTE
     AND e.ts <= i.incident_ts + INTERVAL {INCIDENT_HALF_MIN} MINUTE
    GROUP BY i.incident_id
    """,
    doc="Interval join with NO equi key (every event vs every "
    f"incident window, top-{INCIDENT_TOP_N} by value): the case where "
    "the range-join-as-residual trick has no equi column to hang on "
    "and naive execution is a cartesian.  The engine manufactures the "
    f"equi key: {_BUCKET_MIN}-minute time buckets — each incident "
    "window explodes into the <= 3 buckets it covers, events map to "
    "exactly one bucket, the join is equi on bucket with the interval "
    "as residual, and per-(incident, event) dedup is free because "
    "bucket membership is disjoint for the probe side.  The oracle "
    "states the same join declaratively; the plan is asserted "
    "hash-joined, never BroadcastNestedLoop/cartesian.  Fan-out is "
    "bounded by windows-per-bucket — the Databricks range-join "
    "optimization's binning, hand-rolled.",
)
def join_interval_bucketed_global(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = Tables(spark, sf_dir)
    half = F.expr(f"INTERVAL {INCIDENT_HALF_MIN} MINUTE")
    incidents = (
        t.events.orderBy(F.desc("value"), "event_id")
        .limit(INCIDENT_TOP_N)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("incident_ts"),
        )
    )
    # explode each incident window into the buckets it covers
    win_buckets = incidents.select(
        "incident_id",
        "incident_ts",
        F.explode(
            F.sequence(
                (
                    F.unix_timestamp(F.col("incident_ts") - half)
                    / (60 * _BUCKET_MIN)
                ).cast("long"),
                (
                    F.unix_timestamp(F.col("incident_ts") + half)
                    / (60 * _BUCKET_MIN)
                ).cast("long"),
            )
        ).alias("bucket"),
    )
    ev = t.events.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") / (60 * _BUCKET_MIN))
        .cast("long")
        .alias("bucket"),
    )
    residual = (F.col("ts") >= F.col("incident_ts") - half) & (
        F.col("ts") <= F.col("incident_ts") + half
    )
    return (
        ev.join(win_buckets.hint("shuffle_hash"), "bucket")
        .filter(residual)
        .groupBy("incident_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


# -- ratio-metric readout via the delta method -------------------------------


@register(
    "events_ab_ratio_delta",
    oracle=f"""
    WITH per_user AS (
      SELECT (user_id % {AB_MOD})::INT AS arm, user_id,
             CAST(sum(CAST(round(coalesce(value, 0.0) * 1000000.0, 0)
                  AS BIGINT)) AS DOUBLE) / 1000000.0 AS y,
             count(*) AS n
      FROM events GROUP BY arm, user_id
    ),
    arm_stats AS (
      SELECT arm, count(*) AS u,
             CAST(sum(CAST(round(y * 1000000.0, 0) AS BIGINT))
                  AS DOUBLE) / 1000000.0 AS sy,
             sum(n)::BIGINT AS sn,
             CAST(sum(CAST(round(y * y * 100.0, 0) AS BIGINT))
                  AS DOUBLE) / 100.0 AS syy,
             sum(n * n)::BIGINT AS snn,
             CAST(sum(CAST(round(y * n * 10000.0, 0) AS BIGINT))
                  AS DOUBLE) / 10000.0 AS syn
      FROM per_user GROUP BY arm
    ),
    readout AS (
      SELECT arm, u, sy, sn,
             round(sy / sn, 10) AS ratio,
             (syy - 2 * (sy / sn) * syn
              + (sy / sn) * (sy / sn) * snn) / (u - 1) AS s2
      FROM arm_stats
    )
    SELECT a.ratio AS ratio_control, b.ratio AS ratio_treatment,
           round(b.ratio - a.ratio, 10) AS diff,
           round((b.ratio - a.ratio)
                 / sqrt(a.u * a.s2 / (a.sn * a.sn)
                        + b.u * b.s2 / (b.sn * b.sn)), 6) AS z_stat
    FROM readout a, readout b
    WHERE a.arm = 0 AND b.arm = 1
    """,
    doc="Ratio-metric experiment readout (value per event, "
    "user-randomized) with DELTA-METHOD variance: naive per-event "
    "t-tests are wrong when the randomization unit (user) differs "
    "from the analysis unit (event) — the linearization y_i - R*n_i "
    "over per-user totals is the correct SE.  Two grouped passes "
    "(user rollup, then 2-row arm moments), all sums exact "
    "fixed-point, the closed-form z replays bit-identically.",
)
def events_ab_ratio_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)

    def q(col, scale):
        return (
            F.sum(F.round(col * scale, 0).cast("long")).cast("double")
            / F.lit(scale)
        )

    per_user = t.events.groupBy(
        (F.col("user_id") % AB_MOD).cast("int").alias("arm"), "user_id"
    ).agg(
        q(F.coalesce(F.col("value"), F.lit(0.0)), 1e6).alias("y"),
        F.count("*").alias("n"),
    )
    arm = per_user.groupBy("arm").agg(
        F.count("*").alias("u"),
        q(F.col("y"), 1e6).alias("sy"),
        F.sum("n").alias("sn"),
        q(F.col("y") * F.col("y"), 1e2).alias("syy"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
        q(F.col("y") * F.col("n"), 1e4).alias("syn"),
    )
    r = F.col("sy") / F.col("sn")
    readout = arm.select(
        "arm",
        "u",
        "sy",
        "sn",
        F.round(r, 10).alias("ratio"),
        (
            (
                F.col("syy")
                - 2 * r * F.col("syn")
                + r * r * F.col("snn")
            )
            / (F.col("u") - 1)
        ).alias("s2"),
    )
    a = readout.filter(F.col("arm") == 0).alias("a")
    b = readout.filter(F.col("arm") == 1).alias("b")
    var = lambda s: (  # noqa: E731
        F.col(f"{s}.u") * F.col(f"{s}.s2")
        / (F.col(f"{s}.sn") * F.col(f"{s}.sn"))
    )
    return a.crossJoin(b).select(
        F.col("a.ratio").alias("ratio_control"),
        F.col("b.ratio").alias("ratio_treatment"),
        F.round(F.col("b.ratio") - F.col("a.ratio"), 10).alias("diff"),
        F.round(
            (F.col("b.ratio") - F.col("a.ratio"))
            / F.sqrt(var("a") + var("b")),
            6,
        ).alias("z_stat"),
    )


ATTRIB_WINDOW_SEC = 7 * 24 * 3600  # 7-day last-touch lookback


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH cp AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    filled AS (
      SELECT *,
             max(CASE WHEN kind = 0 THEN {{'ts': ts, 'eid': event_id}} END)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_click
      FROM cp
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           CASE WHEN last_click IS NOT NULL
                 AND date_diff('second', (last_click).ts, ts)
                     <= {ATTRIB_WINDOW_SEC}
                THEN (last_click).eid END AS attributed_click_id,
           CASE WHEN last_click IS NOT NULL
                 AND date_diff('second', (last_click).ts, ts)
                     <= {ATTRIB_WINDOW_SEC}
                THEN date_diff('second', (last_click).ts, ts)
           END AS lag_seconds
    FROM filled WHERE kind = 1
    """,
    doc="Marketing-style last-touch attribution: each purchase is "
    "attributed to the same user's most recent click at-or-before it, "
    "but only within a 7-day lookback (outside the window the "
    "purchase stays unattributed — NULL, not the stale click).  Same "
    "single-ordered-pass shape as events_asof_join: union clicks and "
    "purchases, one window per user carrying max(struct(ts, "
    "event_id)) over clicks seen so far (struct max = latest click, "
    "ties impossible on unique event_id), lookback enforced by an "
    "integer epoch-seconds comparison.  One user-keyed shuffle total "
    "— never a per-purchase range join; at 100 TB this is the "
    "sessionization-class shape that scales linearly with events per "
    "user.",
)
def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = Tables(spark, sf_dir)
    cp = t.events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = cp.select(
        "event_id",
        "user_id",
        "ts",
        "kind",
        F.max(
            F.when(F.col("kind") == 0, F.struct("ts", "event_id"))
        ).over(w).alias("last_click"),
    )
    # NTZ has no direct long cast; session tz is pinned UTC, so the
    # timestamp hop is deterministic epoch seconds
    def _epoch(c):
        return c.cast("timestamp").cast("long")

    lag = _epoch(F.col("ts")) - _epoch(F.col("last_click.ts"))
    in_window = F.col("last_click").isNotNull() & (
        lag <= ATTRIB_WINDOW_SEC
    )
    return filled.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("last_click.event_id")).alias(
            "attributed_click_id"
        ),
        F.when(in_window, lag).alias("lag_seconds"),
    )


@register(
    "events_asof_nearest",
    oracle="""
    WITH unioned AS (
      SELECT user_id, ts, event_id, 0 AS kind FROM events
      WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind FROM events
      WHERE event_type = 'click'
    ),
    filled AS (
      SELECT user_id, ts, event_id, kind,
             last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS UNBOUNDED PRECEDING) AS back_ts,
             first_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS fwd_ts
      FROM unioned
    )
    SELECT user_id, event_id AS click_id, ts AS click_ts,
           CASE
             WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
             WHEN fwd_ts IS NULL THEN back_ts
             WHEN back_ts IS NULL THEN fwd_ts
             WHEN epoch_us(ts) - epoch_us(back_ts)
                  <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
             ELSE fwd_ts
           END AS nearest_view_ts,
           CASE
             WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
             WHEN fwd_ts IS NULL THEN 'backward'
             WHEN back_ts IS NULL THEN 'forward'
             WHEN epoch_us(ts) - epoch_us(back_ts)
                  <= epoch_us(fwd_ts) - epoch_us(ts) THEN 'backward'
             ELSE 'forward'
           END AS direction
    FROM filled WHERE kind = 1
    """,
    doc="Nearest as-of join: each click pairs with its closest view "
    "in TIME, either direction (ties and same-timestamp views go "
    "backward — views sort before clicks at equal ts).  The "
    "events_asof_join backward pass plus a mirrored forward "
    "first_value over the SAME one ordered exchange — two frames, "
    "one sort, no per-row range subquery; gap comparison in exact "
    "integer microseconds on both engines.",
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    views = t.events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    order = ["ts", "kind", "event_id"]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    vts = F.when(F.col("kind") == 0, F.col("ts"))
    filled = views.unionByName(clicks).select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(vts, ignorenulls=True).over(wb).alias("back_ts"),
        F.first(vts, ignorenulls=True).over(wf).alias("fwd_ts"),
    )
    # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast to
    # TIMESTAMP is identity and unix_micros gives exact integers
    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    gb = us(F.col("ts")) - us(F.col("back_ts"))
    gf = us(F.col("fwd_ts")) - us(F.col("ts"))
    backward = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull() & (gb <= gf)
    )
    none = F.col("back_ts").isNull() & F.col("fwd_ts").isNull()
    return filled.filter(F.col("kind") == 1).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.when(none, F.lit(None).cast("timestamp"))
        .when(backward, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
        .alias("nearest_view_ts"),
        F.when(none, F.lit(None).cast("string"))
        .when(backward, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )
