"""Operator implementations, each registering queries into the registry.

Shared conventions for oracle parity (the driver hash-compares Spark
output against DuckDB running ``oracle_sql`` on the same parquet):

- **Deterministic double aggregation**: floating sums are not
  associative, and Spark's partial aggregation order differs from
  DuckDB's sequential scan.  Summing raw doubles at 60k+ rows gives
  last-ulp drift that a value-hash rejects.  We therefore quantize
  summands to fixed-point int64 and sum exactly (hi/lo split long sums,
  see ``dsum``) — bit-identical on both engines at any parallelism,
  i.e. the result no longer depends on partitioning.  This is also the
  right call at 100 TB: re-runs reproduce across cluster sizes.
- **Dates**: parquet stores timestamps; outputs cast to DATE so the
  arrow schema matches DuckDB's.
- **Counts**: Spark count() is bigint; DuckDB count() is BIGINT — match.
  ``count(x)`` parity with the reference's Int32 return
  (src/executor/evaluator.rs:238) casts to INT on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from risinglight_spark.tables import Tables, load, register_views  # noqa: F401


# Split-sum radix: x = (x >> 23)·2^23 + (x & (2^23-1)) holds for any
# two's-complement long (arithmetic shift), so one exact long sum
# becomes two cheap codegen'd long sums with far more headroom.
# Headroom at scale 1e6 (6 decimals, the old DECIMAL(18,6) precision):
# per-row |x| <= ~1e11 for TPC-H money products, so sum(hi) <= N·1.2e4
# and sum(lo) < N·8.4e6 — both fit int64 to N ~ 1e12 rows (SF ~170k,
# beyond 100 TB).  The single per-group combine is decimal(38,0), which
# never overflows.  ~25% faster than the former DECIMAL(18,6) sum at
# identical determinism (measured sf0.1: 0.57s vs 0.73s steady-state).
_SPLIT_BITS = 23
_SPLIT_B = 1 << _SPLIT_BITS


def dsum(c: Column, scale: float = 1e6) -> Column:
    """Order-independent double sum (see module docstring): quantize to
    ``scale`` decimals in int64, split-sum exactly, combine per group."""
    xl = F.round(c.cast("double") * F.lit(float(scale)), 0).cast("long")
    hi = F.shiftright(xl, _SPLIT_BITS)
    lo = xl.bitwiseAND(_SPLIT_B - 1)
    total = F.sum(hi).cast("decimal(38,0)") * _SPLIT_B + F.sum(lo)
    return total.cast("double") / F.lit(float(scale))


def dsum_sql(expr: str, scale: float = 1e6) -> str:
    x = f"CAST(round(CAST({expr} AS DOUBLE) * {scale:.0f}.0, 0) AS BIGINT)"
    return (
        f"(CAST(sum({x} >> {_SPLIT_BITS}) * {_SPLIT_B}"
        f" + sum({x} & {_SPLIT_B - 1}) AS DOUBLE) / {scale:.0f}.0)"
    )


def fpsum(c: Column, scale: float = 1e8) -> Column:
    """Order-independent double sum via fixed-point bigint arithmetic:
    round(x*scale) summed exactly as long, divided back.  Unlike dsum's
    decimal cast, the scaling product is a plain IEEE op, bit-identical
    across engines even when the decimal-rounding path differs."""
    return (
        F.sum(F.round(c.cast("double") * scale, 0).cast("long")).cast("double")
        / F.lit(scale)
    )


def fpsum_sql(expr: str, scale: float = 1e8) -> str:
    return (
        f"(CAST(sum(CAST(round(CAST({expr} AS DOUBLE) * {scale:.0f}.0, 0)"
        f" AS BIGINT)) AS DOUBLE) / {scale:.0f}.0)"
    )


def intsum(c: Column) -> Column:
    """Exact sum for integral-valued double columns (e.g. TPC-H
    l_quantity): cast to long and sum JVM-side — codegen'd long adds,
    no decimal path.  Safe to ~9.2e18 units (int64), i.e. any SF."""
    return F.sum(c.cast("long")).cast("double")


def intsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS BIGINT)) AS DOUBLE)"


def davg(c: Column) -> Column:
    """avg via the reference's sum/count rewrite (binder/expr.rs:443-447),
    made order-independent the same way as :func:`dsum`."""
    return dsum(c) / F.count(c)


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count({expr}))"


# ---------------------------------------------------------------------------
# Session-scoped cache of persisted "mined asset" DataFrames (collapsed
# dedup signature tables, jaccard rep pairs, membership maps, trained
# PQ/IVF index pieces, NB models, PPS bucket prefix sums).  Shared by
# operators/dedup.py, operators/vector_search.py, and
# operators/pipeline_ops.py: one materialization per (kind, sf_dir) per
# SparkContext, reused across every consumer and bench sample — the
# "train/mine once, store the asset" contract made literal.
#
# Entries are keyed by (kind, sf_dir) and guarded by the owning
# SparkContext id: a stale entry from a stopped session is dropped
# (best-effort unpersist) and rebuilt.  The cache is LRU-BOUNDED:
# long-lived sessions that sweep many corpora (pytest tmp dirs, a
# server switching datasets) evict + unpersist the oldest entries
# instead of pinning executor memory without bound.  Builds are EAGER
# (count() right after persist): a lazily-persisted table whose first
# action is a self-join can run its build pipeline once per join side
# before the cache populates — the measured double-Arrow-scan race the
# old per-call count() barrier guarded against.
# ---------------------------------------------------------------------------

import os  # noqa: E402
import threading  # noqa: E402
from collections import OrderedDict  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402, F811
from pyspark.sql.types import StructField, StructType  # noqa: E402

# key = (kind, sf_dir, str(storage_level)); value = (session, corpus
# fingerprint, persisted DataFrame)
_ASSET_CACHE: OrderedDict[
    tuple[str, str, str], tuple[str, str, DataFrame]
] = OrderedDict()
_ASSET_CACHE_MAX = 64
_ASSET_LOCK = threading.Lock()


def _corpus_fingerprint(sf_dir: str) -> str:
    """Cheap invalidation token for a corpus directory: name + mtime of
    its top-level entries.  Rewriting a table (tests overwriting tmp
    parquet, incremental ingest) changes file or directory mtimes, so
    stale persisted assets are rebuilt instead of silently served.
    Cost: one readdir + ~10 stats per cache probe."""
    try:
        with os.scandir(sf_dir) as it:
            parts = sorted(
                f"{e.name}:{e.stat().st_mtime_ns}" for e in it
            )
        return ";".join(parts)
    except OSError:
        return "<unreadable>"


def _evict_cached(kind: str, sf_dir: str) -> None:
    """Drop (and unpersist) every cached asset for (kind, sf_dir),
    whatever storage level it was persisted at.  Test/probe hook —
    production code never evicts; the LRU bound does."""
    with _ASSET_LOCK:
        victims = [
            k for k in _ASSET_CACHE if k[0] == kind and k[1] == sf_dir
        ]
        hits = [_ASSET_CACHE.pop(k) for k in victims]
    for _, _, df in hits:
        try:
            df.unpersist()
        except Exception:
            pass


def _cached_persisted(
    spark: SparkSession, sf_dir: str, kind: str, build, storage_level=None
) -> DataFrame:
    # storage_level is part of the key: two callers sharing a kind but
    # asking for different levels must not silently reuse whichever
    # DataFrame was persisted first at the wrong level (round-13 advice
    # fix; in practice each kind has one canonical level, so this never
    # duplicates work — it just makes the contract explicit).
    key = (kind, sf_dir, str(storage_level))
    sess = spark.sparkContext.applicationId
    fp = _corpus_fingerprint(sf_dir)
    with _ASSET_LOCK:
        hit = _ASSET_CACHE.get(key)
        if hit is not None:
            owner, owner_fp, df = hit
            if owner == sess and owner_fp == fp:
                _ASSET_CACHE.move_to_end(key)
                return df
            # stale session or rewritten corpus: drop and rebuild
            try:
                df.unpersist()
            except Exception:
                pass
            del _ASSET_CACHE[key]
    # build OUTSIDE the lock (Spark jobs run here; holding the lock
    # would serialize unrelated corpora behind one build)
    df = build().persist(storage_level) if storage_level else build().persist()
    df.count()  # eager populate: exactly one build execution
    with _ASSET_LOCK:
        race = _ASSET_CACHE.get(key)
        if race is not None and race[0] == sess and race[1] == fp:
            # another thread built concurrently; keep theirs
            try:
                df.unpersist()
            except Exception:
                pass
            return race[2]
        _ASSET_CACHE[key] = (sess, fp, df)
        while len(_ASSET_CACHE) > _ASSET_CACHE_MAX:
            _, (_, _, old) = _ASSET_CACHE.popitem(last=False)
            try:
                old.unpersist()
            except Exception:
                pass
    return df


# ---------------------------------------------------------------------------
# Distributed rank over a (count DESC) total order.  The last two
# rank-over-aggregate consumers (text_zipf_fit's vocabulary rank,
# events_pareto_share's user-activity rank) used
# row_number().over(Window.orderBy(...)) — a single-partition funnel
# whose input grows with the corpus (vocabulary / user base, easily
# 1e8-1e9 at 100 TB).  This helper computes the exact same rank (and
# running total) with only keyed exchanges, generalizing the PPS
# bucketed prefix-sum (pipeline_ops.py sample_systematic_pps):
#
#   1. histogram: group items by exact count n -> m_n items per value
#      (sqrt-of-corpus sized);
#   2. distributed prefix over the histogram in n-DESC order: bucket by
#      floor(log2(n)) (<= 64 range buckets of the DESC order), window
#      per bucket, per-bucket totals (<= 64 rows, bounded driver
#      metadata) prefix-summed on the driver and broadcast back ->
#      every count value n gets its start rank s_n and start running
#      total c_n;
#   3. tie-group numbering: items sharing n need distinct indexes
#      1..m_n but NO particular order (callers must be tie-order
#      invariant); hash items into `sub_buckets` sub-buckets, window
#      per (n, sub-bucket) — each task sees ~m_n/sub_buckets rows even
#      for the heaviest tie group (the Zipfian freq=1 half-vocabulary).
#
# rk = s_n + i is a bijection onto 1..N consistent with n DESC, and
# cum = c_n + i*n is the exact running sum of n over ranks 1..rk.
# Any per-rank or per-tie-group aggregate downstream (log-rank moment
# sums, decile counts/shares) is invariant to the within-tie
# assignment, so oracle parity with ORDER BY n DESC, item holds.
# ---------------------------------------------------------------------------


def ranked_by_count_desc(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build_per_item,
    item_col: str,
    n_col: str,
    *,
    sub_buckets: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Return ``(ranked, n_items, total)`` where ``ranked`` carries
    ``item_col, n_col, rk, cum`` (see block comment above; ``n_col``
    must be a positive integral count) and ``n_items``/``total`` are
    the global item count and count sum (driver scalars, read from the
    <=64 bucket totals — no extra pass).  ``build_per_item`` is a
    zero-arg builder of the (item, count) aggregate; it is materialized
    once via :func:`_cached_persisted` (keyed ``rank_<tag>``) because
    the rank derivation consumes it on four lazy paths (histogram,
    bucket totals, sub-bucket counts, final join) — unpersisted, the
    corpus-wide aggregate would recompute per path."""
    from pyspark.sql import Window

    if sub_buckets is None:
        sub_buckets = 4 * int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    per_item = _cached_persisted(
        spark, sf_dir, f"rank_{tag}", build_per_item
    )
    hist = per_item.groupBy(n_col).agg(F.count("*").alias("m"))
    histb = hist.withColumn(
        "hb", F.floor(F.log2(F.col(n_col))).cast("int")
    )
    wb = (
        Window.partitionBy("hb")
        .orderBy(F.desc(n_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    histp = histb.select(
        n_col,
        "m",
        "hb",
        F.sum("m").over(wb).alias("pm"),
        F.sum(F.col("m") * F.col(n_col)).over(wb).alias("pe"),
    )
    btots = (
        histp.groupBy("hb")
        .agg(F.max("pm").alias("tm"), F.max("pe").alias("te"))
        .collect()
    )
    offs: list[tuple[int, int, int]] = []
    accm = acce = 0
    for r in sorted(btots, key=lambda r: -r["hb"]):
        offs.append((r["hb"], accm, acce))
        accm += r["tm"]
        acce += r["te"]
    off_df = spark.createDataFrame(
        offs, "hb INT, offm BIGINT, offe BIGINT"
    )
    # start rank / start running-total per distinct count value; the
    # distinct-count table is sqrt-of-corpus sized -> broadcast (a
    # shuffle join here would funnel every n=1 item through one
    # reducer, exactly the skew this helper exists to avoid).
    starts = histp.join(F.broadcast(off_df), "hb").select(
        n_col,
        (F.col("offm") + F.col("pm") - F.col("m")).alias("_s"),
        (F.col("offe") + F.col("pe") - F.col("m") * F.col(n_col)).alias(
            "_c"
        ),
    )
    itm = per_item.withColumn(
        "_sb",
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(sub_buckets)).cast(
            "int"
        ),
    )
    sbc = itm.groupBy(n_col, "_sb").agg(F.count("*").alias("_sm"))
    ws = (
        Window.partitionBy(n_col)
        .orderBy("_sb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sb_off = sbc.select(
        n_col,
        "_sb",
        (F.sum("_sm").over(ws) - F.col("_sm")).alias("_soff"),
    )
    wrn = Window.partitionBy(n_col, "_sb").orderBy(item_col)
    idx = F.col("_soff") + F.row_number().over(wrn)
    ranked = (
        itm.join(sb_off, [n_col, "_sb"])
        .join(F.broadcast(starts), n_col)
        .select(
            item_col,
            n_col,
            (F.col("_s") + idx).alias("rk"),
            (F.col("_c") + idx * F.col(n_col)).alias("cum"),
        )
    )
    return ranked, accm, acce


# ---------------------------------------------------------------------------
# Distributed per-group rank over a (score DESC, id ASC) total order.
# The per-language quality windows (text_quality_percentile_cut's
# percent_rank, text_ccnet_buckets' ntile) used
# Window.partitionBy(lang).orderBy(score DESC, id) directly over the
# document corpus — one task per language, so a 90%-English 100-TB
# corpus funnels ~90 TB through a single window task.  The replica
# probe DOES grow this input (unlike the vocabulary funnels), but the
# per-group skew is structural: adding executors never helps the
# dominant group.
#
# This helper computes the exact same per-group row_number with only
# keyed, bounded exchanges — the continuous-score analogue of
# ranked_by_count_desc:
#
#   1. per-group score bounds (lo, hi, n) — a K-row aggregate,
#      broadcast;
#   2. monotone binning: b = floor((score - lo) / width) clamped to
#      [0, nbins) (IEEE subtraction/division/floor are monotone, so
#      b is weakly DESC-consistent with score);
#   3. bin histogram group x nbins (bounded metadata), per-group
#      prefix-sum in b-DESC order (window over the bounded histogram),
#      broadcast start offsets;
#   4. row_number within (group, bin) ordered by (score DESC, id) —
#      each task sees ~group/nbins rows, 3 orders of magnitude below
#      the naive window even for the dominant group.
#
# rk = start_b + i is exactly row_number() OVER (PARTITION BY group
# ORDER BY score DESC, id) — percent_rank / ntile / top-k derive from
# (rk, n) arithmetically.  Pathology bound: a single score value
# holding >> 1/nbins of a group's mass re-concentrates its bin; the
# rescue is one recursion of the same binning on (id) within the hot
# bin, which no caller has needed — documented in SCALE.md.
# ---------------------------------------------------------------------------

# Bounded LRU over the range-partitioned relations the rank primitives
# persist: each call pins one cached relation, and a long session (the
# 303-entry driver gate, bench sample loops) would otherwise accumulate
# them until session end.  The LRU is keyed on the ANALYZED-PLAN
# semantic hash, not object identity, because Spark's CacheManager
# also keys cached relations on the analyzed plan: two handles over
# the identical plan share ONE InMemoryRelation, so unpersisting an
# old handle would silently uncache the relation a newer live entry
# still relies on (the bench's repeated-identical-rank loop hit
# exactly this).  Keying on the plan makes a repeat call a cache HIT
# (move-to-end, no re-persist) and guarantees eviction only ever
# unpersists a plan no live entry holds.
#
# Eviction safety, stated honestly: unpersist does NOT replay shuffle
# files — the next action on an evicted relation re-plans the full
# query, re-running its exchange with freshly sampled boundaries.
# That is still value-safe for every COMPLETED rank (results already
# materialized) and for every FUTURE call (each call re-derives both
# plan branches from its own freshly persisted relation).  The only
# hazard window is a caller that holds an unevaluated ranked frame
# across > _RP_LRU_MAX subsequent DISTINCT-plan rank calls before
# first evaluation — then its two branches would re-plan separately
# and `_pid` consistency would degrade to exchange reuse.  No caller
# does this (all evaluate within the same operator), and plan-keyed
# dedup means repeat ranking of the same input can never age an
# entry out.
_RP_LRU: "OrderedDict[tuple[str, int], DataFrame]" = OrderedDict()
_RP_LRU_MAX = 8


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """Semantic plan equality via Catalyst's own sameResult (the check
    Spark's CacheManager uses) — guards the 32-bit semanticHash key
    against a collision silently returning the WRONG cached relation
    (wrong ranks, no error).  Falls back to trusting the hash if the
    internal API is unavailable."""
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return True


def _persist_bounded(rp: DataFrame) -> DataFrame:
    try:
        key = (
            rp.sparkSession.sparkContext.applicationId,
            rp.semanticHash(),
        )
    except Exception:
        key = ("<nohash>", id(rp))
    with _ASSET_LOCK:
        hit = _RP_LRU.get(key)
        if hit is not None:
            _RP_LRU.move_to_end(key)
    if hit is not None:
        if _same_plan(hit, rp):
            return hit
        # semanticHash collision (~2^-32 per pair): persist fresh and
        # leave the cache entry alone — the colliding plan may still
        # have live holders; this call just pays one uncached persist.
        return rp.persist()
    rp = rp.persist()
    evicted: list[DataFrame] = []
    with _ASSET_LOCK:
        race = _RP_LRU.get(key)
        if race is not None and _same_plan(race, rp):
            # concurrent insert of the same plan: persist() above pinned
            # the SAME InMemoryRelation, so returning the racer needs no
            # compensating unpersist.
            _RP_LRU.move_to_end(key)
            return race
        if race is not None:
            # hash collision raced in first: keep ours uncached.
            return rp
        _RP_LRU[key] = rp
        while len(_RP_LRU) > _RP_LRU_MAX:
            _, old = _RP_LRU.popitem(last=False)
            evicted.append(old)
    for old in evicted:
        try:
            old.unpersist()
        except Exception:
            pass
    return rp


def clear_cached_assets() -> None:
    """Unpersist and forget every memoized asset and ranked-relation
    LRU entry.  bench.py calls this BETWEEN measurement sections
    (r15): once the sf0.1 headline+annex pass ends, its ~60 persisted
    assets are dead weight, and leaving them resident in the shared
    local-mode heap squeezed the compute-bound passes that follow —
    measured sample_dsir_resample at 4.4x its pipeline_scale pin from
    storage pressure alone, and the SF1 pass's broadcast build died
    with "Not enough memory to build and broadcast".  Safe at any
    section boundary: no caller holds an unevaluated ranked frame
    across sections (see _persist_bounded's eviction contract), and a
    cleared asset simply rebuilds on next use."""
    with _ASSET_LOCK:
        dfs = [df for (_, _, df) in _ASSET_CACHE.values()]
        dfs += list(_RP_LRU.values())
        _ASSET_CACHE.clear()
        _RP_LRU.clear()
    for df in dfs:
        try:
            df.unpersist()
        except Exception:
            pass


def ranked_by_range_sort(
    df: DataFrame,
    group_col: str,
    order_cols: tuple[str, ...],
    *,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact per-group ``rn`` = row_number() OVER (PARTITION BY
    ``group_col`` ORDER BY ``*order_cols``) without a per-group window
    over the data — the third distributed-rank form, for ARBITRARY
    (incl. string) sort keys where score-histogram binning
    (ranked_by_score_desc) doesn't apply:

      1. repartitionByRange(group, *order) — Spark samples range
         boundaries, so partitions are balanced regardless of group
         skew, and partition id order IS global sort order;
      2. per-(group, partition) counts -> per-group prefix offsets in
         partition order (a bounded groups x partitions table,
         broadcast);
      3. local row_number within (group, partition) + offset.

    Exact for ANY sampled boundaries — balance affects speed, never
    values.  `_pid` consistency between the offsets branch and the
    probe branch is guaranteed by materializing the range-partitioned
    relation ONCE (persist below): both consumers scan the same cached
    relation, so its single exchange cannot be re-planned/re-sampled
    into two shuffles with different boundaries (which would silently
    mis-rank if `spark.sql.exchange.reuse` were off or AQE re-planned
    one branch).  The broadcast build side populates the cache before
    the probe stage runs.  Eviction is NOT shuffle-replay-safe:
    unpersisting re-plans the exchange with freshly sampled boundaries
    (see _persist_bounded's honest statement) — value safety holds
    because every caller evaluates its ranked frame before
    _RP_LRU_MAX further distinct-plan rank calls, never holding an
    unevaluated frame across evictions.  Hypothesis-tested against a
    pure-Python model."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rp = _persist_bounded(
        df.repartitionByRange(n_parts, group_col, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    wo = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        rp.groupBy(group_col, "_pid")
        .agg(F.count("*").alias("_m"))
        .select(
            group_col,
            "_pid",
            F.coalesce(F.sum("_m").over(wo), F.lit(0)).alias("_off"),
        )
    )
    wl = Window.partitionBy(group_col, "_pid").orderBy(*order_cols)
    return (
        rp.join(F.broadcast(offs), [group_col, "_pid"])
        .withColumn("rn", F.col("_off") + F.row_number().over(wl))
        .drop("_pid", "_off")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_cols: tuple[str, ...],
    w_col: str,
    *,
    out_col: str = "cum",
    n_parts: int | None = None,
) -> DataFrame:
    """Exact per-group running sum of ``w_col`` over ``*order_cols`` —
    sum(w) OVER (PARTITION BY group ORDER BY order ROWS UNBOUNDED
    PRECEDING) — without a per-group window over the data: the
    range-partitioned twin of :func:`ranked_by_range_sort` (sampled
    balanced ranges + per-(group, partition) totals broadcast as
    offsets + local cumsum).  A plain per-source window funnels each
    source's whole slice of the corpus through one task; this stays
    partition-parallel for any group skew.  The range-partitioned
    relation is persisted so both plan branches read ONE exchange —
    see :func:`ranked_by_range_sort` for why `_pid` consistency must
    not depend on exchange reuse."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rp = _persist_bounded(
        df.repartitionByRange(n_parts, group_col, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    wo = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        rp.groupBy(group_col, "_pid")
        .agg(F.sum(w_col).alias("_m"))
        .select(
            group_col,
            "_pid",
            F.coalesce(F.sum("_m").over(wo), F.lit(0)).alias("_off"),
        )
    )
    wl = (
        Window.partitionBy(group_col, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rp.join(F.broadcast(offs), [group_col, "_pid"])
        .withColumn(out_col, F.col("_off") + F.sum(w_col).over(wl))
        .drop("_pid", "_off")
    )


def bucketed_prefix_sum(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build_weighted,
    bkt_col: str,
    order_cols: tuple[str, ...],
    w_col: str,
) -> tuple[DataFrame, int]:
    """Exact distributed prefix sum of ``w_col`` over the global
    (``bkt_col`` ASC, ``*order_cols``) order — the PPS pattern
    (sample_systematic_pps), factored out so hypothesis can drive it
    with random multisets: per-bucket running sums under a
    bucket-keyed window, then per-bucket totals (bounded driver
    metadata) prefix-summed on the driver and broadcast back as
    offsets.  Returns ``(df + cw, grand_total)``.  Correct for ANY
    bucketing that range-partitions the order (bucket ids sorted
    asc == order prefix), including gapped/empty bucket ids; the
    within-bucket window is parallel across buckets and the plan has
    no SinglePartition exchange (plan-asserted via
    sample_systematic_pps)."""
    from pyspark.sql import Window

    def build() -> DataFrame:
        wb = (
            Window.partitionBy(bkt_col)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return build_weighted().withColumn(
            "_pcw", F.sum(w_col).over(wb)
        )

    part_cum = _cached_persisted(spark, sf_dir, tag, build)
    # Bucket totals via sum(w) on the base column — NOT max(_pcw),
    # which equals the total only for non-negative weights (a running
    # max != the final cumsum once w can be negative).
    tot_agg = part_cum.groupBy(F.col(bkt_col).alias("b")).agg(
        F.sum(w_col).alias("tot")
    )
    btot = {r["b"]: r["tot"] for r in tot_agg.collect()}
    total = sum(btot.values())
    # The accumulator must match the weight-sum dtype: PySpark schema
    # verification rejects a Python int where the offsets column is
    # DoubleType (_acceptable_types[DoubleType] == (float,)) and a
    # float where it is DecimalType (_acceptable_types[DecimalType] ==
    # (decimal.Decimal,)) — so branch on the concrete type, not
    # FractionalType, which matches BOTH.  collect() already returns
    # Decimal for decimal sums, so Decimal + Decimal stays exact.
    import decimal

    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    tot_t = tot_agg.schema["tot"].dataType
    if isinstance(tot_t, DecimalType):
        acc: object = decimal.Decimal(0)
    elif isinstance(tot_t, (FloatType, DoubleType)):
        acc = 0.0
    else:
        acc = 0
    offs = []
    for b in sorted(btot):
        offs.append((b, acc))
        acc += btot[b]
    # Offsets schema mirrors the actual bucket/weight-sum types so the
    # helper works for any bucket dtype and fractional weights, not
    # just int buckets with integer weights.
    off_df = spark.createDataFrame(
        offs,
        StructType(
            [
                StructField(bkt_col, part_cum.schema[bkt_col].dataType),
                StructField("_off", tot_agg.schema["tot"].dataType),
            ]
        ),
    )
    out = (
        part_cum.join(F.broadcast(off_df), bkt_col)
        .withColumn("cw", F.col("_pcw") + F.col("_off"))
        .drop("_pcw", "_off")
    )
    return out, total


def ranked_by_score_desc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    *,
    nbins: int = 1024,
) -> DataFrame:
    """Return ``df`` plus ``rk`` (exact per-group row_number in
    (score DESC, id ASC) order) and ``n_grp`` (the group's row count),
    computed without any data-sized window partition.  NULL scores
    are routed to a sentinel bin (-1) that sorts after every real bin
    in the DESC prefix, matching row_number() OVER (ORDER BY score
    DESC) default nulls-last semantics — without the sentinel,
    floor(NULL) would fall through F.least into the TOP bin."""
    from pyspark.sql import Window

    stats = df.groupBy(group_col).agg(
        F.min(score_col).alias("_lo"),
        F.max(score_col).alias("_hi"),
        F.count("*").alias("n_grp"),
    )
    width = (F.col("_hi") - F.col("_lo")) / float(nbins)
    b = (
        F.when(F.col(score_col).isNull(), F.lit(-1))
        .when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(score_col) - F.col("_lo")) / width),
                F.lit(nbins - 1),
            )
        )
        .cast("int")
    )
    binned = df.join(F.broadcast(stats), group_col).withColumn("_b", b)
    hist = binned.groupBy(group_col, "_b").agg(F.count("*").alias("_m"))
    wh = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("_b"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    starts = hist.select(
        group_col,
        "_b",
        (F.sum("_m").over(wh) - F.col("_m")).alias("_start"),
    )
    wrn = Window.partitionBy(group_col, "_b").orderBy(
        F.desc(score_col), id_col
    )
    return (
        binned.join(F.broadcast(starts), [group_col, "_b"])
        .withColumn("rk", F.col("_start") + F.row_number().over(wrn))
        .drop("_b", "_lo", "_hi", "_start")
    )
