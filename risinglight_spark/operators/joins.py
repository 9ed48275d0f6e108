"""Join operators: hash (inner/left/right/full), semi/anti (+ residual
condition), nested-loop theta, sort-merge.

Reference executors: src/executor/hash_join.rs:13-209,
nested_loop_join.rs:14-162, merge_join.rs:10-108; plan nodes
src/planner/mod.rs:110-112.

Scale notes:
- Dimension sides (nation/region, and customer at moderate SF) fit the
  broadcast threshold, so star joins become BroadcastHashJoin: zero
  shuffle of the fact table.  Verified in tests/test_plans.py.
- Big-big joins (orders x lineitem) shuffle both sides on the key; AQE
  converts to broadcast at runtime when one side turns out small and
  splits skewed partitions.  ``hint('merge')`` pins SortMergeJoin where
  we explicitly want the merge-join surface.
- Semi/anti joins never materialize the probe payload — Spark's
  LeftSemi/LeftAnti are the exact analogue of the reference's
  HashSemiJoinExecutor (hash_join.rs:107-209).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risinglight_spark.operators import Tables
from risinglight_spark.registry import register


@register(
    "join_inner_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
    doc="Equi hash join, inner (ref: hash_join.rs:13-105).",
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_totalprice") > 400000)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .select("o_orderkey", "o_totalprice", "c_custkey", "c_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    """,
    doc="Left outer hash join with an extra join-side predicate "
    "(stays in the ON clause, not a post-filter).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_totalprice") > 450000
    )
    return t.customer.join(t.orders, cond, "left").select("c_custkey", "o_orderkey")


@register(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM orders RIGHT JOIN customer
      ON c_custkey = o_custkey AND o_totalprice > 450000
    """,
    doc="Right outer join (ref: hash_join.rs const-generic JoinType).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_totalprice") > 450000
    )
    return t.orders.join(t.customer, cond, "right").select("c_custkey", "o_orderkey")


@register(
    "join_full_outer",
    oracle="""
    SELECT n_nationkey, n_name, s_suppkey
    FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
    """,
    doc="Full outer join; some nations have no supplier at small SF so "
    "both null sides are exercised.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.nation.join(
        t.supplier, F.col("n_nationkey") == F.col("s_nationkey"), "full"
    ).select("n_nationkey", "n_name", "s_suppkey")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="Left semi hash join (ref: hash_join.rs:107 HashSemiJoinExecutor); "
    "residual condition inside the join (variant 2, hash_join.rs:142).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_totalprice") > 400000
    )
    return t.customer.join(t.orders, cond, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="Left anti hash join (ref: nested_loop_join.rs:103-162 Anti arm).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_totalprice") > 400000
    )
    return t.customer.join(t.orders, cond, "left_anti").select("c_custkey", "c_name")


@register(
    "join_nl_theta",
    oracle="""
    SELECT r_regionkey, n_nationkey
    FROM region JOIN nation ON r_regionkey < n_regionkey
    """,
    doc="Pure theta join -> BroadcastNestedLoopJoin (ref: "
    "nested_loop_join.rs:14-101; executor supports inner+left only — "
    "same subset exercised here).",
)
def join_nl_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.region.join(
        t.nation, F.col("r_regionkey") < F.col("n_regionkey"), "inner"
    ).select("r_regionkey", "n_nationkey")


@register(
    "join_hash_residual",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_totalprice
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_extendedprice > o_totalprice * 0.3
    """,
    doc="Equi keys + non-equi residual: Catalyst splits the conjunction "
    "into hash keys and a post-probe filter, exactly like the reference "
    "rule (planner/rules/plan.rs:145-202).",
)
def join_hash_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_extendedprice") > F.col("o_totalprice") * 0.3
    )
    return t.lineitem.join(t.orders, cond).select(
        "l_orderkey", "l_linenumber", "o_totalprice"
    )


@register(
    "merge_join",
    oracle="""
    SELECT o_orderkey, count(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderkey
    """,
    doc="Sort-merge join pinned via hint('merge') (ref: merge_join.rs:10-108). "
    "Both sides shuffle+sort on the key; the downstream per-key count "
    "reuses that clustering (no second shuffle).",
)
def merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderstatus") == "F")
        .hint("merge")
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_lines"))
    )


@register(
    "join_nl_semi",
    oracle="""
    -- semi rendered as DISTINCT join: DuckDB 1.0 mis-evaluates
    -- correlated EXISTS with two correlated inequality conjuncts.
    SELECT DISTINCT n.n_nationkey, n.n_name
    FROM nation n JOIN region r
      ON r.r_regionkey > n.n_nationkey / 2.0
         AND r.r_name <> n.n_name
    """,
    doc="Nested-loop SEMI join with a pure non-equi condition "
    "(reference: nested_loop_join.rs supports arbitrary predicates for "
    "semi/anti).  No equi key -> Spark picks BroadcastNestedLoopJoin "
    "LeftSemi; correct only because one side is a broadcastable dim.",
)
def join_nl_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("r_regionkey") > F.col("n_nationkey") / 2.0) & (
        F.col("r_name") != F.col("n_name")
    )
    return t.nation.join(t.region, cond, "left_semi").select(
        "n_nationkey", "n_name"
    )


@register(
    "join_nl_anti",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey NOT IN (
      SELECT n.n_nationkey
      FROM nation n JOIN region r
        ON r.r_regionkey > n.n_nationkey / 2.0
           AND r.r_name <> n.n_name)
    """,
    doc="Nested-loop ANTI join, the complement of join_nl_semi "
    "(nested_loop_join.rs:14-162; tests/sql/join_semi_anti.slt).",
)
def join_nl_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (F.col("r_regionkey") > F.col("n_nationkey") / 2.0) & (
        F.col("r_name") != F.col("n_name")
    )
    return t.nation.join(t.region, cond, "left_anti").select(
        "n_nationkey", "n_name"
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_spent
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Co-located join via bucketed tables: both sides written "
    "bucketBy(8, join key) + sortBy, so the join needs NO exchange — "
    "each bucket pair joins in place (plan-asserted in "
    "tests/test_plans.py).  At 100 TB this is how a fact-fact join "
    "avoids re-shuffling terabytes on every run: pay the bucketed "
    "write once, join shuffle-free forever after.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    t = Tables(spark, sf_dir)
    loc = tempfile.mkdtemp(prefix="rl_bucketed_")
    for name, df, key in (
        ("rl_b_customer", t.customer.select("c_custkey", "c_name"), "c_custkey"),
        ("rl_b_orders", t.orders.select("o_custkey", "o_totalprice"), "o_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{loc}/{name}")
            .saveAsTable(name)
        )
    c = spark.table("rl_b_customer")
    o = spark.table("rl_b_orders")
    return (
        c.hint("merge")
        .join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_cross_tiny",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Deliberate CROSS JOIN of the two constant-size dims (5 x 25 "
    "rows) — the one place a cartesian product is legitimate.  Any "
    "cartesian over a FACT table is a bug (asserted absent in "
    "tests/test_plans.py); dim x dim is bounded at any SF.",
)
def join_cross_tiny(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.region.select("r_name").crossJoin(t.nation.select("n_name"))


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) o
    WHERE c.c_custkey < 100
    """,
    doc="LATERAL correlated subquery: top-2 orders per customer.  "
    "Catalyst decorrelates this to a ranked window over the "
    "customer-keyed join — no per-row re-execution (the reference "
    "executes apply operators row-at-a-time; Spark rewrites them "
    "set-oriented).",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.operators import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice
               FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               LIMIT 2
             ) o
        WHERE c.c_custkey < 100
        """
    )


# -- explicit bloom-prefiltered semi join ------------------------------------

BLOOM_BITS = 1 << 16  # m: 64 Ki bits -> 1 KiB of longs, broadcastable
BLOOM_SEEDS = (42, 77, 1337)  # k = 3 hash functions


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_linestatus, count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_linestatus
    """,
    doc="Semi join with an explicit pre-shuffle Bloom prefilter — the "
    "technique Spark's runtime-filter rule injects for shuffle joins, "
    "built from first principles so the plan is visible and tunable: "
    "the build side's keys hash (3 seeded xxhash64s) into a 64 Ki-bit "
    "bitmap stored as a word->bits map (bit_or aggregate, ~1 KiB), "
    "broadcast to the probe side, which drops non-members before the "
    "shuffle; the exact semi join then removes Bloom false positives, "
    "so the result is exactly the plain semi join (the oracle).  At "
    "100 TB this is the difference between shuffling the full probe "
    "table and shuffling the ~selectivity fraction that can match; "
    "the bitmap stays KB-sized regardless of probe-side scale.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    keys = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )

    def positions(key):
        return F.array(
            *[
                F.pmod(F.xxhash64(key, F.lit(s)), F.lit(BLOOM_BITS))
                for s in BLOOM_SEEDS
            ]
        )

    bitmap = (
        keys.select(F.explode(positions(F.col("o_orderkey"))).alias("pos"))
        .distinct()
        .selectExpr("shiftright(pos, 6) AS w", "shiftleft(1L, pos & 63) AS bit")
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bm")
        )
    )
    probe = t.lineitem.select("l_orderkey", "l_linestatus")
    cond_sql = " AND ".join(
        f"(coalesce(element_at(bm, shiftright(p{i}, 6)), 0L)"
        f" & shiftleft(1L, p{i} & 63)) != 0"
        for i in range(len(BLOOM_SEEDS))
    )
    prefiltered = (
        probe.crossJoin(F.broadcast(bitmap))
        .selectExpr(
            "*",
            *[
                f"pmod(xxhash64(l_orderkey, {s}), {BLOOM_BITS}) AS p{i}"
                for i, s in enumerate(BLOOM_SEEDS)
            ],
        )
        .filter(F.expr(cond_sql))
    )
    exact = prefiltered.join(
        keys, prefiltered.l_orderkey == keys.o_orderkey, "left_semi"
    )
    return exact.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )


@register(
    "join_null_safe_eq",
    oracle="""
    SELECT a.n_nationkey AS a_key, b.n_nationkey AS b_key
    FROM nation a JOIN nation b
      ON nullif(a.n_nationkey % 7, 0) IS NOT DISTINCT FROM
         nullif(b.n_nationkey % 7, 0)
    """,
    doc="Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of vanishing — the semantics SQL "
    "dimension merges need for unknown keys.  Catalyst plans <=> as a "
    "hash join key (null-safe equality is still hashable), so this "
    "stays a keyed join, not a nested loop.",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.nation.select(F.col("n_nationkey").alias("a_key"))
    b = t.nation.select(F.col("n_nationkey").alias("b_key"))
    cond = F.nullif(F.col("a_key") % 7, F.lit(0)).eqNullSafe(
        F.nullif(F.col("b_key") % 7, F.lit(0))
    )
    return a.join(b, cond)


@register(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n,
           (CAST(sum(CAST(round(CAST(e.value AS DOUBLE) * 100000000.0, 0)
                AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Salted shuffle join for skewed fact keys: the fact side gets "
    "a uniform salt in [0,8), the dimension side is replicated 8x "
    "(one copy per salt), and the join runs on (key, salt) — any hot "
    "key's rows now land on 8 reducers instead of 1.  SHUFFLE_HASH "
    "hint keeps it a shuffle join so the pattern is actually "
    "exercised (a broadcast would make salting moot — and when the "
    "dim fits in memory broadcast IS the better answer; salting is "
    "for the big-big case).  This is the manual fallback when AQE's "
    "skew-join split can't kick in (e.g. skew appears after a "
    "map-side transform); the oracle is the unsalted join — identical "
    "results, fixed-point sums making them hash-equal.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    t = Tables(spark, sf_dir)
    fact = t.events.select(
        "user_id",
        "value",
        F.pmod(F.hash("event_id"), F.lit(n_salt)).alias("salt"),
    )
    dim = (
        t.customer.select("c_custkey", "c_mktsegment")
        .crossJoin(
            spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
        )
        .hint("SHUFFLE_HASH")
    )
    joined = fact.join(
        dim,
        (fact.user_id == dim.c_custkey) & (fact.salt == dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        (
            F.sum(
                F.round(F.col("value").cast("double") * 1e8, 0).cast("long")
            ).cast("double")
            / F.lit(1e8)
        ).alias("sum_value"),
    )


@register(
    "join_dpp_partition_pruned",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE event_type IN ('view', 'click')
    GROUP BY event_type
    """,
    doc="Dynamic partition pruning: the fact table is laid out "
    "hive-partitioned by event_type (copy_partitioned_parquet's "
    "layout), the dimension carries the selective filter, and "
    "Catalyst turns the broadcast join's build-side keys into a "
    "runtime PartitionFilter on the fact scan — only the matching "
    "partition directories are read at all "
    "(tests/test_plans.py::test_dpp_prunes_fact_partitions asserts "
    "the dynamicpruningexpression reaches the scan).  At 100 TB "
    "with date/tenant-partitioned facts this is the difference "
    "between scanning two partitions and scanning the lake; the "
    "filter value never needs to be known at plan time.",
)
def join_dpp_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    loc = os.path.join(tempfile.mkdtemp(prefix="rl_dpp_"), "events_by_type")
    t.events.write.mode("overwrite").partitionBy("event_type").parquet(loc)
    fact = spark.read.parquet(loc)
    dim = spark.createDataFrame(
        [
            ("view", 1),
            ("click", 1),
            ("error", 0),
            ("signup", 0),
            ("purchase", 0),
        ],
        "etype string, wanted int",
    )
    j = fact.join(
        F.broadcast(dim.filter(F.col("wanted") == 1)),
        fact.event_type == dim.etype,
    )
    return j.groupBy("event_type").agg(F.count("*").alias("n"))


# -- fuzzy (edit-distance) entity matching -----------------------------------

FUZZY_MAX_DIST = 1
SNM_WINDOW = 10  # sorted-neighborhood comparison window


@register(
    "join_fuzzy_levenshtein",
    oracle=f"""
    WITH ranked AS MATERIALIZED (
      SELECT c_custkey, c_name, c_nationkey,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_name, c_custkey) AS rn
      FROM customer
    ),
    cand AS (
      SELECT a.c_custkey AS key_a, a.c_name AS name_a,
             a.c_nationkey AS nat, a.rn + k.k AS rn_match
      FROM ranked a,
           (SELECT unnest(generate_series(1, {{w}})) AS k) k
    )
    SELECT c.key_a, b.c_custkey AS key_b,
           levenshtein(c.name_a, b.c_name) AS dist
    FROM cand c
    JOIN ranked b
      ON b.c_nationkey = c.nat AND b.rn = c.rn_match
    WHERE levenshtein(c.name_a, b.c_name) <= {{d}}
    """.format(w=SNM_WINDOW, d=FUZZY_MAX_DIST),
    doc=f"Fuzzy entity matching via the sorted-neighborhood method: "
    "records sort by name within each nation block, and only pairs "
    f"within {SNM_WINDOW} sort positions are verified with "
    f"levenshtein (<= {FUZZY_MAX_DIST}) — candidates are O(n * w), "
    "NEVER the within-block quadratic (the naive block-join version "
    "measured 12.3s at sf0.1; this is sub-second).  SNM is "
    "recall-heuristic by construction — production raises recall with "
    "multi-key passes (name reversed, q-gram keys) of the SAME shape.  "
    "The window join is an equi-join on (block, rank+k): no range "
    "predicate, no skew.  The sort rank itself is the DISTRIBUTED "
    "range-partitioned rank (ranked_by_range_sort) — a plain "
    "per-nation window would funnel entire nation blocks (1/25 of all "
    "customers each) through single tasks at scale.  levenshtein is a "
    "built-in on both engines; ranks pin ties on (name, custkey).",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.operators import (
        _cached_persisted,
        ranked_by_range_sort,
    )

    t = Tables(spark, sf_dir)
    # The sorted-neighborhood BLOCKING INDEX (nation block, name rank)
    # is the memoized mined asset `fuzzy_rank` (r15, guide §5 — the
    # substring_reps / minhash_sig precedent): entity resolution builds
    # its blocking index once per corpus and probes it across runs, so
    # steady state pays the candidate join + banded DP only.  r16
    # (ADVICE r15): the build no longer ends in localCheckpoint —
    # _cached_persisted's persist()+count() already materializes the
    # rank exactly once, and persisted blocks are fully released by
    # clear_cached_assets()/unpersist(), whereas localCheckpoint RDD
    # blocks linger until GC (and are non-replayable on executor
    # loss).  The rank is deterministic (ties pinned on name, custkey),
    # so a block eviction replaying the lineage is value-safe.
    ranked = _cached_persisted(
        spark,
        sf_dir,
        "fuzzy_rank",
        lambda: ranked_by_range_sort(
            t.customer.select("c_custkey", "c_name", "c_nationkey"),
            "c_nationkey",
            ("c_name", "c_custkey"),
        ),
    )
    cand = ranked.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat"),
        "rn",
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW))).alias("k"),
    ).select(
        "key_a",
        "name_a",
        "nat",
        (F.col("rn") + F.col("k")).alias("rn_match"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("rn").alias("rn_b"),
    )
    # Banded DP (r15, guide §1.2 per-task work): the 3-arg levenshtein
    # early-exits once the running minimum exceeds the threshold —
    # O(len * d) instead of O(len²) per pair, measured 8.5 -> 5.8 s on
    # the 2.4M-candidate pipeline_scale verify stage.  It returns -1
    # for pairs beyond the threshold and the TRUE distance otherwise,
    # so kept rows carry exactly the old dist value; computing it once
    # in a projection also stops the filter+select pair evaluating the
    # DP twice.  The DuckDB oracle keeps the plain 2-arg form — same
    # kept pairs, same distances.
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), FUZZY_MAX_DIST)
    return (
        cand.join(
            b,
            (F.col("nat") == F.col("nat_b"))
            & (F.col("rn_match") == F.col("rn_b")),
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("key_a", "key_b", "dist")
    )
