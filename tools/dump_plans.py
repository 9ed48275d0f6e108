"""Regenerate PLANS.md: formatted physical plans for flagship queries
with the properties each plan must exhibit.  Run:

    PYTHONPATH=/root/repo python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, what the plan must show)
FLAGSHIPS = [
    (
        "tpch_q1",
        "Single scan, no join; partial/final hash aggregate (map-side "
        "combine carries 6-group partials); split-long deterministic "
        "sums stay in whole-stage codegen.",
    ),
    (
        "tpch_q9",
        "Star join: nation broadcasts (BroadcastHashJoin) — the "
        "lineitem side never shuffles for dimension joins; only the "
        "fact-fact joins exchange on keys.",
    ),
    (
        "tpch_q18",
        "Big-big join: groupBy(l_orderkey) partial aggregation runs "
        "BEFORE the orders join, so the exchange carries order-level "
        "sums, not line items.",
    ),
    (
        "dedup_minhash_lsh",
        "Arrow-batched signature stage (ArrowEvalPython, one per scan "
        "— no explode before it); signature-first replica collapse "
        "(only (fp, sig) rows shuffle, never text); band self-join "
        "keyed on (band_id, key) — a shuffled hash join, never "
        "cartesian; verdicts fan back out to replicas by two "
        "fingerprint-keyed joins.",
    ),
    (
        "text_bm25_topk",
        "Corpus stats reduce to one broadcast row "
        "(BroadcastNestedLoopJoin on a 1-row side is the broadcast "
        "scalar pattern); final top-k is TakeOrderedAndProject, no "
        "global sort.",
    ),
    (
        "pipeline_pretraining_e2e",
        "Cheap per-row gates precede every wide stage; InMemoryTableScan "
        "shows the materialized survivor set feeding both the "
        "decontamination branch and the anti-join; benchmark shingle "
        "set broadcasts.",
    ),
    (
        "text_dsir_importance",
        "The 512-row hashed-unigram model is a memoized asset "
        "(InMemoryTableScan, round 10) on the build side of a "
        "BroadcastHashJoin — the exploded token stream never shuffles "
        "for scoring, and steady-state calls skip the model-training "
        "pass; the only exchange left is the per-doc rollup with "
        "partial aggregation.",
    ),
    (
        "ml_knn_eval",
        "Two-phase distributed kNN (round 10): one MapInPandas over "
        "the train scan with NO exchange below it (the bounded test "
        "batch ships in the Arrow pass's closure); each partition "
        "emits its local top-k, so the only exchanges are the tiny "
        "candidate merge window and the vote rollups.",
    ),
    (
        "events_scd2_history",
        "One Exchange hashpartitioning(user_id): the lag filter, "
        "row_number, and lead windows all share the same partitioning "
        "and sort order.",
    ),
    (
        "sample_systematic_pps",
        "Distributed prefix-sum: the cumulative window partitions on "
        "the hash bucket (Exchange hashpartitioning(bkt...)), never "
        "Exchange SinglePartition; per-bucket offsets come back as a "
        "BroadcastHashJoin on a bucket-count-sized side.",
    ),
    (
        "dedup_semdedup",
        "Within-cell pair join runs over the InMemoryTableScan of the "
        "collapsed (cell, embedding) representatives — replica members "
        "never enter the quadratic stage; rep verdicts fan out with "
        "one join on the cluster key.",
    ),
    (
        "graph_pagerank",
        "Rounds iterate on the cluster-level weighted edge list "
        "(localCheckpoint cuts lineage per round): each round is one "
        "src-keyed join + one dst-keyed partial/final aggregate; the "
        "member fan-out join happens once, after the last round.",
    ),
    (
        "text_zipf_fit",
        "Distributed count-desc rank (round 6): the vocabulary rank is "
        "log2-bucketed histogram prefix + hash-sub-bucketed tie "
        "numbering — every Window is keyed; the only SinglePartition "
        "Exchange is the final 5-value moment merge (one partial row "
        "per partition).  Start-rank/offset joins broadcast.",
    ),
    (
        "events_pareto_share",
        "Same distributed rank shape for the user-activity ranking; "
        "the decile rollup is a keyed aggregate — no user-base-sized "
        "single-partition Sort/Window anywhere.",
    ),
    (
        "ml_knn_eval_ivf",
        "Bucketed eval (round 10 shape): cell pruning happens INSIDE "
        "the local-top-k Arrow pass (probe map in the closure, "
        "computed driver-side from the centroid asset) — no cell-keyed "
        "exchange, no probe-batch broadcast join; the train scan stays "
        "partition-parallel and only candidates shuffle.",
    ),
    (
        "ann_ivf_incremental_upsert",
        "Index upsert probe (round 6): base centroids, base assignment "
        "and delta-only assignment are three InMemoryTableScans "
        "(memoized assets); the probe is a broadcast left-semi join of "
        "the two nearest cells against the assignment union; final "
        "top-k is TakeOrderedAndProject.",
    ),
    (
        "ann_nsw_graph_search",
        "Graph ANN probe (round 6): the memoized edge table is an "
        "InMemoryTableScan; beam hops are BroadcastHashJoins of the "
        "bounded frontier against edges; final re-rank is "
        "TakeOrderedAndProject.  The (replica-collapsed) build pairs "
        "DISTINCT vectors only — every member-level stage is a keyed "
        "join against <= M+1-row per-class lists, no cartesian.",
    ),
    (
        "text_oov_rate",
        "The (lang, token) count table is a memoized asset (round 13: "
        "InMemoryTableScan, no per-call corpus re-scan); the top-K "
        "vocabulary derives from it via TakeOrdered and probes back "
        "as a BroadcastHashJoin — both sides of the final rollup are "
        "vocab-sized, the corpus is scanned zero times on cache hits.",
    ),
    (
        "dedup_duplicate_ngram_spans",
        "The >1-occurrence gram index is the memoized asset (round "
        "13: InMemoryTableScan behind a Filter(n_occ > 1)); the gram "
        "stream re-derives lazily map-side (ArrowEvalPython before "
        "any exchange) and joins the index broadcast/keyed on the "
        "8-byte hash — singleton grams never reach the join, text "
        "never shuffles, and the only exchanges are the doc rollup "
        "partials.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from risinglight_spark.registry import collect
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", shuffle_partitions=8)
    entries = collect()
    out = [
        "# PLANS — flagship physical plans (generated by tools/dump_plans.py)",
        "",
        "Each section states the property the plan must exhibit (enforced "
        "in tests/test_plans.py where assertable) followed by "
        "`explain('formatted')` output at sf0.01.",
        "",
    ]
    for name, claim in FLAGSHIPS:
        df = entries[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", claim, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(FLAGSHIPS)} plans)")


if __name__ == "__main__":
    main()
