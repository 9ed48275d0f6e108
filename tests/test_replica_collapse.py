"""Equivalence guard for the round-4 replica-collapsed pair miners:
on a corpus with forced exact replicas (including whitespace/case
variants that normalize equal, short unshingleable texts, and NULLs),
the collapsed miners must produce EXACTLY the pair sets of a direct
(no-collapse) formulation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from risinglight_spark.functions import text as T

DOCS = [
    # replica cluster A: 3 exact + 1 case/whitespace variant (same fp)
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "The  quick brown fox jumps over the lazy  DOG"),
    # near-dup of A (one word changed)
    (5, "the quick brown fox leaps over the lazy dog"),
    # replica cluster B: 2 copies of an unrelated text
    (6, "completely different content about spark query engines"),
    (7, "completely different content about spark query engines"),
    # singleton
    (8, "a third topic entirely with no overlap whatsoever here"),
    # short texts (fewer than 3 tokens): replicas but unshingleable
    (9, "hi there"),
    (10, "hi there"),
    # degenerate
    (11, ""),
    (12, None),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("collapse"))
    spark.createDataFrame(
        [(i, t, "en", "src", len(t or "")) for i, t in DOCS],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def _direct_jaccard(spark, sf):
    """The pre-collapse formulation: inverted-index join over EVERY
    document."""
    from risinglight_spark.operators import Tables

    t = Tables(spark, sf)
    docs = t.documents.select(
        "doc_id", T.word_shingles_pandas(3)(F.col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    sh = docs.select("doc_id", F.explode(F.array_distinct("sh")).alias("s"))
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("ns"))
    )
    x, y = sz.alias("x"), sz.alias("y")
    jac = F.col("ns").cast("double") / (
        F.col("x.n") + F.col("y.n") - F.col("ns")
    )
    return (
        shared.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def test_collapsed_jaccard_equals_direct(spark, corpus_dir):
    from risinglight_spark.operators.dedup import dedup_ngram_jaccard

    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in dedup_ngram_jaccard(spark, corpus_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in _direct_jaccard(spark, corpus_dir).collect()
    }
    assert got == want
    # sanity: within-cluster pairs of A = C(4,2) = 6 at jaccard 1.0,
    # cluster B contributes 1, plus cross pairs A x {5}
    ones = {(a, b) for a, b, j in got if j == 1.0}
    assert {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (6, 7)} <= ones
    # short replicas (9, 10) are unshingleable -> never paired
    assert not any(9 in (a, b) or 10 in (a, b) for a, b, _ in got)


def test_collapsed_minhash_covers_replica_pairs(spark, corpus_dir):
    from risinglight_spark.operators.dedup import dedup_minhash_lsh

    got = {
        (r.doc_a, r.doc_b): r.est_sim
        for r in dedup_minhash_lsh(spark, corpus_dir).collect()
    }
    # every within-cluster pair is a candidate with est_sim exactly 1.0
    for pair in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (6, 7)]:
        assert got.get(pair) == 1.0, pair
    # cross-cluster candidates (if banded together) carry the rep pair's
    # signature agreement for every replica combination equally
    cross = {p: s for p, s in got.items() if p[0] <= 4 and p[1] == 5}
    assert len({round(s, 12) for s in cross.values()}) <= 1


def test_multi_signal_keeps_null_and_short_docs(spark, corpus_dir):
    from risinglight_spark.operators.pipeline_ops import dedup_multi_signal

    rows = {r.doc_id: r for r in dedup_multi_signal(spark, corpus_dir).collect()}
    assert set(rows) == {i for i, _ in DOCS}
    # replica clusters collapse to the min id through the exact signal
    for d in (2, 3, 4):
        assert rows[d].keeper == 1 and not rows[d].survives
    assert rows[7].keeper == 6
    # short-text replicas still collapse (exact fingerprint signal)
    assert rows[10].keeper == 9 and rows[9].survives
    # NULL text: kept, self-keeper
    assert rows[12].keeper == 12 and rows[12].survives


# -- round-5: collapsed graph rounds vs direct expanded-graph rounds --------


def _expanded_pairs(spark, sf):
    from risinglight_spark.operators.dedup import dedup_ngram_jaccard

    return dedup_ngram_jaccard(spark, sf).select("doc_a", "doc_b")


def test_collapsed_pagerank_equals_direct(spark, corpus_dir):
    """graph_pagerank (cluster-level rounds, integer multiplicities)
    must equal the direct formulation that iterates over every
    expanded member edge."""
    from risinglight_spark.operators import fpsum
    from risinglight_spark.operators.pipeline_ops import (
        PR_DAMP,
        PR_ITERS,
        graph_pagerank,
    )

    pairs = _expanded_pairs(spark, corpus_dir)
    sym = pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst")
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    edges = sym.join(deg, "src")
    n = edges.select("src").distinct().count()
    r = edges.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0 / n).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = edges.join(r, edges["src"] == r["node"]).select(
            F.col("dst"), (F.col("r") / F.col("deg")).alias("c")
        )
        r = contrib.groupBy("dst").agg(
            (
                F.lit((1.0 - PR_DAMP) / n)
                + F.lit(PR_DAMP) * fpsum(F.col("c"), 1e12)
            ).alias("r")
        ).select(F.col("dst").alias("node"), "r")
    want = sorted(
        (x["doc_id"], x["deg"], x["pagerank"])
        for x in r.join(deg, r["node"] == deg["src"])
        .select(
            F.col("node").alias("doc_id"),
            "deg",
            F.round("r", 12).alias("pagerank"),
        )
        .collect()
    )
    got = sorted(
        (x["doc_id"], x["deg"], x["pagerank"])
        for x in graph_pagerank(spark, corpus_dir).collect()
    )
    assert got == want


def test_collapsed_lpa_equals_direct(spark, corpus_dir):
    from risinglight_spark.operators.pipeline_ops import (
        LPA_ROUNDS,
        graph_label_propagation,
    )

    pairs = _expanded_pairs(spark, corpus_dir)
    e = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        counts = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy(F.col("dst").alias("n2"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = counts.groupBy(F.col("n2").alias("node")).agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label")))
            .getField("label")
            .alias("label")
        )
    want = sorted(
        (x["node"], x["label"]) for x in labels.collect()
    )
    got = sorted(
        (x["doc_id"], x["community"])
        for x in graph_label_propagation(spark, corpus_dir).collect()
    )
    assert got == want


def test_collapsed_triangles_equal_direct(spark, corpus_dir):
    from risinglight_spark.operators.pipeline_ops import graph_triangle_count

    e = _expanded_pairs(spark, corpus_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("x"),
        F.col("e1.b").alias("y"),
        F.col("e2.b").alias("z"),
    )
    tri = wedges.join(
        e3,
        (F.col("e3.a") == F.col("x")) & (F.col("e3.b") == F.col("z")),
        "left_semi",
    )
    members = (
        tri.select(F.col("x").alias("doc_id"))
        .unionAll(tri.select(F.col("y").alias("doc_id")))
        .unionAll(tri.select(F.col("z").alias("doc_id")))
    )
    want = sorted(
        (x["doc_id"], x["n_triangles"])
        for x in members.groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
        .collect()
    )
    got = sorted(
        (x["doc_id"], x["n_triangles"])
        for x in graph_triangle_count(spark, corpus_dir).collect()
    )
    assert got == want


# -- NSW graph build: collapsed member wiring vs direct pair join ------------

# Vector corpus with forced replica classes: identical embeddings share
# (cell, bkt) by construction, so a direct member-level pair join is
# quadratic in class size — the collapsed build must produce EXACTLY
# the same edge set.
_VECS = [
    # class A: 5 exact replicas
    *[(i, [1.0, 0.0, 0.5, -0.25]) for i in (1, 2, 3, 4, 5)],
    # class B: near A (nonzero distance), 3 replicas
    *[(i, [1.0, 0.05, 0.5, -0.25]) for i in (6, 7, 8)],
    # class C: singleton near A/B
    (9, [0.9, 0.0, 0.55, -0.2]),
    # class D: far singleton (likely separate cell/bucket)
    (10, [-1.0, 1.0, -1.0, 1.0]),
    # class E: 2 replicas of another far point
    (11, [-1.0, 0.9, -1.0, 1.0]),
    (12, [-1.0, 0.9, -1.0, 1.0]),
    # 10 more replicas of A with higher ids (exceeds NSW_M so intra
    # wiring alone must fill every A-member's top-M)
    *[(i, [1.0, 0.0, 0.5, -0.25]) for i in range(13, 23)],
    # class F: NaN-containing replicas — distances involving them are
    # NaN (sorts LAST), including to each other; the collapse must
    # reproduce the direct build's ordering, not pin siblings at 0.0
    (23, [float("nan"), 0.0, 0.5, -0.25]),
    (24, [float("nan"), 0.0, 0.5, -0.25]),
]


def test_collapsed_nsw_edges_equal_direct(spark):
    from pyspark.sql import Window

    from risinglight_spark.functions.vector import l2_distance
    from risinglight_spark.operators.vector_search import NSW_M, nsw_edges

    nodes = spark.createDataFrame(
        [
            (vid, [float(x) for x in emb], int(vid % 2), int(vid % 3))
            for vid, emb in _VECS
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT, bkt INT",
    )
    # direct (pre-collapse) formulation: every member pairs with every
    # same-group member
    x, y = nodes.alias("x"), nodes.alias("y")
    d = l2_distance(F.col("x.embedding"), F.col("y.embedding"))
    w = Window.partitionBy("src").orderBy("d", "dst")
    direct = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.vec_id") != F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("src"),
            F.col("y.vec_id").alias("dst"),
            d.alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NSW_M)
        .select("src", "dst")
    )
    want = sorted((r["src"], r["dst"]) for r in direct.collect())
    got = sorted((r["src"], r["dst"]) for r in nsw_edges(nodes).collect())
    assert got == want and len(got) > 0


def test_collapsed_nsw_edges_equal_direct_one_group(spark):
    # production cell/bkt derive from the embedding, so exact replicas
    # ALWAYS co-locate: the one-big-group shape is the quadratic hazard
    # the collapse exists for (class sizes 15/3/1/1/2 here)
    from pyspark.sql import Window

    from risinglight_spark.functions.vector import l2_distance
    from risinglight_spark.operators.vector_search import NSW_M, nsw_edges

    nodes = spark.createDataFrame(
        [(vid, [float(x) for x in emb], 0, 0) for vid, emb in _VECS],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT, bkt INT",
    )
    x, y = nodes.alias("x"), nodes.alias("y")
    d = l2_distance(F.col("x.embedding"), F.col("y.embedding"))
    w = Window.partitionBy("src").orderBy("d", "dst")
    direct = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.vec_id") != F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("src"),
            F.col("y.vec_id").alias("dst"),
            d.alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NSW_M)
        .select("src", "dst")
    )
    want = sorted((r["src"], r["dst"]) for r in direct.collect())
    got = sorted((r["src"], r["dst"]) for r in nsw_edges(nodes).collect())
    assert got == want and len(got) == len(_VECS) * NSW_M
