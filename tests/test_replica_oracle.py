"""Oracle parity on a replica-HEAVY corpus.

The driver fixtures contain no duplicate texts (max fingerprint-cluster
size = 1 at every SF), so the sf0.001/sf0.01 oracle gates never
exercise the exact-replica collapse fan-out with csize >= 2 — that
arithmetic is covered only by Spark-vs-Spark equivalence tests
(test_replica_collapse.py).  This file closes the loop: the collapsed
miners and graph ops must ALSO hash-match DuckDB running the
registered oracle SQL over a corpus where replica clusters of size
2-4, normalize-equal variants, unshingleable shorts, and NULLs all
appear.  The oracle SQL computes over the EXPANDED document set (it
knows nothing of the collapse), so a green row here proves the
collapse + fan-out reproduces the expanded semantics bit-for-bit on
engine-independent data.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from oracle_check import value_hash  # noqa: E402

from risinglight_spark.registry import collect  # noqa: E402

ENTRIES = collect()

DOCS = [
    # cluster A: 3 exact + 1 case/whitespace variant (same fingerprint)
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "The  quick brown fox jumps over the lazy  DOG"),
    # near-dup of A (one word changed) -> cross-cluster edge
    (5, "the quick brown fox leaps over the lazy dog"),
    # cluster B: 2 copies, unrelated
    (6, "completely different content about spark query engines"),
    (7, "completely different content about spark query engines"),
    # near-dup of B -> second cross-cluster edge (B-C), closing no
    # triangle with A
    (8, "completely different content about flink query engines"),
    # singleton with no neighbors
    (9, "a third topic entirely with no overlap whatsoever here"),
    # short replicas (unshingleable)
    (10, "hi there"),
    (11, "hi there"),
    # degenerate
    (12, ""),
    (13, None),
]

REPLICA_QUERIES = (
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_minhash_verified",
    "dedup_exact_keep_best",
    "graph_pagerank",
    "graph_label_propagation",
    "graph_triangle_count",
    "text_gopher_rules",
)


@pytest.fixture(scope="module")
def replica_dir(spark, tmp_path_factory) -> str:
    sf = str(tmp_path_factory.mktemp("replica_oracle"))
    spark.createDataFrame(
        [(i, t, "en", "src", len(t or "")) for i, t in DOCS],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


@pytest.fixture(scope="module")
def replica_oracle(replica_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{replica_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", REPLICA_QUERIES)
def test_replica_corpus_matches_oracle(
    name, spark, replica_dir, replica_oracle
):
    e = ENTRIES[name]
    sdf = e.fn(spark, replica_dir).toPandas()
    odf = replica_oracle.sql(e.oracle).df()
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), f"{name}: hash mismatch"
    # the corpus is built to produce non-trivial output everywhere
    assert len(sdf) > 0, f"{name}: vacuous (empty) comparison"


# -- embeddings with exact-replica vectors ----------------------------------


@pytest.fixture(scope="module")
def replica_emb_dir(spark, tmp_path_factory) -> str:
    import risinglight_spark.operators.dedup as D

    dim = D.DIM
    base = [0.1 * ((i % 7) - 3) for i in range(dim)]
    near = list(base)
    near[0] += 0.05  # high-cosine neighbor of base
    other = [0.1 * ((i % 5) - 2) * (-1) ** i for i in range(dim)]
    rows = [
        (1, base, 0),
        (2, base, 0),   # exact replica
        (3, base, 0),   # exact replica
        (4, near, 0),   # near-dup
        (5, other, 1),
        (6, other, 1),  # exact replica in another cell
        (7, [0.0] * dim, 0),  # zero vector (cos undefined)
    ]
    sf = str(tmp_path_factory.mktemp("replica_emb"))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    return sf


@pytest.fixture(scope="module")
def replica_emb_oracle(replica_emb_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{replica_emb_dir}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["dedup_semdedup", "dedup_embedding_cosine"]
)
def test_replica_embeddings_match_oracle(
    name, spark, replica_emb_dir, replica_emb_oracle
):
    e = ENTRIES[name]
    sdf = e.fn(spark, replica_emb_dir).toPandas()
    odf = replica_emb_oracle.sql(e.oracle).df()
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), f"{name}: hash mismatch"
    assert len(sdf) > 0


def test_replica_connected_components_match_oracle(
    spark, replica_dir, replica_oracle
):
    e = ENTRIES["dedup_connected_components"]
    sdf = e.fn(spark, replica_dir).toPandas()
    odf = replica_oracle.sql(e.oracle).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf)


# -- NSW graph search on a replica-heavy vector corpus ----------------------


@pytest.fixture(scope="module")
def nsw_emb_dir(spark, tmp_path_factory) -> str:
    """64-dim corpus with exact-replica classes (sizes 4/3/2) plus
    near-dups and singletons; ids 16/32/48 populate the 1/16 upper
    layer so the beam search is non-vacuous.  The oracle SQL builds
    the graph by the DIRECT member-level pair join, so hash parity
    here proves the collapsed build end-to-end (graph + beam +
    re-rank), not just the edge set."""
    from risinglight_spark.operators import vector_search as V

    dim = V.DIM

    def vec(seed: int, eps: float = 0.0) -> list:
        v = [0.05 * (((i * seed) % 11) - 5) for i in range(dim)]
        v[0] += eps
        return v

    rows = [
        # class A: 4 exact replicas (16 is an upper-layer node)
        *[(vid, vec(3), 0) for vid in (16, 17, 18, 19)],
        (20, vec(3, 0.04), 0),  # near-dup of A
        # class B: 3 exact replicas (32 in layer)
        *[(vid, vec(7), 1) for vid in (32, 33, 34)],
        (35, vec(7, 0.05), 1),  # near-dup of B
        # class C: 2 replicas of a far point (48 in layer)
        *[(vid, vec(5), 2) for vid in (48, 49)],
        # singletons
        *[(vid, vec(vid + 11), vid % 3) for vid in (1, 2, 3, 4, 5)],
    ]
    sf = str(tmp_path_factory.mktemp("nsw_emb"))
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    return sf


def test_nsw_replica_corpus_matches_oracle(spark, nsw_emb_dir):
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{nsw_emb_dir}/embeddings.parquet/*.parquet')"
        )
        e = ENTRIES["ann_nsw_graph_search"]
        sdf = e.fn(spark, nsw_emb_dir).toPandas()
        odf = con.sql(e.oracle).df()
        assert len(sdf) == len(odf) > 0
        assert sorted(sdf.columns) == sorted(odf.columns)
        assert value_hash(sdf) == value_hash(odf)
    finally:
        con.close()
