"""Bounded-heap scale probe for the LLM-pipeline flagship (the dedup /
clean-corpus path — the actual 100-TB use case in the north star).

    SPARK_GRAFT_DRIVER_MEM=16g PYTHONPATH=/root/repo \
        python tools/pipeline_scale_probe.py [--verify] [n_docs n_vecs]

TPC-H got its spill-path evidence from the SF100 sweep under a 16 GB
heap; the dedup pipeline was previously probed only at 10x/30x replicas
of single operators inside the 128 GiB sandbox.  This probe mirrors the
TPC-H treatment:

* generates a synthetic documents+embeddings corpus with KNOWN
  duplicate structure, deterministically and distributed (every value
  an xxhash64 expression of ids — no driver-side data, no RNG state):
  - documents: doc_id < n_base are originals (40-63 words from a
    4 k-word vocab, seeded per (base, position)); the second third are
    EXACT copies (same word formula, keyed on base only); the last
    third are near-duplicates (~1/8 words re-drawn per (doc, pos)).
    ~19 stopwords in the vocab head keep the e2e quality gate
    partially selective, and `lang`/`source` follow the reference
    documents schema.
  - embeddings: n_class = n_vecs/3 DISTINCT vectors (3 exact replicas
    each), n_class/800 cells; half the classes sit at offset 0.01 of
    their cell center (SemDeDup drops), half at 2.0 (cosine < tau,
    survive) — so the drop verdict is data-dependent, not trivial.
* runs pipeline_pretraining_e2e, dedup_minhash_lsh, dedup_semdedup
  under the same deliberately bounded heap as the SF100 sweep
  (SPARK_GRAFT_DRIVER_MEM, default 16g = 0.5 GB/core at local[32]),
  recording wall + shuffle-write + spill per entry from the UI REST
  API (same attribution as tools/shuffle_audit.py).
* --verify additionally compares each entry against its registry
  DuckDB oracle over the same parquet (row count + column set +
  order-insensitive value hash, via tools/oracle_check's normalizer).
  The oracle's per-char DuckDB list lambdas are linear but slow, so
  verify at a moderate corpus and run the stress corpus with
  CONSTRUCTED-truth invariants instead:
  - minhash: the exact pair (b, b+n_base) must be reported for EVERY
    base b (identical text -> identical signature, est_sim = 1);
  - semdedup: every non-representative exact replica must be dropped;
    row count == n_vecs;
  - e2e: one row per surviving source, tokens_kept <= the per-source
    budget.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SYMLINK_TABLES = (
    "region nation customer supplier part orders lineitem events".split()
)
VOCAB = 4096
STOPWORDS = (
    "the a an and or of to in is it that for on was as with be at by".split()
)
UI_BASE = None


def _rest(app_path: str):
    url = f"{UI_BASE}/api/v1/{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _word(idx):
    """vocab word for a non-negative index column: the first 19 slots
    are real stopwords (keeps the e2e quality gate selective), the
    rest w0019..w4095.  One array-literal lookup: the original WHEN
    chain re-evaluated the idx subtree (3 xxhash64 calls) once per
    stopword comparison under the HOF lambda's interpreted eval — the
    8x rebuild spent 45 min in BoxesRunTime.equals on exactly that.
    element_at on a constant-folded 4096-string literal produces
    byte-identical words (verified: 15k-doc corpus value-hash equal
    under both formulations) at ~50x the generation throughput.

    The VOCAB bound is applied HERE (pmod), not trusted from callers:
    the old WHEN chain degraded gracefully on any index, but
    element_at past the literal's length yields NULL (or an ANSI
    error) — silently empty words if a caller ever forgot its own
    pmod (ADVICE r11).  For in-range indexes pmod is the identity, so
    all existing callers stay byte-identical."""
    from pyspark.sql import functions as F

    vocab = STOPWORDS + [f"w{i:04d}" for i in range(len(STOPWORDS), VOCAB)]
    return F.element_at(
        F.lit(vocab), F.pmod(idx.cast("int"), F.lit(VOCAB)) + 1
    )


def build_corpus(spark, n_docs: int, n_vecs: int, out: str) -> str:
    from pyspark.sql import functions as F

    if os.path.exists(f"{out}/embeddings.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    n_base = n_docs // 3

    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    b = F.col("doc_id") % n_base
    r = F.floor(F.col("doc_id") / n_base)
    nw = (F.lit(40) + F.pmod(F.xxhash64(F.lit("n"), b), F.lit(24))).cast(
        "int"
    )

    def widx(j):
        perturb = (r == 2) & (
            F.pmod(F.xxhash64(F.lit("p"), F.col("doc_id"), j), F.lit(8)) == 0
        )
        return F.when(
            perturb, F.pmod(F.xxhash64(F.lit("q"), F.col("doc_id"), j), F.lit(VOCAB))
        ).otherwise(F.pmod(F.xxhash64(F.lit("w"), b, j), F.lit(VOCAB)))

    words = F.transform(
        F.sequence(F.lit(0), nw - 1), lambda j: _word(widx(j))
    )
    docs = (
        d.withColumn("text", F.concat_ws(" ", words))
        .select(
            "doc_id",
            "text",
            F.when(
                F.pmod(F.xxhash64(F.lit("l"), b), F.lit(10)) == 0, F.lit("de")
            )
            .otherwise(F.lit("en"))
            .alias("lang"),
            F.concat(
                F.lit("src_"), F.pmod(b, F.lit(20)).cast("string")
            ).alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    _write_single(docs, f"{out}/documents.parquet")

    n_class = n_vecs // 3
    n_cells = max(1, n_class // 800)
    e = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    c = F.col("vec_id") % n_class
    cell = F.pmod(c, F.lit(n_cells)).cast("int")
    scatter = F.when(
        F.pmod(F.xxhash64(F.lit("s"), c), F.lit(2)) == 0, F.lit(0.01)
    ).otherwise(F.lit(2.0))

    def dim_val(dd):
        center = (
            F.pmod(F.xxhash64(F.lit("c"), cell, dd), F.lit(2001)) / 1000.0
            - 1.0
        )
        off = (
            F.pmod(F.xxhash64(F.lit("o"), c, dd), F.lit(2001)) / 1000.0 - 1.0
        ) * scatter
        return (center + off).cast("float")

    embs = e.select(
        "vec_id",
        F.transform(F.sequence(F.lit(0), F.lit(63)), dim_val).alias(
            "embedding"
        ),
        cell.alias("label"),
    )
    _write_single(embs, f"{out}/embeddings.parquet")

    for t in SYMLINK_TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return out


def _write_single(df, dest: str) -> None:
    """Write DISTRIBUTED (a coalesce(1) here would funnel the whole
    generation through one task); Spark reads the directory as-is and
    the DuckDB views glob it (_duck_source)."""
    df.repartition(64).write.mode("overwrite").parquet(dest)


def _duck_source(out: str, t: str) -> str:
    """read_parquet target for table t: generated tables are parquet
    DIRECTORIES (glob the parts); symlinked base tables are files."""
    path = f"{out}/{t}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def main() -> None:
    only = None
    argv = sys.argv[1:]
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    verify = "--verify" in argv
    if verify:
        n_docs = int(args[0]) if args else 15_000
        n_vecs = int(args[1]) if len(args) > 1 else 6_000
    else:
        n_docs = int(args[0]) if args else 1_800_000
        n_vecs = int(args[1]) if len(args) > 1 else 480_000

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    want_mem = os.environ["SPARK_GRAFT_DRIVER_MEM"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from risinglight_spark.tables import pin_semantics

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pipeline_scale_probe_{n_docs}")
        .config("spark.driver.memory", want_mem)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/tmp/spark_pipeline_scratch")
        .getOrCreate()
    )
    pin_semantics(spark)
    sc = spark.sparkContext
    got_mem = sc.getConf().get("spark.driver.memory", "<unset>")
    if got_mem != want_mem:
        raise SystemExit(
            f"stale SparkSession reused: spark.driver.memory={got_mem}, "
            f"wanted {want_mem} — stop the other session first"
        )
    global UI_BASE
    UI_BASE = sc.uiWebUrl
    if not UI_BASE:
        raise SystemExit("Spark UI unavailable; cannot attribute spill")
    app_id = sc.applicationId

    out = f"/tmp/pipeline_probe_{n_docs}_{n_vecs}"
    t0 = time.time()
    build_corpus(spark, n_docs, n_vecs, out)
    print(
        f"# corpus ready in {time.time() - t0:.0f}s at {out} "
        f"(docs={n_docs:,} vecs={n_vecs:,})",
        file=sys.stderr,
    )

    from risinglight_spark.registry import collect

    entries = collect()
    names = (
        "pipeline_pretraining_e2e",
        "dedup_minhash_lsh",
        "dedup_semdedup",
    )
    if only:
        names = tuple(n for n in names if n in only)

    duck = None
    if verify:
        import duckdb

        duck = duckdb.connect()
        for t in SYMLINK_TABLES + ["documents", "embeddings"]:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{_duck_source(out, t)}')"
            )

    n_base = n_docs // 3
    n_class = n_vecs // 3
    hdr = "| entry | wall s | rows | shuffle write | spilled |" + (
        " oracle |" if verify else " invariant |"
    )
    print(hdr)
    print("|---|---|---|---|---|---|")
    failures = []
    results: dict[str, object] = {}
    for name in names:
        tag = f"probe_{name}"
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        df = entries[name].fn(spark, out)
        if verify:
            pdf = df.toPandas()
            n_rows = len(pdf)
            results[name] = pdf
        else:
            n_rows = df.count()
        wall = time.time() - t0
        sc.setJobGroup("", "")
        jobs = _rest(f"applications/{app_id}/jobs")
        stage_ids = {
            s
            for j in jobs
            if j.get("jobGroup") == tag
            for s in j.get("stageIds", [])
        }
        swrite = spill = 0
        for st in _rest(f"applications/{app_id}/stages?status=COMPLETE"):
            if st["stageId"] in stage_ids:
                swrite += st.get("shuffleWriteBytes", 0)
                spill += st.get("diskBytesSpilled", 0)

        if verify:
            from oracle_check import value_hash

            odf = duck.execute(entries[name].oracle).df()
            ok = (
                len(results[name]) == len(odf)
                and sorted(results[name].columns) == sorted(odf.columns)
                and value_hash(results[name]) == value_hash(odf)
            )
            status = "PASS" if ok else "FAIL"
        else:
            status = _invariant(spark, name, df, n_base, n_class, n_vecs)
        if "FAIL" in status:
            failures.append(name)
        print(
            f"| {name} | {wall:.1f} | {n_rows:,} "
            f"| {swrite / (1 << 20):.1f} MB | {spill / (1 << 20):.1f} MB "
            f"| {status} |",
            flush=True,
        )
    if failures:
        print(f"FAILED: {', '.join(failures)}", file=sys.stderr)
        sys.exit(1)


def _invariant(spark, name, df, n_base, n_class, n_vecs) -> str:
    from pyspark.sql import functions as F

    if name == "dedup_minhash_lsh":
        # every (b, b+n_base) exact-copy pair must be reported: the two
        # texts are byte-identical, so their signatures collide in
        # every band and est_sim is exactly 1.
        got = (
            df.filter(
                (F.col("doc_b") == F.col("doc_a") + n_base)
                & (F.col("doc_a") < n_base)
                & (F.col("est_sim") == 1.0)
            )
            .select("doc_a")
            .distinct()
            .count()
        )
        return (
            f"exact pairs {got:,}/{n_base:,} "
            + ("OK" if got == n_base else "FAIL")
        )
    if name == "dedup_semdedup":
        # exact replicas of a class must all drop (rep keeps); rows
        # must cover every vector.
        n = df.count()
        dropped = df.filter(F.col("is_dropped")).count()
        need = n_vecs - n_class
        ok = n == n_vecs and dropped >= need
        return f"rows {n:,}, dropped {dropped:,} >= {need:,} " + (
            "OK" if ok else "FAIL"
        )
    # e2e: one row per surviving source, budget respected
    from risinglight_spark.operators.pipeline_ops import (
        TOKEN_BUDGET_PER_SOURCE,
    )

    bad = df.filter(
        F.col("tokens_kept") > TOKEN_BUDGET_PER_SOURCE
    ).count()
    n = df.count()
    ok = bad == 0 and 0 < n <= 20
    return f"{n} sources, budget viol. {bad} " + ("OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
