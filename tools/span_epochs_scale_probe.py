"""Scale series for the two round-14 operators (VERDICT r14 item 5).

    SPARK_GRAFT_DRIVER_MEM=16g PYTHONPATH=/root/repo \
        python tools/span_epochs_scale_probe.py span [n_docs ...]
    PYTHONPATH=/root/repo python tools/span_epochs_scale_probe.py epochs [K n_docs]

span: dedup_span_removal on a FULLY-DUPLICATED corpus — the edit-list
asset's documented worst case ("an entirely duplicated corpus — the
list approaches 8 bytes x corpus token count", dedup.py).  Every doc's
text is a function of doc_id % n_base only (R = 8 replicas per text,
pipeline_scale_probe's generator minus the near-dup perturbation), so
keep-first flags EVERY gram of EVERY non-base doc and the per-doc
removal arrays cover the full token range — the asset is maximal by
construction.  Runs under the same deliberately bounded heap as the
flagship series (SPARK_GRAFT_DRIVER_MEM, default 16g), records wall +
shuffle-write + spill from the UI REST API per corpus size, and
asserts the closed-form invariant: every doc with doc_id >= n_base has
n_removed_tokens == n_tokens (its every gram's keep-first winner is
the same position in its base doc), and no base doc loses tokens
except via the (vanishingly rare) cross-class 8-gram collision.

epochs: mix_epochs_schedule at HIGH source cardinality — K = 10,000
sources => an 80,000-row (source, epoch) lattice through the single
global ranking window.  The verdict question is whether the bounded-
metadata window stays trivial when K grows 500x past the fixtures'
20 sources: the probe times the FIRST call (corpus rollup + lattice)
and a steady-state call (memoized rollup -> pure K-row metadata), and
checks the water-filling invariants (row count == K, sum(raw_alloc)
== min(budget, 8*total), per-source funding monotone in u*w rank).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_scale_probe import STOPWORDS, VOCAB, _word  # noqa: E402

REPLICAS = 8
UI_BASE = None


def _rest(app_path: str):
    url = f"{UI_BASE}/api/v1/{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _session(name: str):
    from pyspark.sql import SparkSession

    from risinglight_spark.tables import pin_semantics

    want_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(name)
        .config("spark.driver.memory", want_mem)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/tmp/spark_pipeline_scratch")
        .getOrCreate()
    )
    pin_semantics(spark)
    got = spark.sparkContext.getConf().get("spark.driver.memory", "<unset>")
    if got != want_mem:
        raise SystemExit(
            f"stale SparkSession reused: spark.driver.memory={got}"
        )
    global UI_BASE
    UI_BASE = spark.sparkContext.uiWebUrl
    return spark


def _measured(spark, tag: str, fn):
    """fn() under a job group; -> (result, wall_s, shuffle_mb, spill_mb)."""
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    t0 = time.time()
    res = fn()
    wall = time.time() - t0
    sc.setJobGroup("", "")
    app_id = sc.applicationId
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
    return res, wall, swrite / (1 << 20), spill / (1 << 20)


def build_fully_dup_corpus(spark, n_docs: int) -> str:
    """Documents table only: every text a pure function of
    doc_id % n_base (R = REPLICAS exact copies), the probe generator's
    word formula; other tables symlink sf0.1 (unused by the entry)."""
    from pyspark.sql import functions as F

    out = f"/tmp/span_worst_{n_docs}"
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    n_base = n_docs // REPLICAS
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    b = F.col("doc_id") % n_base
    nw = (F.lit(40) + F.pmod(F.xxhash64(F.lit("n"), b), F.lit(24))).cast(
        "int"
    )
    words = F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda j: _word(F.pmod(F.xxhash64(F.lit("w"), b, j), F.lit(VOCAB))),
    )
    docs = d.withColumn("text", F.concat_ws(" ", words)).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.concat(F.lit("src_"), F.pmod(b, F.lit(20)).cast("string")).alias(
            "source"
        ),
        F.length("text").alias("n_chars"),
    )
    docs.repartition(64).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    return out


def run_span(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from risinglight_spark.registry import collect

    spark = _session("span_worst_probe")
    entries = collect()
    print(
        "| docs (R=8 dup) | wall s | shuffle | spilled | "
        "removed/total tokens | edit-list est | invariant |"
    )
    print("|---|---|---|---|---|---|---|")
    for n_docs in sizes:
        t0 = time.time()
        out = build_fully_dup_corpus(spark, n_docs)
        print(f"# corpus {n_docs:,} ready in {time.time() - t0:.0f}s",
              file=sys.stderr)
        n_base = n_docs // REPLICAS

        def call():
            df = entries["dedup_span_removal"].fn(spark, out)
            return df.agg(
                F.sum("n_tokens").alias("tot"),
                F.sum("n_removed_tokens").alias("rem"),
                F.sum(
                    F.when(
                        (F.col("doc_id") >= n_base)
                        & (F.col("n_removed_tokens") != F.col("n_tokens")),
                        1,
                    ).otherwise(0)
                ).alias("bad_replica"),
                F.sum(
                    F.when(
                        (F.col("doc_id") < n_base)
                        & (F.col("n_removed_tokens") > 0),
                        1,
                    ).otherwise(0)
                ).alias("collided_base"),
            ).collect()[0]

        row, wall, smb, spmb = _measured(spark, f"span_{n_docs}", call)
        ok = row["bad_replica"] == 0 and row["collided_base"] <= n_base // 1000
        status = "PASS" if ok else (
            f"FAIL bad_replica={row['bad_replica']} "
            f"collided_base={row['collided_base']}"
        )
        print(
            f"| {n_docs:,} | {wall:.1f} | {smb:.0f} MB | {spmb:.0f} MB "
            f"| {row['rem']:,}/{row['tot']:,} "
            f"| {row['rem'] * 8 / (1 << 30):.2f} GB | {status} |",
            flush=True,
        )
    spark.stop()


def build_many_sources_corpus(spark, k: int, n_docs: int) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/epochs_k{k}_{n_docs}"
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    nw = (
        F.lit(8) + F.pmod(F.xxhash64(F.lit("n"), F.col("doc_id")), F.lit(8))
    ).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda j: _word(
            F.pmod(F.xxhash64(F.lit("w"), F.col("doc_id"), j), F.lit(VOCAB))
        ),
    )
    docs = d.withColumn("text", F.concat_ws(" ", words)).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        # heavy-tailed source sizes: source id = doc_id mod K would be
        # uniform; squaring the hash skews it so the water-filling has
        # real structure (big sources hit the budget cap, small ones
        # fund all 8 epochs)
        F.concat(
            F.lit("src_"),
            F.pmod(
                F.xxhash64(F.lit("s"), F.col("doc_id")) % (k * k), F.lit(k)
            ).cast("string"),
        ).alias("source"),
        F.length("text").alias("n_chars"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    return out


def run_epochs(k: int, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from risinglight_spark.registry import collect

    spark = _session("epochs_k_probe")
    entries = collect()
    out = build_many_sources_corpus(spark, k, n_docs)
    fn = entries["mix_epochs_schedule"].fn

    def call():
        df = fn(spark, out)
        return df.agg(
            F.count("*").alias("k"),
            F.sum("raw_alloc").alias("alloc"),
            F.sum("unique_tokens").alias("total"),
            F.max("epochs_full").alias("max_ep"),
            F.min("epochs_full").alias("min_ep"),
        ).collect()[0]

    r1, wall1, smb1, spmb1 = _measured(spark, "epochs_first", call)
    r2, wall2, smb2, spmb2 = _measured(spark, "epochs_steady", call)
    budget = (3 * int(r1["total"])) // 2
    ok = (
        r1["k"] <= k
        and r1["alloc"] <= budget
        and 0 <= r1["min_ep"] <= r1["max_ep"] <= 8
        and tuple(r1) == tuple(r2)
    )
    print(f"| K (distinct sources) | {r1['k']:,} (asked {k:,}) |")
    print(f"| lattice rows through the global window | {r1['k'] * 8:,} |")
    print(
        f"| first call (rollup + lattice) "
        f"| {wall1:.1f}s, {smb1:.0f} MB shuffle, {spmb1:.0f} MB spill |"
    )
    print(
        f"| steady state (memoized rollup) "
        f"| {wall2:.2f}s, {smb2:.2f} MB shuffle |"
    )
    print(
        f"| invariants (alloc {r1['alloc']:,} <= budget {budget:,}, "
        f"epochs in [{r1['min_ep']}, {r1['max_ep']}], "
        f"deterministic repeat) | {'PASS' if ok else 'FAIL'} |"
    )
    spark.stop()
    if not ok:
        sys.exit(1)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "span"
    if mode == "span":
        sizes = [int(a) for a in sys.argv[2:]] or [
            1_800_000,
            3_600_000,
            7_200_000,
            14_400_000,
        ]
        run_span(sizes)
    elif mode == "epochs":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
        n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
        run_epochs(k, n_docs)
    else:
        sys.exit("usage: span_epochs_scale_probe.py [span|epochs] ...")


if __name__ == "__main__":
    main()
