"""TPC-H throughput at dbgen SF1 (6M-row lineitem) on local[32].

    PYTHONPATH=/root/repo python tools/tpch_sf1_bench.py [sf] [--verify]
    PYTHONPATH=/root/repo python tools/tpch_sf1_bench.py --pin

Runs the reference's own query files (tests/sql/tpch/q{N}.sql, public
SQL text read at run time) verbatim over the dbgen-faithful parquet
corpus (risinglight_spark/sources/dbgen.py) and prints a per-query
markdown table (best of 2) plus the total — the scale evidence row
for SCALE.md.  This is the same corpus + SQL the correctness test
(tests/test_tpch_dbgen.py) hash-checks against DuckDB; this tool only
times it.

--pin (VERDICT r13 item 1) records the COMPUTE-BOUND envelope the
sf0.1 headline cannot provide (every sf0.1 TPC-H query is sub-second
dispatch noise there): median-of-3 per query at SF1, bracketed by the
single-stream + scheduling calibration kernels, written as the `sf1`
block of BASELINE_BENCH.json.  bench.py emits `vs_pinned_sf1` when a
run sets SPARK_GRAFT_SF1=1; tools/pin_baseline.py carries the block
through envelope regenerations.  Refuses a contended box (before/after
kernel drift > 25%), same discipline as pin_baseline.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpch_runner import run_spark_stmt, statements  # noqa: E402

QUERY_DIR = "/root/reference/tests/sql/tpch"
TABLES = (
    "region nation supplier part partsupp customer orders lineitem".split()
)


def _rows_match(got, want) -> bool:
    """Order-insensitive compare, floats with tolerance (double-sum
    association drift across engines) — same scheme as
    tests/test_tpch_dbgen.py: sort by a 6-sig-digit canonical key,
    then compare cells numerically."""
    import math
    from datetime import date, datetime

    def key(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6g}"
        if isinstance(v, (datetime, date)):
            return str(v)[:10]
        return str(v)

    def eq(a, b):
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) or math.isnan(fb):
                return math.isnan(fa) and math.isnan(fb)
            return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-6)
        return key(a) == key(b)

    g = sorted((tuple(r) for r in got), key=lambda r: tuple(key(v) for v in r))
    w = sorted((tuple(r) for r in want), key=lambda r: tuple(key(v) for v in r))
    return len(g) == len(w) and all(
        len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
        for a, b in zip(g, w)
    )


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_sf1_queries(
    spark, samples: int = 2, stat: str = "best"
) -> dict[str, float]:
    """Time q1-q22 over an already-registered dbgen corpus.  Shared by
    this tool's --pin mode and bench.py's SPARK_GRAFT_SF1 pass."""
    import statistics

    checkpoints: dict = {}
    out: dict[str, float] = {}
    for qn in range(1, 23):
        stmts = statements(os.path.join(QUERY_DIR, f"q{qn}.sql"))
        obs = []
        for _ in range(samples):
            t0 = time.perf_counter()
            for s in stmts:
                run_spark_stmt(spark, s, checkpoints)
            obs.append(time.perf_counter() - t0)
        out[f"tpch_q{qn}"] = round(
            min(obs) if stat == "best" else statistics.median(obs), 3
        )
    return out


def register_sf1_views(spark, sf: float = 1.0) -> dict:
    from risinglight_spark.sources.dbgen import generate

    paths = generate(spark, f"/tmp/dbgen_sf{sf:g}", sf, reuse=True)
    for t in TABLES:
        spark.read.parquet(paths[t]).createOrReplaceTempView(t)
    return paths


def register_sf1_tables(spark, sf: float = 1.0) -> dict:
    """Catalog tables + ANALYZE column stats + CBO join reorder
    (VERDICT r15 item 5, guide §3.1/§6).  Temp views carry no stats, so
    spark.sql.cbo.enabled was a no-op on this pass: every multi-join
    query kept the syntactic join order (q5's region->nation->customer
    chain builds a 6M-row intermediate before lineitem prunes it).
    External parquet tables + `ANALYZE ... FOR ALL COLUMNS` give the
    CBO real ndv/rowcount, and joinReorder picks the selective order
    (measured at SF1: q5 5.7 -> 1.0 s raw on the same box, suite total
    ~0.62x).  Metadata lives in the session's in-memory catalog — no
    files, rebuilt every run, nothing persisted across bench
    invocations.  Temp views of the same names are dropped first: temp
    views SHADOW catalog tables, and the headline pass registers sf0.1
    views under exactly these names (a shadowed table would silently
    time sf0.1 data)."""
    from risinglight_spark.sources.dbgen import generate

    paths = generate(spark, f"/tmp/dbgen_sf{sf:g}", sf, reuse=True)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    for t in TABLES:
        spark.catalog.dropTempView(t)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"CREATE TABLE {t} USING parquet LOCATION '{paths[t]}'")
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    return paths


def drop_sf1_tables(spark) -> None:
    """Leave no catalog tables behind (they outlive the SF1 pass in
    the shared session; a later direct spark.sql() against a TPC-H
    name should fail loudly, not read SF1 data)."""
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def pin() -> None:
    """Write the sf1 block of BASELINE_BENCH.json from a clean run
    (VERDICT r13 item 1: the compute-bound envelope the sub-second
    sf0.1 TPC-H slice cannot provide)."""
    import json
    import statistics

    from pyspark.sql import functions as F

    from risinglight_spark.session import get_spark

    spark = get_spark(app_name="tpch_sf1_pin")
    register_sf1_views(spark)

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(2_000_000_000).select(
            F.xxhash64("id").alias("h")
        ).agg(F.sum("h")).collect()
        return time.perf_counter() - t0

    def calib_sched() -> float:
        t0 = time.perf_counter()
        for _ in range(32):
            spark.range(1_000).agg(F.sum("id")).collect()
        return time.perf_counter() - t0

    # warm: one full untimed pass (codegen compile + shuffle paths)
    run_sf1_queries(spark, samples=1)
    calib()
    cb = round(statistics.median(calib() for _ in range(3)), 3)
    calib_sched()
    sb = round(statistics.median(calib_sched() for _ in range(3)), 3)
    q = run_sf1_queries(spark, samples=3, stat="median")
    ca = round(statistics.median(calib() for _ in range(3)), 3)
    sa = round(statistics.median(calib_sched() for _ in range(3)), 3)
    # BOTH kernels gate the pin (ADVICE r14: the docstring said
    # "kernels" plural but only the single-stream pair was checked,
    # and the r14 adjudications saw mid-run sched swings the compute
    # kernel never predicted).  Sub-second queries in the block live
    # in the scheduling regime, so a sched-drifted pin would bake
    # contaminated numbers into exactly the rows that track it.
    if max(cb, ca) / min(cb, ca) > 1.25:
        sys.exit(
            f"refusing: compute kernel drifted mid-run ({cb} -> {ca}); "
            "re-run on a quiet box"
        )
    if max(sb, sa) / min(sb, sa) > 1.25:
        sys.exit(
            f"refusing: scheduling kernel drifted mid-run ({sb} -> {sa}); "
            "re-run on a quiet box"
        )
    try:
        import subprocess

        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        sha = None
    path = os.path.join(REPO, "BASELINE_BENCH.json")
    with open(path) as f:
        base = json.load(f)
    base["sf1"] = {
        "description": (
            "Compute-bound TPC-H envelope at dbgen SF1 (6M-row "
            "lineitem, reference q1-q22 verbatim), median-of-3 after "
            "a full warm pass, in pin-box seconds.  bench.py emits "
            "vs_pinned_sf1 when SPARK_GRAFT_SF1=1."
        ),
        "git_sha": sha,
        "calib_ref": round((cb + ca) / 2, 3),
        "calib_before": cb,
        "calib_after": ca,
        "calib_sched_ref": round((sb + sa) / 2, 3),
        "queries": q,
        "total": round(sum(q.values()), 3),
    }
    with open(path, "w") as f:
        json.dump(base, f, indent=1)
        f.write("\n")
    spark.stop()
    print(
        f"pinned sf1 block: total {base['sf1']['total']}s, "
        f"calib {cb}/{ca}, sched {sb}/{sa}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    verify = "--verify" in sys.argv
    if "--pin" in sys.argv:
        pin()
        return
    sf = float(args[0]) if args else 1.0
    stats = "--stats" in sys.argv
    from risinglight_spark.session import get_spark

    spark = get_spark(app_name=f"tpch_sf{sf}_bench")
    paths = (
        register_sf1_tables(spark, sf)
        if stats
        else register_sf1_views(spark, sf)
    )
    n = spark.sql("select count(*) from lineitem").collect()[0][0]
    print(f"# dbgen SF{sf:g}: lineitem rows = {n:,}", file=sys.stderr)

    duck = None
    if verify:
        import duckdb

        duck = duckdb.connect()
        for t in TABLES:
            duck.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{paths[t]}/*.parquet')"
            )

    total = 0.0
    failed: list[str] = []
    checkpoints: dict = {}
    hdr = "| query | best-of-2 s |" + (" match |" if verify else "")
    print(hdr)
    print("|---|---|" + ("---|" if verify else ""))
    for qn in range(1, 23):
        stmts = statements(os.path.join(QUERY_DIR, f"q{qn}.sql"))
        best, last = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            for s in stmts:
                r = run_spark_stmt(spark, s, checkpoints)
                if r is not None:
                    last = r
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        total += best
        row = f"| q{qn} | {best:.2f} |"
        if verify:
            from tpch_runner import run_duck_stmt

            want = None
            for s in stmts:
                r = run_duck_stmt(duck, s)
                if r is not None:
                    want = r
            ok = _rows_match(last, want)
            if not ok:
                failed.append(f"q{qn}")
            row += f" {'PASS' if ok else 'FAIL'} |"
        print(row, flush=True)
    print(f"| **total** | **{total:.2f}** |")
    if failed:
        # A FAIL row must not exit 0 — automated runs (CI, driver
        # gates) read the exit code, not the table.
        print(f"VERIFY FAILED: {', '.join(failed)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
