"""TPC-H throughput at dbgen SF1 (6M-row lineitem) on local[32].

    PYTHONPATH=/root/repo python tools/tpch_sf1_bench.py [sf]

Runs the reference's own query files (tests/sql/tpch/q{N}.sql, public
SQL text read at run time) verbatim over the dbgen-faithful parquet
corpus (risinglight_spark/sources/dbgen.py) and prints a per-query
markdown table (best of 2) plus the total — the scale evidence row
for SCALE.md.  This is the same corpus + SQL the correctness test
(tests/test_tpch_dbgen.py) hash-checks against DuckDB; this tool only
times it.
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    verify = "--verify" in sys.argv
    sf = float(args[0]) if args else 1.0
    from risinglight_spark.session import get_spark
    from risinglight_spark.sources.dbgen import generate

    spark = get_spark(app_name=f"tpch_sf{sf}_bench")
    paths = generate(spark, f"/tmp/dbgen_sf{sf:g}", sf, reuse=True)
    for t in TABLES:
        spark.read.parquet(paths[t]).createOrReplaceTempView(t)
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
