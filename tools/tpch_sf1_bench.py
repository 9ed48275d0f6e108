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


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    from risinglight_spark.session import get_spark
    from risinglight_spark.sources.dbgen import generate

    spark = get_spark(app_name=f"tpch_sf{sf}_bench")
    paths = generate(spark, f"/tmp/dbgen_sf{sf:g}", sf, reuse=True)
    for t in TABLES:
        spark.read.parquet(paths[t]).createOrReplaceTempView(t)
    n = spark.sql("select count(*) from lineitem").collect()[0][0]
    print(f"# dbgen SF{sf:g}: lineitem rows = {n:,}", file=sys.stderr)

    total = 0.0
    checkpoints: dict = {}
    print("| query | best-of-2 s |")
    print("|---|---|")
    for qn in range(1, 23):
        stmts = statements(os.path.join(QUERY_DIR, f"q{qn}.sql"))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for s in stmts:
                run_spark_stmt(spark, s, checkpoints)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        total += best
        print(f"| q{qn} | {best:.2f} |")
    print(f"| **total** | **{total:.2f}** |")


if __name__ == "__main__":
    main()
