"""TPC-H SF100 single-query stretch probe (spill-path evidence).

    SPARK_GRAFT_DRIVER_MEM=16g PYTHONPATH=/root/repo \
        python tools/tpch_sf100_probe.py [sf] [qnums...] [--verify]

The SF10/SF30 full-suite runs completed with ZERO spill — good news
that never exercises the spill path the 100-TB design depends on.
This probe generates the dbgen corpus at SF100 (~600M-row lineitem,
~37 GB parquet) and runs a small query subset (default q1/q6/q18)
under a deliberately bounded heap (16 GB for 32 cores = 0.5 GB per
task — the per-core memory a real cluster node gives you, unlike the
sandbox's 128 GiB), recording wall time and per-query
shuffle/spill bytes from the UI REST API (same attribution scheme as
tools/shuffle_audit.py).  --verify checks each result against DuckDB
over the same parquet files.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpch_runner import run_spark_stmt, statements  # noqa: E402

QUERY_DIR = "/root/reference/tests/sql/tpch"
TABLES = (
    "region nation supplier part partsupp customer orders lineitem".split()
)
UI_BASE = None  # set from sc.uiWebUrl after session creation


def _rest(app_path: str):
    # Derived from sc.uiWebUrl, NOT a hardcoded port: if the requested
    # port is taken Spark silently binds port+1, and a hardcoded URL
    # would scrape a different app's stages (ADVICE r9).
    url = f"{UI_BASE}/api/v1/{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    verify = "--verify" in sys.argv
    sf = float(args[0]) if args else 100.0
    qnums = [int(a) for a in args[1:]] or [1, 6, 18]

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from risinglight_spark.sources.dbgen import generate
    from risinglight_spark.tables import pin_semantics

    want_mem = os.environ["SPARK_GRAFT_DRIVER_MEM"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"tpch_sf{sf:g}_probe")
        .config("spark.driver.memory", want_mem)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        .config("spark.local.dir", "/tmp/spark_sf100_scratch")
        .getOrCreate()
    )
    pin_semantics(spark)
    sc = spark.sparkContext
    app_id = sc.applicationId
    # The bounded-heap premise is void if getOrCreate() reused a
    # pre-existing session configured differently — fail loudly.
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

    t0 = time.time()
    paths = generate(spark, f"/tmp/dbgen_sf{sf:g}", sf, reuse=True)
    print(f"# corpus ready in {time.time() - t0:.0f}s", file=sys.stderr)
    for t in TABLES:
        spark.read.parquet(paths[t]).createOrReplaceTempView(t)
    n = spark.sql("select count(*) from lineitem").collect()[0][0]
    print(f"# dbgen SF{sf:g}: lineitem rows = {n:,}", file=sys.stderr)

    duck = None
    if verify:
        import duckdb

        duck = duckdb.connect()
        for t in TABLES:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{paths[t]}/*.parquet')"
            )

    from tpch_sf1_bench import _rows_match

    print("| query | wall s | shuffle write | spilled |"
          + (" match |" if verify else ""))
    print("|---|---|---|---|" + ("---|" if verify else ""))
    failed = []
    for qn in qnums:
        stmts = statements(os.path.join(QUERY_DIR, f"q{qn}.sql"))
        tag = f"sf100_q{qn}"
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        last = None
        for s in stmts:
            r = run_spark_stmt(spark, s)
            if r is not None:
                last = r
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
        row = (
            f"| q{qn} | {wall:.1f} | {swrite / (1 << 20):.1f} MB "
            f"| {spill / (1 << 20):.1f} MB |"
        )
        if verify:
            want = None
            for s in stmts:
                r = duck.execute(s).fetchall()
                if r is not None:
                    want = r
            ok = _rows_match(last, want)
            if not ok:
                failed.append(f"q{qn}")
            row += f" {'PASS' if ok else 'FAIL'} |"
        print(row, flush=True)
    if failed:
        print(f"VERIFY FAILED: {', '.join(failed)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
