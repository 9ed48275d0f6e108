"""Dump `.explain("formatted")` output for named registry entries to
plans/<dir>/<entry>_<suffix>.txt — the per-round before/after plan
evidence the optimization verdicts check claims against.

    PYTHONPATH=/root/repo python tools/dump_entry_plans.py <outdir> <suffix> <entry> [entry ...]

Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).  Note
entries with memoized assets EXECUTE the asset build while constructing
the DataFrame, so the session must be able to import risinglight_spark
in Python workers (run from the repo root with PYTHONPATH set).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from risinglight_spark.registry import collect
    from risinglight_spark.session import get_spark

    # Match bench.py's session exactly (shuffle_partitions=16) so the
    # dumped Exchange arguments equal what the bench runs, and prime
    # each entry once so memoized-asset entries show their steady-state
    # shape (InMemoryTableScan of the built asset) — the regime every
    # timed sample runs in.
    spark = get_spark(app_name="dump_entry_plans", shuffle_partitions=16)
    entries = collect()
    for name in names:
        entries[name].fn(spark, sf_dir).collect()  # prime assets
    for name in names:
        df = entries[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
