"""Local replica of the driver's correctness gate.

Runs every registry entry on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, schema (column names), and
an order-insensitive value hash.  Use while iterating:

    python tools/oracle_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    import datetime

    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(
            lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))
        ).all() and s.notna().any():
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
            continue
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = normalize(df)
    rows = sorted(
        hashlib.md5(
            "|".join(
                repr(v) if v == v else "NaN" for v in row  # NaN-safe repr
            ).encode()
        ).hexdigest()
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    first_n = None
    if "--first" in argv:
        i = argv.index("--first")
        first_n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    filters = argv[1:]

    from risinglight_spark.registry import collect
    from risinglight_spark.session import get_spark

    entries = collect()
    if first_n is not None:
        # Registry order — the prefix the driver's bounded gate verifies.
        entries = dict(list(entries.items())[:first_n])
    spark = get_spark(app_name="oracle_check")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, e in sorted(entries.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = e.fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if e.oracle is None:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(e.oracle).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            a, b = normalize(sdf), normalize(odf)
            key = sorted(sdf.columns)
            a = a.sort_values(key).reset_index(drop=True)
            b = b.sort_values(key).reset_index(drop=True)
            if len(a) == len(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    problems.append(f"first diff row {i}: {a.loc[i].to_dict()} vs {b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
