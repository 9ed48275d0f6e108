"""Mini sqllogictest runner: executes the reference's own .slt test
files (reference: tests/sql/*.slt, harness tests/sqllogictest.rs:17-61)
against Spark SQL.

Supported directives: `statement ok`, `query <types> [rowsort]` with
expected output after `----`.  `statement error` is treated as a skip
(error surfaces are dialect-specific).  DDL is rewritten minimally so
it runs on Spark: bare VARCHAR -> STRING, NOT NULL / PRIMARY KEY
constraints stripped (enforced by the writer in the reference's
storage layer; advisory here), and CREATE TABLE gets a scratch parquet
LOCATION so INSERT/SELECT/DROP run natively through spark.sql.

Comparison follows sqllogictest convention: values formatted to
strings ('NULL', 'true', '(empty)'), rows sorted unless the query has
an ORDER BY (or `rowsort` forces sorting); numeric cells compare with
1e-6 relative tolerance to absorb float formatting.
"""

from __future__ import annotations

import datetime
import math
import re
import tempfile
from dataclasses import dataclass, field


@dataclass
class Record:
    kind: str  # 'statement' | 'statement_error' | 'query'
    sql: str
    types: str = ""
    rowsort: bool = False
    expected: list[str] = field(default_factory=list)


def parse_slt(path: str) -> list[Record]:
    with open(path) as f:
        raw = f.read()
    # drop comment lines, keep blank-line block structure
    lines = [
        ln for ln in raw.splitlines() if not ln.lstrip().startswith("#")
    ]
    blocks: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        if ln.strip() == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(ln)
    if cur:
        blocks.append(cur)

    records: list[Record] = []
    for b in blocks:
        head = b[0].strip().lower()
        if head == "statement ok":
            records.append(Record("statement", "\n".join(b[1:])))
        elif head.startswith("statement error"):
            records.append(Record("statement_error", "\n".join(b[1:])))
        elif head.startswith("query"):
            parts = b[0].split()
            types = parts[1] if len(parts) > 1 else ""
            if types.lower() == "error":
                records.append(Record("statement_error", "\n".join(b[1:])))
                continue
            rowsort = "rowsort" in parts[2:]
            body = b[1:]
            if "----" in body:
                i = body.index("----")
                sql, expected = "\n".join(body[:i]), body[i + 1 :]
            else:
                sql, expected = "\n".join(body), []
            records.append(Record("query", sql, types, rowsort, expected))
        elif head.startswith(("halt", "subtest", "include", "loop", "endloop")):
            continue
        # anything else: ignore
    return records


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from risinglight_spark.sql.dialect import (  # noqa: E402,F401
    _CREATE_RE,
    _DROP_RE,
    _STAT_RE,
    _cells_match,
    fmt_value,
    _rows_match,
    has_toplevel_order,
    order_dependent,
    rewrite_create_function,
    rewrite_ddl,
    rewrite_query,
    rewrite_vector,
    reference_render_datetimes,
    translate_blob_literals,
)
from risinglight_spark.sql.executor import StatementExecutor  # noqa: E402

class SltRunner:
    def __init__(self, spark):
        self.spark = spark
        self.scratch = tempfile.mkdtemp(prefix="rl_slt_")
        self.created: list[str] = []
        # reference INSERT semantics are permissive (string literals
        # into typed columns, e.g. type.slt dates); Spark 4 defaults to
        # ANSI store assignment
        spark.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")

    def cleanup(self) -> None:
        from risinglight_spark.sql.executor import restore_dialect_confs

        for t in self.created:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        restore_dialect_confs(self.spark)

    def run_file(
        self,
        path: str,
        skip_patterns: tuple[str, ...] = (),
        error_divergences: tuple[str, ...] = (),
    ) -> tuple[int, int, list[str]]:
        """Returns (n_checked, n_skipped, failures).  ``skip_patterns``
        are substrings of statements known to be dialect-incompatible;
        ``error_divergences`` are substrings of `statement error`
        blocks this engine deliberately accepts (both documented
        per-file in tests/test_slt.py)."""
        import os
        import shutil

        # fresh scratch per file: DROP on an external table leaves its
        # parquet files behind, and a later CREATE at the same location
        # would resurrect stale rows with a mismatched schema.
        scratch = tempfile.mkdtemp(prefix="f_", dir=self.scratch)
        ex = StatementExecutor(self.spark, scratch)
        checked = skipped = 0
        failures: list[str] = []
        skipped_tables: set[str] = set()
        # sqllogictest `control substitution on` variables + relative
        # fixture paths (copy/csv.slt reads 'tests/sql/copy/nation.tbl'
        # relative to the reference checkout root)
        ref_root = path.split("/tests/sql/")[0]
        for rec in parse_slt(path):
            rec.sql = rec.sql.replace("${__TEST_DIR__}", scratch).replace(
                "'tests/sql/", f"'{ref_root}/tests/sql/"
            )
            if any(p in rec.sql for p in skip_patterns):
                m = _CREATE_RE.match(rec.sql)
                if m:
                    # a skipped CREATE poisons every statement touching
                    # that table until its DROP — skip the whole block
                    skipped_tables.add(m.group(2))
                skipped += 1
                continue
            dm = _DROP_RE.match(rec.sql)
            if dm and dm.group(2) in skipped_tables:
                skipped_tables.discard(dm.group(2))
                skipped += 1
                continue
            if skipped_tables and any(
                re.search(rf"\b{t}\b", rec.sql) for t in skipped_tables
            ):
                skipped += 1
                continue
            if rec.kind == "statement_error":
                if any(p in rec.sql for p in error_divergences):
                    # engine deliberately accepts what the reference
                    # rejects (non-ANSI arithmetic, permissive casts) —
                    # documented per-file in tests/test_slt.py
                    skipped += 1
                    continue
                is_q = rec.sql.lstrip().lower().startswith(
                    ("select", "with", "values")
                )
                try:
                    if is_q:
                        ex.execute_query(rec.sql).collect()
                        outcome = "ok"
                    else:
                        outcome = ex.execute_statement(rec.sql)
                except Exception:
                    outcome = "error"
                if outcome == "ok":
                    failures.append(
                        f"expected error, got success: {rec.sql.strip()[:120]}"
                    )
                checked += 1
                continue
            if rec.kind == "statement":
                # dialect semantics (copy-on-write DELETE, CREATE
                # INDEX no-op, PRAGMA mapping, SQL-UDF DDL, scratch
                # CREATE TABLE) live in the shared StatementExecutor —
                # the same code path the interactive shell runs.
                if ex.execute_statement(rec.sql) == "ok":
                    checked += 1
                else:
                    skipped += 1
                continue
            # query
            mc = re.match(r"^\s*\\(dt|di)\s*$", rec.sql.strip())
            if mc:
                rows = ex.metacommand(mc.group(1)).collect()
                got = [[fmt_value(v) for v in row] for row in rows]
                want = [
                    ln.split() for ln in rec.expected if ln.strip() != ""
                ]
                if not _rows_match(sorted(got), sorted(want)):
                    failures.append(
                        f"{rec.sql.strip()[:120]}\n  got:  {got[:8]}"
                        f"\n  want: {want[:8]}"
                    )
                checked += 1
                continue
            sm = _STAT_RE.match(rec.sql.strip())
            if sm:
                # `\stat t col` metacommand: the reference reports
                # (schema, table, col, row_count, distinct_count) from
                # stored block stats (db.rs:129-158); compute the same
                # numbers from the data
                t, c = sm.groups()
                rec = Record(
                    "query",
                    f"SELECT 'postgres', '{t}', '{c}', count(*), "
                    f"count(distinct {c}) FROM {t}",
                    rec.types,
                    rec.rowsort,
                    rec.expected,
                )
            if order_dependent(rec.sql, len(rec.expected)):
                skipped += 1
                continue
            rows = reference_render_datetimes(
                ex.execute_query(rec.sql)
            ).collect()
            got = [[fmt_value(v) for v in row] for row in rows]
            want = [ln.split() for ln in rec.expected if ln.strip() != ""]
            # single-column string results may contain spaces: don't split
            if got and len(got[0]) == 1:
                want = [[ln] for ln in rec.expected if ln.strip() != ""]
            ordered = has_toplevel_order(rec.sql) and not rec.rowsort
            if not ordered:
                got = sorted(got)
                want = sorted(want)
            if not _rows_match(got, want):
                failures.append(
                    f"{rec.sql.strip()[:120]}\n  got:  {got[:8]}\n  want: {want[:8]}"
                )
            checked += 1
        self.created.extend(ex.created)
        return checked, skipped, failures
