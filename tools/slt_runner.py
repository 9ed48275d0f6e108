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


_CREATE_RE = re.compile(r"^\s*create\s+table\s+(if\s+not\s+exists\s+)?(\w+)", re.I)
_DROP_RE = re.compile(r"^\s*drop\s+table\s+(if\s+exists\s+)?(\w+)", re.I)


def rewrite_ddl(sql: str, scratch: str) -> tuple[str, str | None]:
    """Returns (rewritten_sql, created_table_name_or_None)."""
    m = _CREATE_RE.match(sql)
    if not m:
        return rewrite_query(sql), None
    name = m.group(2)
    s = re.sub(r"\bnot\s+null\b", "", sql, flags=re.I)
    # explicit nullable constraint (`v1 int null`) — also advisory
    s = re.sub(
        r"(?i)\b(int|integer|bigint|smallint|tinyint|double|float|real|"
        r"string|boolean|bool|date|timestamp|decimal(?:\([^)]*\))?)\s+null\b",
        r"\1",
        s,
    )
    # table-level `primary key (a, b)` first, then column-level
    s = re.sub(r",\s*primary\s+key\s*\([^)]*\)", "", s, flags=re.I)
    s = re.sub(r"\bprimary\s+key\b", "", s, flags=re.I)
    s = re.sub(r"\bvarchar\b(\s*\(\s*\d+\s*\))?", "STRING", s, flags=re.I)
    s = s.rstrip().rstrip(";")
    s += f" USING parquet LOCATION '{scratch}/{name}'"
    return s, name


def rewrite_query(sql: str) -> str:
    # single-quoted aliases -> backticks (Spark rejects `as 'x'`)
    sql = re.sub(r"(?i)\bas\s+'([^']*)'", r"as `\1`", sql)
    # era suffix in timestamp/date literals ('... AD') is reference
    # dialect; strip it (same instant)
    sql = re.sub(
        r"(?i)((?:timestamp|date)\s*'[^']*?)\s+AD'", r"\1'", sql
    )
    return sql


def _toplevel(sql: str) -> str:
    """sql with parenthesized groups removed (so an ORDER BY inside a
    subquery does not count as output ordering)."""
    prev = None
    while prev != sql:
        prev = sql
        sql = re.sub(r"\([^()]*\)", " ", sql)
    return sql


def has_toplevel_order(sql: str) -> bool:
    return bool(re.search(r"\border\s+by\b", _toplevel(sql), re.I))


def order_dependent(sql: str, expected_rows: int) -> bool:
    """Expectations that depend on physical row order are meaningless
    in a parallel engine (and in sqllogictest generally): LIMIT/OFFSET
    without ORDER BY, and first()/last() over an unordered scan."""
    if has_toplevel_order(sql):
        return False
    if re.search(r"\b(limit|offset)\b", sql, re.I):
        return True
    if re.search(r"\b(first|last)\s*\(", sql, re.I):
        return True
    return False


def fmt_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v.is_integer():
            return str(int(v))
        return repr(v)
    if isinstance(v, str):
        return v if v != "" else "(empty)"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return str(v)


def _cells_match(got: str, want: str) -> bool:
    if got == want:
        return True
    try:
        g, w = float(got), float(want)
    except ValueError:
        return False
    if math.isnan(g) and math.isnan(w):
        return True
    return math.isclose(g, w, rel_tol=1e-6, abs_tol=1e-9)


def _rows_match(got: list[list[str]], want: list[list[str]]) -> bool:
    if len(got) != len(want):
        return False
    return all(
        len(g) == len(w) and all(_cells_match(a, b) for a, b in zip(g, w))
        for g, w in zip(got, want)
    )


class SltRunner:
    def __init__(self, spark):
        self.spark = spark
        self.scratch = tempfile.mkdtemp(prefix="rl_slt_")
        self.created: list[str] = []

    def cleanup(self) -> None:
        for t in self.created:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass

    def run_file(
        self, path: str, skip_patterns: tuple[str, ...] = ()
    ) -> tuple[int, int, list[str]]:
        """Returns (n_checked, n_skipped, failures).  ``skip_patterns``
        are substrings of statements known to be dialect-incompatible
        (documented per-file in tests/test_slt.py)."""
        import os
        import shutil

        # fresh scratch per file: DROP on an external table leaves its
        # parquet files behind, and a later CREATE at the same location
        # would resurrect stale rows with a mismatched schema.
        scratch = tempfile.mkdtemp(prefix="f_", dir=self.scratch)
        checked = skipped = 0
        failures: list[str] = []
        skipped_tables: set[str] = set()
        for rec in parse_slt(path):
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
                skipped += 1
                continue
            if rec.kind == "statement":
                if re.match(r"\s*delete\b", rec.sql, re.I):
                    # DELETE needs a v2/Delta table (covered by the
                    # copy-on-write ddl_create_insert_delete query);
                    # table state diverges from here, so stop the file.
                    skipped += 1
                    break
                sql, created = rewrite_ddl(rec.sql, scratch)
                if created:
                    self.spark.sql(f"DROP TABLE IF EXISTS {created}")
                    shutil.rmtree(
                        os.path.join(scratch, created), ignore_errors=True
                    )
                    self.created.append(created)
                self.spark.sql(sql)
                checked += 1
                continue
            # query
            if order_dependent(rec.sql, len(rec.expected)):
                skipped += 1
                continue
            rows = self.spark.sql(rewrite_query(rec.sql)).collect()
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
        return checked, skipped, failures
