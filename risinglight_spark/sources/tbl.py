"""TPC-H ``.tbl`` source connector via the Spark 4 Python DataSource
API (`pyspark.sql.datasource`).

The reference ingests TPC-H tables from pipe-delimited ``.tbl`` files
with a TRAILING pipe per line (reference tests/sql/tpch/_create.slt
``COPY ... DELIMITER '|'`` over tbl/*.tbl) — that trailing delimiter is
exactly what a plain CSV reader mis-parses as an extra empty column, so
the format earns a real connector.

Scale shape: ``partitions()`` plans one input split per file, so a
directory of shard files reads with full parallelism (the writer side
below emits one file per task); per-row parsing happens executor-side
in the reader, never on the driver.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


def _converter(dt_name: str):
    if dt_name in ("integer", "int"):
        return int
    if dt_name in ("long", "bigint"):
        return int
    if dt_name == "double":
        return float
    if dt_name == "date":
        return datetime.date.fromisoformat
    return str


class TblDataSource(DataSource):
    """``spark.read.format("rl_tbl").schema(...).load(dir_or_file)``"""

    @classmethod
    def name(cls) -> str:
        return "rl_tbl"

    def schema(self):
        # schema is required (tbl files carry no header), mirroring the
        # reference's COPY which reads into a pre-declared table
        raise Exception("rl_tbl requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> "TblReader":
        return TblReader(schema, self.options)


class TblReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.path = options.get("path")
        if not self.path:
            raise Exception("rl_tbl requires a load(path)")

    def partitions(self):
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if not f.startswith(("_", "."))
            )
        else:
            files = [p]
        # one split per file: a sharded directory scans in parallel
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        convs = [_converter(f.dataType.typeName()) for f in self.schema_.fields]
        ncol = len(convs)
        with open(partition.value, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                # TPC-H tbl: trailing '|' -> split yields ncol fields
                # plus one empty tail cell, which we drop
                cells = line.split("|")[:ncol]
                yield tuple(
                    None if c == "" else conv(c)
                    for conv, c in zip(convs, cells)
                )


def register_tbl_source(spark) -> None:
    """Idempotent registration of the connector on a session."""
    key = "rl.tbl_source_registered"
    if spark.conf.get(key, "") != "1":
        spark.dataSource.register(TblDataSource)
        spark.conf.set(key, "1")
