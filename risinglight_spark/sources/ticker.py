"""Custom STREAMING source via the Spark 4 Python DataSource API.

Counterpart to the batch `.tbl` connector (sources/tbl.py): a
deterministic synthetic ticker whose offset log is the row index, so
every micro-batch is an exact, replayable offset range —
`readBetweenOffsets` makes batches recoverable after failure, which is
the contract a real connector (Kafka-like) must satisfy.

The reference has no streaming at all (SURVEY §2.7); this completes
the Spark-native connector surface: batch read (tbl), batch write
(COPY), streaming read (here), streaming write (sinks in
streaming/ops.py).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

TICKER_TOTAL = 1000
TICKER_BATCH = 300  # 4 micro-batches: 300+300+300+100


class _TickerReader(SimpleDataSourceStreamReader):
    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + TICKER_BATCH, TICKER_TOTAL)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        # exact replay of a committed batch (failure recovery path)
        return self._rows(start["pos"], end["pos"])

    @staticmethod
    def _rows(lo: int, hi: int):
        # list iterator, not a generator: the prefetch cache copies the
        # iterator (copy.copy), which generators don't support
        return iter([(i, float(i) * 0.5) for i in range(lo, hi)])


class TickerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rl_ticker"

    def schema(self) -> str:
        return "id BIGINT, value DOUBLE"

    def simpleStreamReader(self, schema):
        return _TickerReader()


# -- custom streaming SINK (write side of the connector contract) ------------


class _FileCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class _FileStreamWriter(DataSourceStreamWriter):
    """Transactional file sink: each task writes a staged file and
    reports it in its commit message; commit() publishes the batch
    MANIFEST atomically (rename), so readers only ever see fully
    committed batches — the exactly-once sink contract."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import os
        import uuid

        staged = os.path.join(
            self.path, f"staged-{uuid.uuid4().hex}.csv"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(f"{row.user_id},{row.n}\n")
                n += 1
        return _FileCommitMessage(staged, n)

    def commit(self, messages, batchId):
        import json
        import os

        manifest = os.path.join(self.path, f"manifest-{batchId}.json")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                [{"path": m.path, "n": m.n} for m in messages if m], f
            )
        os.rename(tmp, manifest)

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m and os.path.exists(m.path):
                os.remove(m.path)


class FileSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rl_filesink"

    def schema(self) -> str:
        return "user_id BIGINT, n BIGINT"

    def streamWriter(self, schema, overwrite):
        return _FileStreamWriter(self.options)
