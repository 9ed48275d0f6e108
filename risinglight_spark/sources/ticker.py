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

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

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
