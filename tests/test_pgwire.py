"""pgwire server tests: drive the wire protocol with a minimal
in-test Postgres simple-query client (no client libs in the
container).  Parity target: reference src/server/ — simple query
protocol, text-format fields, OK tag for non-SELECT."""

from __future__ import annotations

import socket
import struct

import pytest

from risinglight_spark.server.pgwire import serve


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    srv = serve(spark, host="127.0.0.1", port=0, data_dir=sf_dir, background=True)
    yield srv
    srv.shutdown()


class MiniPgClient:
    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=60)
        self.buf = b""
        params = b"user\x00test\x00database\x00postgres\x00\x00"
        payload = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        self._drain_until_ready()

    def _read(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise EOFError
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def _msg(self):
        tag = self._read(1)
        (length,) = struct.unpack("!I", self._read(4))
        return tag, self._read(length - 4)

    def _drain_until_ready(self) -> list[tuple[bytes, bytes]]:
        out = []
        while True:
            tag, body = self._msg()
            out.append((tag, body))
            if tag == b"Z":
                return out

    def query(self, sql: str):
        payload = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
        msgs = self._drain_until_ready()
        cols, rows, tags, errs = [], [], [], []
        for tag, body in msgs:
            if tag == b"T":
                (n,) = struct.unpack("!H", body[:2])
                off = 2
                for _ in range(n):
                    end = body.index(b"\x00", off)
                    cols.append(body[off:end].decode())
                    off = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack("!H", body[:2])
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", body[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(body[off : off + ln].decode())
                        off += ln
                rows.append(vals)
            elif tag == b"C":
                tags.append(body.rstrip(b"\x00").decode())
            elif tag == b"E":
                errs.append(body)
        return cols, rows, tags, errs

    def close(self):
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()


@pytest.fixture(scope="module")
def client(server):
    c = MiniPgClient(server.server_address[1])
    yield c
    c.close()


def test_select_over_wire(client):
    cols, rows, tags, errs = client.query(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    )
    assert not errs
    assert cols == ["r_regionkey", "r_name"]
    assert len(rows) == 5 and rows[0][1] == "AFRICA"
    assert tags == ["SELECT 5"]


def test_null_and_types_text_format(client):
    _, rows, _, errs = client.query(
        "SELECT CAST(NULL AS INT) AS a, 1.5 AS b, true AS c"
    )
    assert not errs
    assert rows == [[None, "1.5", "true"]]


def test_statement_gets_ok_tag(client):
    _, _, tags, errs = client.query(
        "CREATE TABLE pg_t(v1 INT NOT NULL, PRIMARY KEY(v1))"
    )
    assert not errs and tags == ["OK"]
    _, _, tags, _ = client.query("INSERT INTO pg_t VALUES (7)")
    assert tags == ["OK"]
    _, rows, _, _ = client.query("SELECT * FROM pg_t")
    assert rows == [["7"]]
    client.query("DROP TABLE pg_t")


def test_error_then_recovers(client):
    *_, errs = client.query("SELECT * FROM nonexistent_table_xyz")
    assert errs
    _, rows, _, errs = client.query("SELECT 1 AS x")
    assert not errs and rows == [["1"]]


def test_multi_statement_query(client):
    _, rows, tags, errs = client.query("SELECT 1 AS a; SELECT 2 AS b")
    assert not errs
    assert tags == ["SELECT 1", "SELECT 1"] and rows == [["1"], ["2"]]


def test_concurrent_clients(server):
    import threading

    port = server.server_address[1]
    results: dict[int, object] = {}

    def worker(i: int) -> None:
        try:
            c = MiniPgClient(port)
            _, rows, _, errs = c.query(
                f"SELECT count(*) AS n FROM lineitem WHERE l_orderkey % 4 = {i % 4}"
            )
            results[i] = rows[0][0] if not errs else f"err:{errs}"
            c.close()
        except Exception as exc:
            results[i] = f"exc:{exc}"

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    assert all(str(v).isdigit() for v in results.values()), results
