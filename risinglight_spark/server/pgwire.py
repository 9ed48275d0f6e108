r"""Minimal PostgreSQL wire-protocol server over the engine.

The reference serves the simple-query protocol via pgwire on :5432
(reference: src/server/mod.rs:18-37, src/server/processor.rs:26-75 —
NoopStartupHandler, every result field sent as text).  This is the
same surface in pure Python on top of the shared dialect/executor
layer, so any Postgres client (psql, psycopg, JDBC) can run
reference-dialect SQL against Spark:

    python -m risinglight_spark.server [--port 5432] [--data DIR]

Protocol subset (all a simple-query client needs):
- SSLRequest -> 'N' (no TLS), StartupMessage -> AuthenticationOk +
  ParameterStatus + ReadyForQuery,
- 'Q' simple query -> RowDescription / DataRow* / CommandComplete /
  ReadyForQuery (every field text-format, like the reference),
- errors -> ErrorResponse ('S'/'C'/'M' fields) + ReadyForQuery,
- 'X' terminate.

Scale note: the server is a thin coordinator — each connection drives
Spark jobs on the shared session; result sets stream row-by-row off
``DataFrame.toLocalIterator`` so the driver never holds more than one
partition of a large result.
"""

from __future__ import annotations

import argparse
import os
import socketserver
import struct
import sys
import threading

from risinglight_spark.sql.dialect import fmt_value
from risinglight_spark.sql.shell import Shell, is_query

_SSL_REQUEST = 80877103
_CANCEL_REQUEST = 80877102

# every field is sent as text, like the reference (processor.rs: all
# FieldInfo are Type::CHAR / FieldFormat::Text)
_TEXT_OID = 25


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _Handler(socketserver.StreamRequestHandler):
    def _send(self, tag: bytes, payload: bytes) -> None:
        self.wfile.write(_msg(tag, payload))

    def _ready(self) -> None:
        self._send(b"Z", b"I")
        self.wfile.flush()

    def _error(self, message: str) -> None:
        fields = b"".join(
            [b"S" + _cstr("ERROR"), b"C" + _cstr("XX000"), b"M" + _cstr(message)]
        ) + b"\x00"
        self._send(b"E", fields)

    def _startup(self) -> bool:
        while True:
            raw = self.rfile.read(4)
            if len(raw) < 4:
                return False
            (length,) = struct.unpack("!I", raw)
            body = self.rfile.read(length - 4)
            (code,) = struct.unpack("!I", body[:4])
            if code == _SSL_REQUEST:
                self.wfile.write(b"N")
                self.wfile.flush()
                continue
            if code == _CANCEL_REQUEST:
                return False
            # StartupMessage (protocol 3.0) — accept anyone, like the
            # reference's NoopStartupHandler
            self._send(b"R", struct.pack("!I", 0))  # AuthenticationOk
            for k, v in (
                ("server_version", "15.0 (risinglight_spark)"),
                ("client_encoding", "UTF8"),
                ("DateStyle", "ISO"),
            ):
                self._send(b"S", _cstr(k) + _cstr(v))
            self._ready()
            return True

    def _run_query(self, sql: str) -> None:
        shell: Shell = self.server.shell  # type: ignore[attr-defined]
        for stmt in [s for s in sql.split(";") if s.strip()]:
            out = shell.run(stmt)
            if out is None:
                continue
            if isinstance(out, str):  # statement outcome
                self._send(b"C", _cstr("OK"))
                continue
            cols = out.columns
            rowdesc = struct.pack("!H", len(cols)) + b"".join(
                _cstr(c)
                + struct.pack("!IhIhih", 0, 0, _TEXT_OID, -1, -1, 0)
                for c in cols
            )
            self._send(b"T", rowdesc)
            n = 0
            for row in out.toLocalIterator():
                fields = [fmt_value(v) if v is not None else None for v in row]
                payload = [struct.pack("!H", len(fields))]
                for f in fields:
                    if f is None:
                        payload.append(struct.pack("!i", -1))
                    else:
                        b = f.encode()
                        payload.append(struct.pack("!I", len(b)) + b)
                self._send(b"D", b"".join(payload))
                n += 1
            self._send(b"C", _cstr(f"SELECT {n}"))

    def handle(self) -> None:
        if not self._startup():
            return
        while True:
            tag = self.rfile.read(1)
            if not tag or tag == b"X":
                return
            raw = self.rfile.read(4)
            if len(raw) < 4:
                return
            (length,) = struct.unpack("!I", raw)
            body = self.rfile.read(length - 4)
            if tag != b"Q":
                self._error(f"unsupported message type {tag!r} "
                            "(simple query protocol only)")
                self._ready()
                continue
            sql = body.rstrip(b"\x00").decode()
            try:
                self._run_query(sql)
            except Exception as exc:  # surface as ErrorResponse
                self._error(str(exc).splitlines()[0][:500])
            self._ready()


class PgServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, shell: Shell):
        super().__init__(addr, _Handler)
        self.shell = shell


def serve(
    spark=None,
    host: str = "127.0.0.1",
    port: int = 5432,
    data_dir: str | None = None,
    background: bool = False,
) -> PgServer:
    if spark is None:
        from risinglight_spark.session import get_spark

        spark = get_spark(app_name="risinglight_spark_server")
    shell = Shell(spark, data_dir)
    server = PgServer((host, port), shell)
    if background:
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
    print(f"listening on {host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return server


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m risinglight_spark.server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5432)
    ap.add_argument(
        "--data",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args(argv)
    serve(
        host=args.host,
        port=args.port,
        data_dir=args.data if os.path.isdir(args.data) else None,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
