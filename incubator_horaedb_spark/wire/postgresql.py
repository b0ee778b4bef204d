"""PostgreSQL wire-protocol server over the Engine — the Spark rendering
of src/server/src/postgresql/{service.rs,handler.rs} (pgwire around
Proxy::handle_http_sql_query).

Surface parity:
- startup: SSLRequest refused with 'N' (cleartext, like the reference's
  non-TLS default), AuthenticationOk with no credential check, parameter
  status + ReadyForQuery; simple-query protocol ('Q') only — the extended
  protocol is not offered, matching pgwire's SimpleQueryHandler use.
- type OIDs = handler.rs convert_data_type: Timestamp → TIMESTAMP(1114),
  Double → FLOAT8, Float → FLOAT4, Varbinary → BYTEA, String → TEXT,
  Int64 → INT8, Int32 → INT4, Int16 → INT2, Boolean → BOOL.
- values text-encoded per handler.rs encode_data — timestamps are the
  epoch-millisecond i64 (`Datum::Timestamp(t) => encode_field(&t.as_i64())`),
  NOT a formatted datetime; booleans are 't'/'f' (pgwire bool text).

The sequence mirrored in tests/test_wire_postgresql.py is
integration_tests/postgresql/basic.sh: show tables / select 1, now() /
drop-if-exists / CREATE TABLE demo / INSERT / SELECT * FROM demo.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

SSL_REQUEST_CODE = 80877103
CANCEL_REQUEST_CODE = 80877102
PROTOCOL_V3 = 196608

# handler.rs convert_data_type → pg catalog OIDs
OID_NAME = 19
OID_TIMESTAMP = 1114
OID_FLOAT8 = 701
OID_FLOAT4 = 700
OID_BYTEA = 17
OID_TEXT = 25
OID_INT8 = 20
OID_INT4 = 23
OID_INT2 = 21
OID_CHAR = 18
OID_BOOL = 16

_SPARK_TO_OID = {
    "timestamp": OID_TIMESTAMP,
    "timestamp_ntz": OID_TIMESTAMP,
    "double": OID_FLOAT8,
    "float": OID_FLOAT4,
    "binary": OID_BYTEA,
    "string": OID_TEXT,
    "long": OID_INT8,
    "integer": OID_INT4,
    "short": OID_INT2,
    "byte": OID_CHAR,
    "boolean": OID_BOOL,
    "void": OID_NAME,
}


class _Conn:
    def __init__(self, sock: socket.socket):
        self.sock = sock

    def _read_n(self, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    # frame-length sanity caps: a malformed length field must neither
    # underflow the body read nor commit this thread to receiving
    # gigabytes that never arrive (hang).  Startup is tiny by protocol;
    # regular messages are capped like MySQL's 16 MB max frame.
    MAX_STARTUP = 1 << 20
    MAX_MESSAGE = 16 << 20

    def read_startup(self) -> tuple[int, bytes] | None:
        head = self._read_n(4)
        if head is None:
            return None
        (length,) = struct.unpack("!I", head)
        if length < 8 or length > self.MAX_STARTUP:
            return None  # malformed frame — close the connection
        body = self._read_n(length - 4)
        if body is None or len(body) < 4:
            return None
        (code,) = struct.unpack("!I", body[:4])
        return code, body[4:]

    def read_message(self) -> tuple[bytes, bytes] | None:
        head = self._read_n(5)
        if head is None:
            return None
        mtype, length = head[:1], struct.unpack("!I", head[1:])[0]
        if length < 4 or length > self.MAX_MESSAGE:
            return None  # malformed frame — close the connection
        body = self._read_n(length - 4)
        return (mtype, body if body is not None else b"")

    def send(self, mtype: bytes, body: bytes = b"") -> None:
        self.sock.sendall(mtype + struct.pack("!I", len(body) + 4) + body)

    # ---- standard responses ----
    def send_auth_ok(self) -> None:
        self.send(b"R", struct.pack("!I", 0))

    def send_parameter_status(self, k: str, v: str) -> None:
        self.send(b"S", k.encode() + b"\x00" + v.encode() + b"\x00")

    def send_ready(self) -> None:
        self.send(b"Z", b"I")

    def send_error(self, message: str, sqlstate: str = "XX000") -> None:
        body = (
            b"SERROR\x00"
            + b"C" + sqlstate.encode() + b"\x00"
            + b"M" + message.encode()[:800] + b"\x00"
            + b"\x00"
        )
        self.send(b"E", body)

    def send_command_complete(self, tag: str) -> None:
        self.send(b"C", tag.encode() + b"\x00")


class PostgresServer:
    """Threaded PostgreSQL-protocol endpoint over an Engine (service.rs
    analogue; one handler per connection)."""

    def __init__(
        self, engine, host: str = "127.0.0.1", port: int = 0,
        idle_timeout: float | None = 600.0,
    ):
        self.engine = engine
        self.idle_timeout = idle_timeout
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                # see MySQLServer: bounds partial-frame recv so a worker
                # thread can never block forever on a peer that stalls
                self.request.settimeout(outer.idle_timeout)
                conn = _Conn(self.request)
                try:
                    if not outer._startup(conn):
                        return
                    while True:
                        msg = conn.read_message()
                        if msg is None:
                            return
                        mtype, body = msg
                        if mtype == b"X":  # Terminate
                            return
                        if mtype == b"Q":
                            outer._query(conn, body.rstrip(b"\x00").decode("utf-8", "replace"))
                            conn.send_ready()
                        else:
                            conn.send_error(f"unsupported message {mtype!r}")
                            conn.send_ready()
                except (ConnectionError, BrokenPipeError, OSError):
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self.port = self.server.server_address[1]
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ protocol
    def _startup(self, conn: _Conn) -> bool:
        while True:
            su = conn.read_startup()
            if su is None:
                return False
            code, _params = su
            if code == SSL_REQUEST_CODE:
                conn.sock.sendall(b"N")  # no TLS; client retries cleartext
                continue
            if code == CANCEL_REQUEST_CODE:
                return False
            if code != PROTOCOL_V3:
                conn.send_error(f"unsupported protocol {code}")
                return False
            break
        conn.send_auth_ok()
        conn.send_parameter_status("server_version", "13.0-HoraeDB-Spark")
        conn.send_parameter_status("client_encoding", "UTF8")
        conn.send_parameter_status("DateStyle", "ISO")
        conn.send(b"K", struct.pack("!II", threading.get_ident() & 0x7FFFFFFF, 0))
        conn.send_ready()
        return True

    def _query(self, conn: _Conn, sql: str) -> None:
        if not sql.strip():
            conn.send(b"I")  # EmptyQueryResponse
            return
        try:
            result = self.engine.execute_sql(sql)
        except Exception as e:  # noqa: BLE001 — protocol boundary
            conn.send_error(str(e))
            return
        low = sql.strip().lower()
        if result is None:
            conn.send_command_complete(_ddl_tag(low))
        elif isinstance(result, int):
            conn.send_command_complete(f"INSERT 0 {result}")
        else:
            n = self._send_rows(conn, result)
            conn.send_command_complete(f"SELECT {n}")

    def _send_rows(self, conn: _Conn, df) -> int:
        from pyspark.sql import functions as F

        fields = b""
        exprs = []
        for i, f in enumerate(df.schema.fields):
            tn = f.dataType.typeName()
            oid = _SPARK_TO_OID.get(tn, OID_TEXT)
            fields += (
                f.name.encode() + b"\x00"
                + struct.pack("!IhIhih", 0, i + 1, oid, -1, -1, 0)
            )
            if tn in ("timestamp", "timestamp_ntz"):
                # epoch-ms i64, handler.rs encode_data Timestamp parity
                exprs.append(
                    F.unix_millis(F.col(f"`{f.name}`").cast("timestamp")).alias(f.name)
                )
            elif tn == "binary":
                exprs.append(F.col(f"`{f.name}`").cast("string").alias(f.name))
            else:
                exprs.append(F.col(f"`{f.name}`"))
        conn.send(b"T", struct.pack("!h", len(df.schema.fields)) + fields)
        rows = df.select(*exprs).collect()
        for row in rows:
            body = struct.pack("!h", len(row))
            for v in row:
                if v is None:
                    body += struct.pack("!i", -1)
                else:
                    if isinstance(v, bool):
                        s = b"t" if v else b"f"  # pgwire bool text format
                    else:
                        s = str(v).encode()
                    body += struct.pack("!i", len(s)) + s
            conn.send(b"D", body)
        return len(rows)

    # ----------------------------------------------------------- lifecycle
    def start(self) -> "PostgresServer":
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def _ddl_tag(low: str) -> str:
    for kw, tag in (
        ("create", "CREATE TABLE"),
        ("drop", "DROP TABLE"),
        ("alter", "ALTER TABLE"),
    ):
        if low.startswith(kw):
            return tag
    return "OK"
