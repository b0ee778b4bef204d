"""PostgreSQL wire-protocol server over the Engine — the Spark rendering
of src/server/src/postgresql/{service.rs,handler.rs} (pgwire around
Proxy::handle_http_sql_query).

Surface parity:
- startup: SSLRequest refused with 'N' (cleartext, like the reference's
  non-TLS default), AuthenticationOk with no credential check, parameter
  status + ReadyForQuery; simple-query protocol ('Q'), plus the extended
  query protocol (Parse/Bind/Describe/Execute/Sync/Close/Flush) with
  TEXT-format parameters — the first thing a JDBC/psycopg client does on
  a parameterized query (beyond-reference: pgwire's SimpleQueryHandler
  in the reference answers only 'Q').  Binary-format parameters and
  binary result columns are rejected with a clear error.  Describe on an
  unbound STATEMENT answers ParameterDescription + NoData (row metadata
  requires bound parameters here); Describe on a PORTAL plans the query
  lazily (DataFrame schema, no job) and shares the one execution with
  the following Execute.
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


# numeric parameter OIDs whose text values may be inlined unquoted
_NUMERIC_OIDS = {OID_INT2, OID_INT4, OID_INT8, OID_FLOAT4, OID_FLOAT8, 1700}
_NUM_RE_TXT = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"


def _read_cstr(body: bytes, off: int) -> tuple[str, int]:
    end = body.index(b"\x00", off)
    return body[off:end].decode("utf-8", "replace"), end + 1


def _sql_literal(text: str, oid: int) -> str:
    """Render a text-format parameter as a SQL literal.  Declared numeric
    OIDs inline raw (validated); booleans render TRUE/FALSE; everything
    else — including undeclared (OID 0) — becomes a quoted string, which
    the engine's implicit coercion handles in comparisons.  Quotes AND
    backslashes are doubled (the engine lexes Hive-style escapes)."""
    import re as _re

    if oid in _NUMERIC_OIDS:
        if not _re.match(_NUM_RE_TXT, text):
            raise ValueError(f"invalid numeric parameter {text!r}")
        return text
    if oid == OID_BOOL:
        if text.lower() in ("t", "true", "1", "on", "yes"):
            return "TRUE"
        if text.lower() in ("f", "false", "0", "off", "no"):
            return "FALSE"
        raise ValueError(f"invalid boolean parameter {text!r}")
    # the engine lexes BOTH doubled quotes and backslash escapes
    # (spark.sql Hive-style strings) — a bare backslash in the parameter
    # would otherwise swallow the closing quote (r7 review: parameter-to-
    # SQL injection via "x\\' OR 1=1 --"); double both
    return "'" + text.replace("\\", "\\\\").replace("'", "''") + "'"


def _substitute_params(sql: str, params: list[str | None], oids: list[int]) -> str:
    """Replace $1..$n placeholders (outside single-quoted strings and
    dollar-quoting-free — the dialect has no $$ bodies) with rendered
    literals."""
    out: list[str] = []
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                # doubled quote stays inside the string
                if i + 1 < n and sql[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            out.append(ch)
            i += 1
            continue
        if ch == "$" and i + 1 < n and sql[i + 1].isdigit():
            j = i + 1
            while j < n and sql[j].isdigit():
                j += 1
            idx = int(sql[i + 1 : j])
            if not (1 <= idx <= len(params)):
                raise ValueError(f"parameter ${idx} not bound")
            v = params[idx - 1]
            oid = oids[idx - 1] if idx - 1 < len(oids) else 0
            out.append("NULL" if v is None else _sql_literal(v, oid))
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


class _Prepared:
    __slots__ = ("sql", "param_oids")

    def __init__(self, sql: str, param_oids: list[int]):
        self.sql = sql
        self.param_oids = param_oids


class _Portal:
    """A bound portal: the substituted SQL plus a memoized execution so
    Describe and Execute share ONE engine call (a Describe on a DDL/INSERT
    portal performs the side effect then; Execute reports its tag)."""

    __slots__ = ("sql", "_result", "_ran")

    def __init__(self, sql: str):
        self.sql = sql
        self._result = None
        self._ran = False

    def result(self, engine):
        if not self._ran:
            self._result = engine.execute_sql(self.sql)
            self._ran = True
        return self._result


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
                # extended-protocol state (per connection, like pgwire)
                stmts: dict[str, _Prepared] = {}
                portals: dict[str, _Portal] = {}
                in_error = False  # after an extended-flow error: skip to Sync
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
                        if mtype == b"S":  # Sync — always answered
                            in_error = False
                            conn.send_ready()
                            continue
                        if in_error:
                            continue  # discard until Sync (protocol rule)
                        if mtype == b"Q":
                            outer._query(conn, body.rstrip(b"\x00").decode("utf-8", "replace"))
                            conn.send_ready()
                        elif mtype in (b"P", b"B", b"D", b"E", b"C", b"H"):
                            try:
                                outer._extended(conn, mtype, body, stmts, portals)
                            except Exception as e:  # noqa: BLE001 — protocol boundary
                                conn.send_error(str(e))
                                in_error = True
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

    # -------------------------------------------- extended query protocol
    def _extended(self, conn, mtype, body, stmts, portals) -> None:
        if mtype == b"P":  # Parse: name, query, n param type OIDs
            name, off = _read_cstr(body, 0)
            sql, off = _read_cstr(body, off)
            (n_oids,) = struct.unpack_from("!h", body, off)
            off += 2
            oids = [
                struct.unpack_from("!I", body, off + 4 * k)[0]
                for k in range(max(n_oids, 0))
            ]
            if len(stmts) >= 256 and name not in stmts:
                raise ValueError("too many prepared statements (max 256)")
            stmts[name] = _Prepared(sql, oids)
            conn.send(b"1")  # ParseComplete
        elif mtype == b"B":  # Bind: portal, stmt, formats, params, result formats
            portal, off = _read_cstr(body, 0)
            sname, off = _read_cstr(body, off)
            if sname not in stmts:
                raise ValueError(f"unknown prepared statement {sname!r}")
            (nfmt,) = struct.unpack_from("!h", body, off)
            off += 2
            fmts = [
                struct.unpack_from("!h", body, off + 2 * k)[0] for k in range(nfmt)
            ]
            off += 2 * nfmt
            (nparams,) = struct.unpack_from("!h", body, off)
            off += 2
            params: list[str | None] = []
            for k in range(nparams):
                fmt = fmts[k] if k < len(fmts) else (fmts[0] if len(fmts) == 1 else 0)
                (plen,) = struct.unpack_from("!i", body, off)
                off += 4
                if plen < 0:
                    params.append(None)
                    continue
                raw = body[off : off + plen]
                off += plen
                if fmt != 0:
                    raise ValueError(
                        "binary-format parameters are not supported "
                        "(send text format)"
                    )
                params.append(raw.decode("utf-8", "replace"))
            (nres,) = struct.unpack_from("!h", body, off)
            off += 2
            for k in range(nres):
                if struct.unpack_from("!h", body, off + 2 * k)[0] != 0:
                    raise ValueError(
                        "binary-format result columns are not supported"
                    )
            st = stmts[sname]
            if len(portals) >= 256 and portal not in portals:
                raise ValueError("too many open portals (max 256)")
            portals[portal] = _Portal(
                _substitute_params(st.sql, params, st.param_oids)
            )
            conn.send(b"2")  # BindComplete
        elif mtype == b"D":  # Describe 'S' statement | 'P' portal
            kind, name = body[:1], _read_cstr(body, 1)[0]
            if kind == b"S":
                if name not in stmts:
                    raise ValueError(f"unknown prepared statement {name!r}")
                st = stmts[name]
                oids = st.param_oids or [0] * _count_placeholders(st.sql)
                conn.send(
                    b"t",
                    struct.pack("!h", len(oids))
                    + b"".join(struct.pack("!I", o) for o in oids),
                )
                conn.send(b"n")  # NoData: row metadata requires bound params
            else:
                if name not in portals:
                    raise ValueError(f"unknown portal {name!r}")
                p = portals[name]
                if not p.sql.strip():
                    conn.send(b"n")  # NoData (empty portal)
                    return
                result = p.result(self.engine)
                if result is None or isinstance(result, int):
                    conn.send(b"n")  # NoData
                else:
                    conn.send(b"T", _row_description(result))
        elif mtype == b"E":  # Execute: portal, max rows (0 = all; we send all)
            name = _read_cstr(body, 0)[0]
            if name not in portals:
                raise ValueError(f"unknown portal {name!r}")
            p = portals[name]
            if not p.sql.strip():
                conn.send(b"I")  # EmptyQueryResponse
                return
            result = p.result(self.engine)
            if result is None:
                conn.send_command_complete(_ddl_tag(p.sql.strip().lower()))
            elif isinstance(result, int):
                conn.send_command_complete(f"INSERT 0 {result}")
            else:
                n = self._send_data_rows(conn, result)
                conn.send_command_complete(f"SELECT {n}")
        elif mtype == b"C":  # Close 'S' | 'P'
            kind, name = body[:1], _read_cstr(body, 1)[0]
            (stmts if kind == b"S" else portals).pop(name, None)
            conn.send(b"3")  # CloseComplete
        elif mtype == b"H":  # Flush — everything is sent eagerly already
            pass

    def _send_rows(self, conn: _Conn, df) -> int:
        conn.send(b"T", _row_description(df))
        return self._send_data_rows(conn, df)

    def _send_data_rows(self, conn: _Conn, df) -> int:
        rows = df.select(*_text_exprs(df)).collect()
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


def _row_description(df) -> bytes:
    """RowDescription body per handler.rs convert_data_type OIDs; all
    columns text format (code 0)."""
    fields = b""
    for i, f in enumerate(df.schema.fields):
        oid = _SPARK_TO_OID.get(f.dataType.typeName(), OID_TEXT)
        fields += (
            f.name.encode() + b"\x00"
            + struct.pack("!IhIhih", 0, i + 1, oid, -1, -1, 0)
        )
    return struct.pack("!h", len(df.schema.fields)) + fields


def _text_exprs(df):
    """Per-column text-encoding expressions (handler.rs encode_data parity:
    timestamps as epoch-ms i64, binary via UTF-8 text)."""
    from pyspark.sql import functions as F

    exprs = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        if tn in ("timestamp", "timestamp_ntz"):
            exprs.append(
                F.unix_millis(F.col(f"`{f.name}`").cast("timestamp")).alias(f.name)
            )
        elif tn == "binary":
            exprs.append(F.col(f"`{f.name}`").cast("string").alias(f.name))
        else:
            exprs.append(F.col(f"`{f.name}`"))
    return exprs


def _count_placeholders(sql: str) -> int:
    """Highest $n outside single-quoted strings (0 when none)."""
    hi, i, n, in_str = 0, 0, len(sql), False
    while i < n:
        ch = sql[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "$" and i + 1 < n and sql[i + 1].isdigit():
            j = i + 1
            while j < n and sql[j].isdigit():
                j += 1
            hi = max(hi, int(sql[i + 1 : j]))
            i = j
            continue
        i += 1
    return hi


def _ddl_tag(low: str) -> str:
    for kw, tag in (
        ("create", "CREATE TABLE"),
        ("drop", "DROP TABLE"),
        ("alter", "ALTER TABLE"),
    ):
        if low.startswith(kw):
            return tag
    return "OK"
