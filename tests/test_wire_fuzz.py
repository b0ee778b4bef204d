"""Wire-protocol error-path fuzz (VERDICT r05 next-round #7): malformed
frames — truncated packets, garbage bytes, oversized/undersized length
fields, bad UTF-8 — must neither crash the accept loop nor hang a worker
thread.  After every malformed exchange the same server must still answer
a well-formed session.

Runs against a stub engine (no Spark): the frames under test never reach
SQL execution, and the aliveness probe only needs execute_sql to return.
"""

from __future__ import annotations

import socket
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.wire.mysql import MySQLServer
from incubator_horaedb_spark.wire.postgresql import PostgresServer

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class StubEngine:
    def execute_sql(self, sql: str):
        return 1  # affected-rows path: OK packet / CommandComplete


@pytest.fixture(scope="module")
def mysql_srv():
    srv = MySQLServer(StubEngine(), idle_timeout=2.0).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def pg_srv():
    srv = PostgresServer(StubEngine(), idle_timeout=2.0).start()
    yield srv
    srv.stop()


# ---------------------------------------------------------------- helpers


def _half_close(sock: socket.socket) -> None:
    """shutdown(SHUT_WR), tolerating the server having ALREADY closed:
    after garbage input the server's close/RST legitimately races our
    shutdown on a loaded host (ENOTCONN / EPIPE here is the server doing
    its job, not a hang — the property under test)."""
    try:
        sock.shutdown(socket.SHUT_WR)
    except OSError:
        pass


def _drain_until_closed(sock: socket.socket, limit: int = 1 << 20) -> bytes:
    """Read until the server closes (or our timeout proves it hung)."""
    got = b""
    while len(got) < limit:
        try:
            chunk = sock.recv(65536)
        except socket.timeout:
            return got
        if not chunk:
            return got
        got += chunk
    return got


def _mysql_alive(port: int) -> None:
    """Full well-formed session: handshake + COM_QUERY + COM_QUIT."""
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        s.settimeout(5)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))  # greeting
        payload = (
            struct.pack("<IIB", 0x0200 | 0x8000, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00\x00"
        )
        _send_mysql(s, 1, payload)
        head = _read_n(s, 4)
        ok = _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        assert ok[0] == 0x00
        _send_mysql(s, 0, b"\x03INSERT INTO t VALUES (1)")
        head = _read_n(s, 4)
        resp = _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        assert resp[0] == 0x00  # OK with affected_rows from the stub
        _send_mysql(s, 0, b"\x01")


def _read_n(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("closed")
        buf += chunk
    return buf


def _send_mysql(sock: socket.socket, seq: int, payload: bytes) -> None:
    sock.sendall(struct.pack("<I", len(payload))[:3] + bytes([seq]) + payload)


def _pg_alive(port: int) -> None:
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        s.settimeout(5)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        body = b"INSERT INTO t VALUES (1)\x00"
        s.sendall(b"Q" + struct.pack("!I", 4 + len(body)) + body)
        _pg_read_until_ready(s)
        s.sendall(b"X" + struct.pack("!I", 4))


def _pg_read_until_ready(sock: socket.socket) -> list[bytes]:
    msgs = []
    while True:
        mtype = _read_n(sock, 1)
        (length,) = struct.unpack("!I", _read_n(sock, 4))
        body = _read_n(sock, length - 4) if length > 4 else b""
        msgs.append(mtype + body)
        if mtype == b"Z":
            return msgs


# ------------------------------------------------------------------ MySQL


@settings(**_SETTINGS)
@given(garbage=st.binary(min_size=0, max_size=300))
def test_mysql_garbage_handshake_response(mysql_srv, garbage):
    """Arbitrary bytes in place of HandshakeResponse41 must not kill the
    server; the connection ends (error or close), the next is served."""
    with socket.create_connection(("127.0.0.1", mysql_srv.port), timeout=5) as s:
        s.settimeout(4)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        s.sendall(garbage)
        _half_close(s)
        _drain_until_closed(s)
    _mysql_alive(mysql_srv.port)


@settings(**_SETTINGS)
@given(cmd=st.integers(min_value=0, max_value=255), body=st.binary(max_size=64))
def test_mysql_unknown_command_gets_error_not_crash(mysql_srv, cmd, body):
    with socket.create_connection(("127.0.0.1", mysql_srv.port), timeout=5) as s:
        s.settimeout(4)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        payload = (
            struct.pack("<IIB", 0x0200 | 0x8000, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00\x00"
        )
        _send_mysql(s, 1, payload)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        _send_mysql(s, 0, bytes([cmd]) + body)
        # server must answer (OK/ERR/resultset) or close — never hang;
        # COM_QUIT (0x01) and empty-close paths just end the connection
        try:
            head = _read_n(s, 4)
            _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        except ConnectionError:
            pass
    _mysql_alive(mysql_srv.port)


@settings(**_SETTINGS)
@given(claimed=st.integers(min_value=1, max_value=0xFFFFFF))
def test_mysql_truncated_frame_times_out_not_hangs(mysql_srv, claimed):
    """A header claiming more bytes than we send: the 2 s idle timeout
    must close the connection instead of blocking the worker forever."""
    with socket.create_connection(("127.0.0.1", mysql_srv.port), timeout=5) as s:
        s.settimeout(8)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        s.sendall(struct.pack("<I", claimed)[:3] + b"\x01")  # header only
        # do NOT close our side — the server's timeout has to fire
        got = _drain_until_closed(s)
        assert got == b"" or got  # returned within our 8 s window either way
    _mysql_alive(mysql_srv.port)


# --------------------------------------------------------------- Postgres


@settings(**_SETTINGS)
@given(garbage=st.binary(min_size=0, max_size=300))
def test_pg_garbage_startup(pg_srv, garbage):
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        s.sendall(garbage)
        _half_close(s)
        _drain_until_closed(s)
    _pg_alive(pg_srv.port)


@settings(**_SETTINGS)
@given(length=st.one_of(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=(1 << 20) + 1, max_value=0xFFFFFFFF),
))
def test_pg_bad_startup_length_closes(pg_srv, length):
    """Undersized or oversized startup length fields must close the
    connection promptly (no gigabyte recv, no negative-length confusion)."""
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(8)
        s.sendall(struct.pack("!I", length))
        got = _drain_until_closed(s)
        assert got == b""  # closed without a protocol response
    _pg_alive(pg_srv.port)


@settings(**_SETTINGS)
@given(
    mtype=st.binary(min_size=1, max_size=1),
    body=st.binary(max_size=64),
)
def test_pg_unknown_message_gets_error_not_crash(pg_srv, mtype, body):
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        s.sendall(mtype + struct.pack("!I", 4 + len(body)) + body)
        # extended-protocol messages (P/B/D/E/C/H) legitimately defer
        # their responses until Sync; a trailing Sync forces a
        # ReadyForQuery for every surviving message type
        s.sendall(b"S" + struct.pack("!I", 4))
        if mtype != b"X":  # Terminate closes silently by protocol
            try:
                _pg_read_until_ready(s)  # …, ReadyForQuery
            except ConnectionError:
                pass
    _pg_alive(pg_srv.port)


@settings(**_SETTINGS)
@given(sql=st.text(max_size=200))
def test_pg_arbitrary_query_text_answered(pg_srv, sql):
    """Any query text (including NULs and non-UTF8-able chars) gets a
    response cycle ending in ReadyForQuery."""
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        body = sql.encode("utf-8", "replace") + b"\x00"
        s.sendall(b"Q" + struct.pack("!I", 4 + len(body)) + body)
        msgs = _pg_read_until_ready(s)
        assert msgs[-1].startswith(b"Z")


# ------------------------------------- extended-protocol frames (round 7)


@settings(**_SETTINGS)
@given(
    mtype=st.sampled_from([b"P", b"B", b"D", b"E", b"C"]),
    body=st.binary(max_size=128),
)
def test_pg_extended_garbage_bodies(pg_srv, mtype, body):
    """Garbage Parse/Bind/Describe/Execute/Close bodies must produce an
    ErrorResponse (or completion) and a ReadyForQuery on Sync — never a
    hang or a crashed worker."""
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        s.sendall(mtype + struct.pack("!I", 4 + len(body)) + body)
        s.sendall(b"S" + struct.pack("!I", 4))
        msgs = _pg_read_until_ready(s)
        assert msgs[-1].startswith(b"Z")
    _pg_alive(pg_srv.port)


@settings(**_SETTINGS)
@given(
    nparams=st.integers(min_value=-5, max_value=40),
    tail=st.binary(max_size=64),
)
def test_pg_bind_with_lying_counts(pg_srv, nparams, tail):
    """Bind frames whose declared parameter count disagrees with the
    actual body must error cleanly, and the error state must drain
    follow-up messages until Sync."""
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        parse = b"\x00SELECT $1\x00" + struct.pack("!h", 0)
        s.sendall(b"P" + struct.pack("!I", 4 + len(parse)) + parse)
        bind = b"\x00\x00" + struct.pack("!hh", 0, nparams) + tail
        s.sendall(b"B" + struct.pack("!I", 4 + len(bind)) + bind)
        s.sendall(b"E" + b"\x00\x00\x00\x09" + b"\x00" + struct.pack("!i", 0))
        s.sendall(b"S" + struct.pack("!I", 4))
        msgs = _pg_read_until_ready(s)
        assert msgs[-1].startswith(b"Z")
    _pg_alive(pg_srv.port)


@settings(**_SETTINGS)
@given(body=st.binary(max_size=64))
def test_mysql_stmt_execute_garbage(mysql_srv, body):
    """COM_STMT_EXECUTE with arbitrary bodies (unknown ids, truncated
    frames) answers an error packet and the connection survives."""
    with socket.create_connection(("127.0.0.1", mysql_srv.port), timeout=5) as s:
        s.settimeout(4)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        payload = (
            struct.pack("<IIB", 0x0200 | 0x8000, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00\x00"
        )
        _send_mysql(s, 1, payload)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        _send_mysql(s, 0, b"\x17" + body)
        head = _read_n(s, 4)
        resp = _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        assert resp[0] == 0xFF  # error packet, not a crash
        _send_mysql(s, 0, b"\x01")
    _mysql_alive(mysql_srv.port)


@settings(**_SETTINGS)
@given(sql=st.text(max_size=120))
def test_mysql_stmt_prepare_arbitrary_text(mysql_srv, sql):
    """COM_STMT_PREPARE with arbitrary text either prepares (answering
    num_params placeholder definitions when '?' appears at code
    positions) or errors, and a follow-up query still works."""
    with socket.create_connection(("127.0.0.1", mysql_srv.port), timeout=5) as s:
        s.settimeout(4)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        payload = (
            struct.pack("<IIB", 0x0200 | 0x8000, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00\x00"
        )
        _send_mysql(s, 1, payload)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        _send_mysql(s, 0, b"\x16" + sql.encode("utf-8", "replace"))
        head = _read_n(s, 4)
        resp = _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        assert resp[0] in (0x00, 0xFF)
        _send_mysql(s, 0, b"\x01")
    _mysql_alive(mysql_srv.port)


@settings(**_SETTINGS)
@given(block=st.binary(max_size=48))
def test_mysql_param_execute_garbage_block(mysql_srv, block):
    """COM_STMT_EXECUTE against a statement WITH placeholders and an
    arbitrary parameter block (r8): the binary decode must answer a
    resultset or an error packet — never hang or kill the worker."""
    with socket.create_connection(("127.0.0.1", mysql_srv.port), timeout=5) as s:
        s.settimeout(4)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        payload = (
            struct.pack("<IIB", 0x0200 | 0x8000, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00\x00"
        )
        _send_mysql(s, 1, payload)
        head = _read_n(s, 4)
        _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        _send_mysql(s, 0, b"\x16" + b"select ? as p, ? as q")
        head = _read_n(s, 4)
        ok = _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        assert ok[0] == 0x00
        stmt_id = struct.unpack_from("<I", ok, 1)[0]
        for _ in range(3):  # two param defs + EOF
            head = _read_n(s, 4)
            _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        _send_mysql(s, 0, b"\x17" + struct.pack("<IBI", stmt_id, 0, 1) + block)
        head = _read_n(s, 4)
        resp = _read_n(s, head[0] | (head[1] << 8) | (head[2] << 16))
        # error packet, OK, or the first packet of a resultset — all fine;
        # the invariant is a well-formed answer and a surviving listener
        assert len(resp) >= 1
        _send_mysql(s, 0, b"\x01")
    _mysql_alive(mysql_srv.port)


@settings(**_SETTINGS)
@given(
    oid=st.sampled_from([16, 20, 21, 23, 700, 701, 1114, 25]),
    raw=st.binary(max_size=16),
)
def test_pg_binary_bind_arbitrary_widths(pg_srv, oid, raw):
    """Binary-format Bind values of arbitrary length against every core
    OID (r8, VERDICT r07 #4): wrong widths and unsupported OIDs must
    error cleanly; Sync always answers ReadyForQuery."""
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        parse = b"\x00SELECT $1\x00" + struct.pack("!h", 1) + struct.pack("!I", oid)
        s.sendall(b"P" + struct.pack("!I", 4 + len(parse)) + parse)
        bind = (
            b"\x00\x00"
            + struct.pack("!hh", 1, 1)  # one format code: binary
            + struct.pack("!h", 1)      # one parameter
            + struct.pack("!i", len(raw)) + raw
            + struct.pack("!h", 0)
        )
        s.sendall(b"B" + struct.pack("!I", 4 + len(bind)) + bind)
        s.sendall(b"E" + struct.pack("!I", 9) + b"\x00" + struct.pack("!i", 0))
        s.sendall(b"S" + struct.pack("!I", 4))
        msgs = _pg_read_until_ready(s)
        assert msgs[-1].startswith(b"Z")
    _pg_alive(pg_srv.port)


@settings(**_SETTINGS)
@given(
    fmts=st.lists(st.integers(min_value=-2, max_value=3), max_size=6),
    ncols=st.integers(min_value=1, max_value=3),
)
def test_pg_result_format_codes_arbitrary(pg_srv, fmts, ncols):
    """Arbitrary result-format-code lists on Bind (r9, VERDICT r08 #3):
    invalid codes must error at Bind; valid code lists pass through (the
    stub engine answers the rowless path — count-mismatch resolution
    against real columns is covered in test_wire_postgresql.py).  Sync
    always answers ReadyForQuery and the listener survives."""
    with socket.create_connection(("127.0.0.1", pg_srv.port), timeout=5) as s:
        s.settimeout(4)
        params = b"user\x00x\x00\x00"
        s.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        _pg_read_until_ready(s)
        cols = ", ".join(f"cast({k} as bigint) c{k}" for k in range(ncols))
        parse = b"\x00SELECT " + cols.encode() + b"\x00" + struct.pack("!h", 0)
        s.sendall(b"P" + struct.pack("!I", 4 + len(parse)) + parse)
        bind = (
            b"\x00\x00"
            + struct.pack("!hh", 0, 0)  # no param formats, no params
            + struct.pack("!h", len(fmts))
            + b"".join(struct.pack("!h", f) for f in fmts)
        )
        s.sendall(b"B" + struct.pack("!I", 4 + len(bind)) + bind)
        s.sendall(b"E" + struct.pack("!I", 9) + b"\x00" + struct.pack("!i", 0))
        s.sendall(b"S" + struct.pack("!I", 4))
        msgs = _pg_read_until_ready(s)
        assert msgs[-1].startswith(b"Z")
        if any(f not in (0, 1) for f in fmts):
            assert any(m.startswith(b"E") for m in msgs)  # rejected at Bind
        else:
            assert any(m.startswith(b"C") for m in msgs)  # completed
    _pg_alive(pg_srv.port)
