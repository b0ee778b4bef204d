"""MySQL wire-protocol server driven by a from-scratch protocol-4.1 text
client (no mysql client lib in the container) — the sequence mirrors
integration_tests/mysql/basic.sh: show tables / select 1, now() / CREATE
TABLE demo / INSERT / SELECT * FROM demo, plus the driver-setup federated
probes a stock client issues on connect.
"""

from __future__ import annotations

import socket
import struct

import pytest

from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.wire.mysql import MySQLServer


class MiniMySQLClient:
    """Just enough of the client side: handshake response 41 + COM_QUERY."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        self.seq = 0
        greeting = self._read_packet()
        assert greeting[0] == 0x0A  # protocol version 10
        self.server_version = greeting[1 : greeting.index(b"\x00", 1)].decode()
        # HandshakeResponse41: caps, max packet, charset, 23 zeros, user, auth
        caps = 0x0200 | 0x8000  # PROTOCOL_41 | SECURE_CONNECTION
        payload = (
            struct.pack("<IIB", caps, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00"
            + b"\x00"  # empty auth response (1-byte length)
        )
        self._send_packet(payload)
        ok = self._read_packet()
        assert ok[0] == 0x00, f"handshake not OK: {ok!r}"

    # ---- framing ----
    def _read_packet(self) -> bytes:
        head = self._read_n(4)
        length = head[0] | (head[1] << 8) | (head[2] << 16)
        self.seq = (head[3] + 1) & 0xFF
        return self._read_n(length)

    def _read_n(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return buf

    def _send_packet(self, payload: bytes) -> None:
        self.sock.sendall(struct.pack("<I", len(payload))[:3] + bytes([self.seq]) + payload)
        self.seq = (self.seq + 1) & 0xFF

    @staticmethod
    def _lenenc(data: bytes, pos: int) -> tuple[int | None, int]:
        first = data[pos]
        if first == 0xFB:
            return None, pos + 1  # NULL
        if first < 0xFB:
            return first, pos + 1
        if first == 0xFC:
            return struct.unpack_from("<H", data, pos + 1)[0], pos + 3
        if first == 0xFD:
            v = data[pos + 1] | (data[pos + 2] << 8) | (data[pos + 3] << 16)
            return v, pos + 4
        return struct.unpack_from("<Q", data, pos + 1)[0], pos + 9

    # ---- commands ----
    def query(self, sql: str):
        """Returns ("ok", affected_rows) or (columns, rows) or raises."""
        self.seq = 0
        self._send_packet(b"\x03" + sql.encode())
        first = self._read_packet()
        if first[0] == 0x00:
            affected, _ = self._lenenc(first, 1)
            return ("ok", affected)
        if first[0] == 0xFF:
            code = struct.unpack_from("<H", first, 1)[0]
            raise RuntimeError(f"mysql error {code}: {first[10:].decode()}")
        ncols, _ = self._lenenc(first, 0)
        columns = []
        for _ in range(ncols):
            cdef = self._read_packet()
            pos = 0
            parts = []
            for _ in range(6):  # catalog, schema, table, org_table, name, org_name
                ln, pos = self._lenenc(cdef, pos)
                parts.append(cdef[pos : pos + ln].decode())
                pos += ln
            pos += 1 + 2 + 4  # fixed-len marker, charset, length
            ctype = cdef[pos]
            columns.append((parts[4], ctype))
        eof = self._read_packet()
        assert eof[0] == 0xFE
        rows = []
        while True:
            pkt = self._read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:
                break
            pos, row = 0, []
            for _ in range(ncols):
                ln, pos = self._lenenc(pkt, pos)
                if ln is None:
                    row.append(None)
                else:
                    row.append(pkt[pos : pos + ln].decode())
                    pos += ln
            rows.append(tuple(row))
        return (columns, rows)

    def close(self) -> None:
        try:
            self.seq = 0
            self._send_packet(b"\x01")  # COM_QUIT
        finally:
            self.sock.close()


@pytest.fixture()
def mysql_server(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "store"))
    srv = MySQLServer(engine).start()
    yield srv
    srv.stop()


def test_mysql_basic_sh_sequence(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    assert "HoraeDB" in c.server_version

    # driver setup probe a stock mysql client sends on connect
    cols, rows = c.query("SELECT @@version_comment LIMIT 1")
    assert rows and "HoraeDB" in rows[0][0]

    cols, rows = c.query("show tables")
    assert [n for n, _ in cols] == ["table_name"] and rows == []

    cols, rows = c.query("select 1 as one, now() as t")
    assert rows[0][0] == "1" and int(rows[0][1]) > 1_000_000_000_000  # epoch ms

    assert c.query(
        "CREATE TABLE `demo`(`name` string TAG, `value` double NOT NULL, "
        "`t` timestamp NOT NULL, timestamp KEY(t)) ENGINE = Analytic "
        "WITH (enable_ttl='false')"
    ) == ("ok", 0)
    assert c.query(
        "insert into demo (name, value, t) values ('horaedb', 1, 1683280523000)"
    ) == ("ok", 1)

    cols, rows = c.query("select name, value, t from demo")
    types = dict(cols)
    assert types["name"] == 0xFD  # VAR_STRING (writer.rs String → VARCHAR family)
    assert types["value"] == 0x05  # DOUBLE
    assert types["t"] == 0x03  # LONG — timestamps are epoch ms ints
    assert rows == [("horaedb", "1.0", "1683280523000")]
    c.close()


def test_mysql_error_and_prepare(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    with pytest.raises(RuntimeError, match="no such table|not found|TABLE_NOT_FOUND|error"):
        c.query("select * from missing_table")
    # COM_STMT_PREPARE with a placeholder now answers PREPARE_OK with
    # num_params=1 plus one param definition + EOF (r8 — beyond the
    # reference, whose worker.rs on_prepare rejects every prepare)
    c.seq = 0
    c._send_packet(b"\x16" + b"select ?")
    ok = c._read_packet()
    assert ok[0] == 0x00
    _, ncols, nparams = struct.unpack_from("<IHH", ok, 1)
    assert nparams == 1 and ncols == 0
    c._read_packet()  # the param definition
    assert c._read_packet()[0] == 0xFE  # EOF after param defs
    c.close()


def test_mysql_respects_limiter(mysql_server):
    # the limiter guards every entry point — a read-blocked table errors
    # over the wire protocol too (same Engine.execute_sql gate)
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE lim (v double, t timestamp NOT NULL, timestamp KEY(t)) "
        "WITH (enable_ttl='false')"
    )
    mysql_server.engine.limiter.block_read("lim")
    with pytest.raises(RuntimeError, match="blocked, table:lim"):
        c.query("select * from lim")
    mysql_server.engine.limiter.unblock_read("lim")
    assert c.query("select * from lim")[1] == []
    c.close()


def test_mysql_null_rendering(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE n (tag1 string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    c.query("insert into n (t, v) values (1683280523000, 2.5)")
    cols, rows = c.query("select tag1, v from n")
    assert rows == [(None, "2.5")]
    c.close()


# --- COM_STMT_PREPARE / EXECUTE (round 7: the no-parameter case) -----------


def test_mysql_stmt_prepare_execute_close(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE stmt_demo (name string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    c.query("insert into stmt_demo (name, v, t) values ('x', 1.5, 1691116127622)")

    # COM_STMT_PREPARE (no parameters) → COM_STMT_PREPARE_OK
    c.seq = 0
    c._send_packet(b"\x16" + b"select name, v from stmt_demo order by name")
    ok = c._read_packet()
    assert ok[0] == 0x00
    stmt_id, ncols, nparams = struct.unpack_from("<IHH", ok, 1)
    assert nparams == 0 and ncols == 0  # schema resolved at execute

    # COM_STMT_EXECUTE → binary-protocol resultset (typed: VAR_STRING
    # lenenc for name, 8-byte IEEE double for v)
    c.seq = 0
    c._send_packet(b"\x17" + struct.pack("<IBI", stmt_id, 0, 1))
    first = c._read_packet()
    ncols, _ = c._lenenc(first, 0)
    assert ncols == 2
    coltypes = []
    for _ in range(ncols):
        coltypes.append(_coldef_type(c._read_packet()))
    assert coltypes == [0xFD, 0x05]  # VAR_STRING, DOUBLE
    assert c._read_packet()[0] == 0xFE  # EOF
    row = c._read_packet()
    assert row[0] == 0x00  # binary row header
    nbitmap = (ncols + 7 + 2) // 8
    pos = 1 + nbitmap
    ln, pos = c._lenenc(row, pos)
    assert row[pos : pos + ln] == b"x"
    pos += ln
    assert struct.unpack_from("<d", row, pos)[0] == 1.5
    assert c._read_packet()[0] == 0xFE  # closing EOF

    # re-execute the same statement (registry persists per connection)
    c.seq = 0
    c._send_packet(b"\x17" + struct.pack("<IBI", stmt_id, 0, 1))
    assert c._lenenc(c._read_packet(), 0)[0] == 2
    while True:
        pkt = c._read_packet()
        if pkt[0] == 0xFE and len(pkt) < 9:
            break
    while True:
        pkt = c._read_packet()
        if pkt[0] == 0xFE and len(pkt) < 9:
            break

    # COM_STMT_CLOSE (no response), then execute fails cleanly
    c.seq = 0
    c._send_packet(b"\x19" + struct.pack("<I", stmt_id))
    c.seq = 0
    c._send_packet(b"\x17" + struct.pack("<IBI", stmt_id, 0, 1))
    err = c._read_packet()
    assert err[0] == 0xFF
    c.close()


def test_mysql_stmt_null_in_binary_row(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE stmt_null (name string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    c.query("insert into stmt_null (t, v) values (1691116127622, 2.5)")
    c.seq = 0
    c._send_packet(b"\x16" + b"select name, v from stmt_null")
    ok = c._read_packet()
    stmt_id = struct.unpack_from("<I", ok, 1)[0]
    c.seq = 0
    c._send_packet(b"\x17" + struct.pack("<IBI", stmt_id, 0, 1))
    ncols, _ = c._lenenc(c._read_packet(), 0)
    for _ in range(ncols):
        c._read_packet()
    assert c._read_packet()[0] == 0xFE
    row = c._read_packet()
    nbitmap = (ncols + 7 + 2) // 8
    bitmap = row[1 : 1 + nbitmap]
    assert bitmap[(0 + 2) // 8] & (1 << ((0 + 2) % 8))  # name IS NULL
    pos = 1 + nbitmap
    assert struct.unpack_from("<d", row, pos)[0] == 2.5  # v rides after the bitmap
    c.close()


def test_mysql_stmt_typed_binary_result_matrix(mysql_server):
    """Binary resultset declares true types and fixed-width encodings:
    bigint/timestamp → LONGLONG(8), int → LONG(4), smallint → SHORT(2),
    float → FLOAT(4), double → DOUBLE(8), string → VAR_STRING lenenc.
    A 64-bit value > 2^31 proves longs are not truncated to 4 bytes."""
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE stmt_typed (name string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    c.query("insert into stmt_typed (name, v, t) values ('x', 0.25, 1691116127622)")
    c.seq = 0
    c._send_packet(
        b"\x16" + b"select t, cast(5000000001 as bigint) as big, cast(7 as int) as i, "
        b"cast(3 as smallint) as s, cast(1.5 as float) as f, v, name from stmt_typed"
    )
    ok = c._read_packet()
    assert ok[0] == 0x00
    stmt_id = struct.unpack_from("<I", ok, 1)[0]
    ncols, rows = _execute(c, stmt_id, new_bound=0)
    assert ncols == 7
    assert rows == [("1691116127622", "5000000001", "7", "3", "1.5", "0.25", "x")]
    c.close()


def test_mysql_prepare_escaped_quote_scanner(mysql_server):
    # a backslash-escaped quote inside a string must not desynchronize
    # the placeholder scanner (r7 review)
    c = MiniMySQLClient(mysql_server.port)
    # real ? after an escaped quote → counted as a parameter (r8: prepares
    # with num_params=1 instead of the pre-r8 ER_NOT_SUPPORTED_YET)
    c.seq = 0
    c._send_packet(b"\x16" + b"select 'don\\'t', ?")
    ok = c._read_packet()
    assert ok[0] == 0x00
    assert struct.unpack_from("<IHH", ok, 1)[2] == 1  # num_params
    c._read_packet()  # param def
    assert c._read_packet()[0] == 0xFE
    # ? inside a string after an escaped quote → parameterless → prepares
    c.seq = 0
    c._send_packet(b"\x16" + b"select 'don\\'t teach ?s' as s")
    ok = c._read_packet()
    assert ok[0] == 0x00
    assert struct.unpack_from("<IHH", ok, 1)[2] == 0
    c.close()


# --- `?`-parameterized COM_STMT_EXECUTE (round 8: VERDICT r07 #3) ----------


def _prepare(c: MiniMySQLClient, sql: bytes) -> tuple[int, int]:
    """COM_STMT_PREPARE; returns (stmt_id, num_params), draining param
    definitions."""
    c.seq = 0
    c._send_packet(b"\x16" + sql)
    ok = c._read_packet()
    if ok[0] == 0xFF:
        raise RuntimeError(
            f"prepare error {struct.unpack_from('<H', ok, 1)[0]}: {ok[10:].decode()}"
        )
    stmt_id, ncols, nparams = struct.unpack_from("<IHH", ok, 1)
    for _ in range(nparams):
        c._read_packet()
    if nparams:
        assert c._read_packet()[0] == 0xFE
    for _ in range(ncols):
        c._read_packet()
    if ncols:
        assert c._read_packet()[0] == 0xFE
    return stmt_id, nparams


def _execute(c: MiniMySQLClient, stmt_id: int, params=(), types=None,
             new_bound: int = 1):
    """COM_STMT_EXECUTE with a binary parameter block; params is a list of
    (mysql_type, unsigned, wire_bytes_or_None).  Returns ('ok', affected)
    or (ncols, rows-as-lenenc-strings) or raises."""
    n = len(params)
    body = struct.pack("<IBI", stmt_id, 0, 1)
    if n:
        bitmap = bytearray((n + 7) // 8)
        for i, (_t, _u, raw) in enumerate(params):
            if raw is None:
                bitmap[i // 8] |= 1 << (i % 8)
        body += bytes(bitmap) + bytes([new_bound])
        if new_bound:
            for t, u, _raw in params:
                body += bytes([t, 0x80 if u else 0])
        for _t, _u, raw in params:
            if raw is not None:
                body += raw
    c.seq = 0
    c._send_packet(b"\x17" + body)
    first = c._read_packet()
    if first[0] == 0xFF:
        raise RuntimeError(
            f"mysql error {struct.unpack_from('<H', first, 1)[0]}: {first[10:].decode()}"
        )
    if first[0] == 0x00:
        affected, _ = c._lenenc(first, 1)
        return ("ok", affected)
    ncols, _ = c._lenenc(first, 0)
    coltypes = [_coldef_type(c._read_packet()) for _ in range(ncols)]
    assert c._read_packet()[0] == 0xFE
    rows = []
    nbitmap = (ncols + 7 + 2) // 8
    while True:
        pkt = c._read_packet()
        if pkt[0] == 0xFE and len(pkt) < 9:
            break
        bitmap, pos, row = pkt[1 : 1 + nbitmap], 1 + nbitmap, []
        for i in range(ncols):
            if bitmap[(i + 2) // 8] & (1 << ((i + 2) % 8)):
                row.append(None)
                continue
            fixed = _BINARY_FIXED.get(coltypes[i])
            if fixed is not None:
                fmt, width = fixed
                row.append(str(struct.unpack_from(fmt, pkt, pos)[0]))
                pos += width
            else:
                ln, pos = c._lenenc(pkt, pos)
                row.append(pkt[pos : pos + ln].decode())
                pos += ln
        rows.append(tuple(row))
    return (ncols, rows)


# binary row format: fixed-width little-endian widths per MYSQL_TYPE_*
_BINARY_FIXED = {
    0x01: ("<b", 1),
    0x02: ("<h", 2),
    0x03: ("<i", 4),
    0x08: ("<q", 8),
    0x04: ("<f", 4),
    0x05: ("<d", 8),
}


def _coldef_type(pkt: bytes) -> int:
    """Extract the type byte from a ColumnDefinition41 packet: six lenenc
    strings, the 0x0C fixed-length marker, charset(2) + collen(4), type."""
    pos = 0
    for _ in range(6):
        ln, pos = MiniMySQLClient._lenenc(pkt, pos)
        pos += ln
    return pkt[pos + 1 + 2 + 4]


def _lenenc_bytes(data: bytes) -> bytes:
    assert len(data) < 0xFB
    return bytes([len(data)]) + data


@pytest.fixture()
def mysql_params(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE pdemo (name string TAG, v double, n bigint, "
        "t timestamp NOT NULL, timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    c.query(
        "insert into pdemo (name, v, n, t) values "
        "('a', 1.5, 10, 1691116127622), ('b', 2.5, 20, 1691116127623), "
        "('o''brien', 3.5, 30, 1691116127624)"
    )
    yield c
    c.close()


def test_mysql_param_select_roundtrip(mysql_params):
    c = mysql_params
    sid, nparams = _prepare(c, b"select name, v from pdemo where name = ?")
    assert nparams == 1
    ncols, rows = _execute(c, sid, [(0xFD, False, _lenenc_bytes(b"a"))])
    assert rows == [("a", "1.5")]
    # re-execute with new_params_bound_flag=0 reuses cached types
    ncols, rows = _execute(
        c, sid, [(0xFD, False, _lenenc_bytes(b"b"))], new_bound=0
    )
    assert rows == [("b", "2.5")]
    # numeric binary params: LONGLONG and DOUBLE
    sid2, _ = _prepare(c, b"select name from pdemo where n >= ? and v < ? order by name")
    ncols, rows = _execute(
        c, sid2,
        [(0x08, False, struct.pack("<q", 20)), (0x05, False, struct.pack("<d", 3.0))],
    )
    assert [r[0] for r in rows] == ["b"]
    # LONG (int32) + unsigned flag
    sid3, _ = _prepare(c, b"select count(*) as cnt from pdemo where n = ?")
    ncols, rows = _execute(c, sid3, [(0x03, True, struct.pack("<I", 30))])
    assert rows == [("1",)]


def test_mysql_param_binary_datetime(mysql_params):
    # binary DATETIME/TIMESTAMP parameters (r11): length byte 4/7/11 +
    # year u16le, month, day [, h, m, s [, micros u32le]] → epoch-ms
    # literal (UTC).  1691116127623 ms = 2023-08-04 02:28:47.623
    c = mysql_params
    full = struct.pack("<HBB", 2023, 8, 4) + bytes([2, 28, 47]) + struct.pack(
        "<I", 623_000
    )
    sid, _ = _prepare(c, b"select name from pdemo where t = ? order by name")
    _, rows = _execute(c, sid, [(0x0C, False, bytes([11]) + full)])
    assert [r[0] for r in rows] == ["b"]
    # 7-byte form (second precision) with TIMESTAMP type code
    secs7 = struct.pack("<HBB", 2023, 8, 4) + bytes([2, 28, 47])
    sid2, _ = _prepare(c, b"select count(*) as n from pdemo where t >= ?")
    _, rows = _execute(c, sid2, [(0x07, False, bytes([7]) + secs7)])
    assert rows == [("3",)]
    # 4-byte DATE form = midnight
    date4 = struct.pack("<HBB", 2023, 8, 5)
    _, rows = _execute(c, sid2, [(0x0A, False, bytes([4]) + date4)])
    assert rows == [("0",)]
    # invalid month → clean error packet, connection survives
    bad = struct.pack("<HBB", 2023, 13, 4) + bytes([0, 0, 0])
    with pytest.raises(RuntimeError, match="datetime"):
        _execute(c, sid2, [(0x0C, False, bytes([7]) + bad)])
    # impossible CALENDAR date (Feb 30) → rejected like real MySQL, not
    # silently normalized to Mar 2 by timegm (ADVICE r11); same for an
    # out-of-range time-of-day
    feb30 = struct.pack("<HBB", 2023, 2, 30) + bytes([0, 0, 0])
    with pytest.raises(RuntimeError, match="datetime"):
        _execute(c, sid2, [(0x0C, False, bytes([7]) + feb30)])
    bad_hour = struct.pack("<HBB", 2023, 8, 4) + bytes([25, 0, 0])
    with pytest.raises(RuntimeError, match="datetime"):
        _execute(c, sid2, [(0x0C, False, bytes([7]) + bad_hour)])
    _, rows = _execute(c, sid2, [(0x07, False, bytes([7]) + secs7)])
    assert rows == [("3",)]


def test_mysql_param_null_and_insert(mysql_params):
    c = mysql_params
    sid, _ = _prepare(
        c, b"insert into pdemo (name, v, n, t) values (?, ?, ?, ?)"
    )
    out = _execute(
        c, sid,
        [
            (0xFD, False, _lenenc_bytes(b"c")),
            (0x05, False, struct.pack("<d", 9.5)),
            (0x06, False, None),  # NULL via bitmap + MYSQL_TYPE_NULL
            (0x08, False, struct.pack("<q", 1691116127625)),
        ],
    )
    assert out == ("ok", 1)
    sid2, _ = _prepare(c, b"select v, n from pdemo where name = ?")
    _, rows = _execute(c, sid2, [(0xFD, False, _lenenc_bytes(b"c"))])
    assert rows == [("9.5", None)]


def test_mysql_param_injection_and_comments(mysql_params):
    c = mysql_params
    # quote/backslash injection stays inside the literal (same rendering
    # the PG side proved in r7)
    sid, _ = _prepare(c, b"select count(*) as cnt from pdemo where name = ?")
    _, rows = _execute(
        c, sid, [(0xFD, False, _lenenc_bytes(b"x\\' OR 1=1 -- "))]
    )
    assert rows == [("0",)]
    _, rows = _execute(
        c, sid, [(0xFD, False, _lenenc_bytes(b"o'brien"))]
    )
    assert rows == [("1",)]
    # `?` inside a comment is NOT a parameter (ADVICE r07: `-- ok?`)
    sid2, nparams = _prepare(c, b"select 1 as one -- ok?")
    assert nparams == 0
    _, rows = _execute(c, sid2)
    assert rows == [("1",)]
    sid3, nparams = _prepare(c, b"select /* ? */ name from pdemo where name = ?")
    assert nparams == 1
    _, rows = _execute(c, sid3, [(0xFD, False, _lenenc_bytes(b"a"))])
    assert rows == [("a",)]


def test_mysql_param_decimal_and_unsupported(mysql_params):
    c = mysql_params
    # NEWDECIMAL rides as validated ascii, inlined unquoted
    sid, _ = _prepare(c, b"select name from pdemo where v = ?")
    _, rows = _execute(c, sid, [(0xF6, False, _lenenc_bytes(b"2.5"))])
    assert [r[0] for r in rows] == ["b"]
    # malformed decimal rejected, connection stays usable
    with pytest.raises(RuntimeError, match="decimal parameter"):
        _execute(c, sid, [(0xF6, False, _lenenc_bytes(b"2.5; drop"))])
    # zero-length (zero-date) DATETIME 0x0c → clean rejection (the engine
    # has no 0000-00-00); well-formed datetime params are covered by
    # test_mysql_param_binary_datetime
    with pytest.raises(RuntimeError, match="datetime"):
        _execute(c, sid, [(0x0C, False, b"\x00")])
    # unsupported binary type (TINY_BLOB 0xf9) → ER_NOT_SUPPORTED_YET
    with pytest.raises(RuntimeError, match="1235"):
        _execute(c, sid, [(0xF9, False, b"\x00")])
    # truncated fixed-width value → clean error, no hang
    with pytest.raises(RuntimeError, match="truncated"):
        _execute(c, sid, [(0x05, False, struct.pack("<f", 1.0))])
    # connection still works
    _, rows = _execute(c, sid, [(0xF6, False, _lenenc_bytes(b"1.5"))])
    assert [r[0] for r in rows] == ["a"]


def test_mysql_param_malformed_lenenc_and_nonfinite(mysql_params):
    # r8 review #1: a truncated length-encoded prefix must answer an
    # error PACKET, not kill the worker/connection
    c = mysql_params
    sid, _ = _prepare(c, b"select name from pdemo where name = ?")
    c.seq = 0
    c._send_packet(
        b"\x17" + struct.pack("<IBI", sid, 0, 1)
        + b"\x00"  # null bitmap (param not null)
        + b"\x01"  # new_params_bound
        + b"\xfd\x00"  # type VAR_STRING, signed
        + b"\xfc\x01"  # lenenc prefix 0xFC claiming u16 length, 1 byte follows
    )
    err = c._read_packet()
    assert err[0] == 0xFF
    # connection survives and the statement still works
    _, rows = _execute(c, sid, [(0xFD, False, _lenenc_bytes(b"a"))])
    assert rows == [("a",)]
    # r8 review #6: non-finite DOUBLE params are rejected, not inlined as
    # a bare nan token the engine would resolve as a column
    sid2, _ = _prepare(c, b"select count(*) as cnt from pdemo where v < ?")
    with pytest.raises(RuntimeError, match="on-finite|alformed"):
        _execute(c, sid2, [(0x05, False, struct.pack("<d", float("nan")))])
    _, rows = _execute(c, sid2, [(0x05, False, struct.pack("<d", 2.0))])
    assert rows == [("1",)]


def test_mysql_nested_comment_scanner_and_placeholder_cap(mysql_params):
    c = mysql_params
    # r8 review #4: /* */ nests like the backing Spark lexer — the ? between
    # inner and outer */ is comment text, only the trailing ? is a parameter
    sid, nparams = _prepare(c, b"select /* a /* b */ ? */ name from pdemo where name = ?")
    assert nparams == 1
    _, rows = _execute(c, sid, [(0xFD, False, _lenenc_bytes(b"b"))])
    assert rows == [("b",)]
    # r8 review #5: >65535 placeholders answers error 1390, not a dropped
    # connection (num_params is a u16)
    c.seq = 0
    c._send_packet(b"\x16" + b"select " + b",".join([b"?"] * 65536))
    err = c._read_packet()
    assert err[0] == 0xFF and struct.unpack_from("<H", err, 1)[0] == 1390
    # connection still usable
    assert c.query("select 1 as one")[1] == [("1",)]


def test_mysql_dashdash_comment_matches_engine_lexer(mysql_params):
    c = mysql_params
    # ADVICE r08 #2: Spark treats `--x` (no trailing whitespace) as a line
    # comment; the scanner must agree or a `?` after `--x` gets counted at
    # prepare and its literal substituted into text the engine discards
    sid, nparams = _prepare(c, b"select name from pdemo where name = ? --x ? trailing")
    assert nparams == 1  # the ? after --x is comment text, not a parameter
    _, rows = _execute(c, sid, [(0xFD, False, _lenenc_bytes(b"a"))])
    assert rows == [("a",)]
    # --x as the whole tail: parameterless, still runs
    sid2, nparams = _prepare(c, b"select 1 as one --?no-ws-after-dashes")
    assert nparams == 0
    _, rows = _execute(c, sid2)
    assert rows == [("1",)]


# --- LOAD DATA LOCAL INFILE (round 9: the MySQL bulk-load path) -------------


def _load_data(c: MiniMySQLClient, sql: str, data: bytes):
    """COM_QUERY LOAD DATA exchange: expect the 0xFB LOCAL INFILE request,
    stream the payload in two packets + the empty terminator, return
    ("ok", affected) or raise on error."""
    c.seq = 0
    c._send_packet(b"\x03" + sql.encode())
    first = c._read_packet()
    if first[0] == 0xFF:
        raise RuntimeError(f"mysql error: {first[10:].decode()}")
    assert first[0] == 0xFB, f"expected LOCAL INFILE request, got {first[:1]!r}"
    filename = first[1:].decode()
    half = len(data) // 2
    for chunk in (data[:half], data[half:]):
        if chunk:
            c._send_packet(chunk)
    c._send_packet(b"")  # EOF
    ok = c._read_packet()
    if ok[0] == 0xFF:
        raise RuntimeError(f"mysql error: {ok[10:].decode()}")
    assert ok[0] == 0x00
    affected, _ = c._lenenc(ok, 1)
    return filename, affected


@pytest.fixture()
def mysql_load(mysql_server):
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE ld (name string TAG, v double, flag boolean, "
        "t timestamp NOT NULL, timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    yield c
    c.close()


def test_mysql_load_data_defaults(mysql_load):
    c = mysql_load
    data = (
        "plain\t1.5\t1\t1691116127622\n"
        "tab\\tbed\t2.5\t0\t1691116127623\n"   # escaped tab inside a value
        "\\N\t3.5\t1\t1691116127624\n"            # NULL tag
    ).encode()
    fn, n = _load_data(c, "LOAD DATA LOCAL INFILE '/tmp/x.tsv' INTO TABLE ld", data)
    assert fn == "/tmp/x.tsv" and n == 3
    _, rows = c.query("select name, v, flag from ld order by t")
    # booleans render 0/1 smallints over the text protocol (writer.rs parity)
    assert rows == [
        ("plain", "1.5", "1"),
        ("tab\tbed", "2.5", "0"),
        (None, "3.5", "1"),
    ]


def test_mysql_load_data_csv_options(mysql_load):
    c = mysql_load
    data = (
        "skip me\r\n"
        '"quoted, name",0.5,true,1691116127622\r\n'
        "b,1.25,false,1691116127623\r\n"
    ).encode()
    _, n = _load_data(
        c,
        "LOAD DATA LOCAL INFILE 'x.csv' INTO TABLE ld "
        "FIELDS TERMINATED BY ',' OPTIONALLY ENCLOSED BY '\"' "
        "LINES TERMINATED BY '\\r\\n' IGNORE 1 LINES (name, v, flag, t)",
        data,
    )
    assert n == 2
    _, rows = c.query("select name, v from ld order by t")
    assert rows == [("quoted, name", "0.5"), ("b", "1.25")]


def test_mysql_load_data_errors(mysql_load):
    c = mysql_load
    # non-LOCAL → clear rejection (no server filesystem), connection usable
    with pytest.raises(RuntimeError, match="(?i)local"):
        c.query("LOAD DATA INFILE '/etc/passwd' INTO TABLE ld")
    # IGNORE duplicate mode → rejected with the dedup-semantics explanation
    with pytest.raises(RuntimeError, match="(?i)latest|replace"):
        c.query("LOAD DATA LOCAL INFILE 'x' IGNORE INTO TABLE ld")
    # arity mismatch reports the line; REPLACE keyword is accepted
    with pytest.raises(RuntimeError, match="line 1"):
        _load_data(
            c, "LOAD DATA LOCAL INFILE 'x' REPLACE INTO TABLE ld", b"just_one\n"
        )
    # unknown table errors before the INFILE request
    with pytest.raises(RuntimeError, match="(?i)nope|found|exist"):
        c.query("LOAD DATA LOCAL INFILE 'x' INTO TABLE nope")
    # connection still serves normal traffic
    _, rows = c.query("select count(*) as n from ld")
    assert rows == [("0",)]


def test_mysql_load_data_enclosed_newline_and_trailing_junk(mysql_load):
    # r9 review #3: a quoted field with an embedded line terminator is ONE
    # field; review #7: characters between a closing enclosure and the next
    # terminator stay literal data (MySQL keeps them)
    c = mysql_load
    data = (
        '"multi\nline",1.0,1,1691116127622\n'
        '"a"junk,2.0,0,1691116127623\n'
    ).encode()
    _, n = _load_data(
        c,
        "LOAD DATA LOCAL INFILE 'x' INTO TABLE ld "
        "FIELDS TERMINATED BY ',' OPTIONALLY ENCLOSED BY '\"' (name, v, flag, t)",
        data,
    )
    assert n == 2
    _, rows = c.query("select name from ld order by t")
    assert rows == [("multi\nline",), ("ajunk",)]


def test_mysql_stmt_binary_blob_raw_bytes(mysql_server):
    # r9 review #4: LONG_BLOB binary rows carry RAW bytes — no UTF-8
    # string cast mangling non-UTF-8 values to replacement chars
    c = MiniMySQLClient(mysql_server.port)
    c.query(
        "CREATE TABLE bt (b varbinary, t timestamp NOT NULL, timestamp KEY(t)) "
        "WITH (enable_ttl='false')"
    )
    raw = b"\xff\x00\xc3"
    mysql_server.engine.insert_rows("bt", ["b", "t"], [{"b": raw, "t": 1691116127622}])
    c.seq = 0
    c._send_packet(b"\x16" + b"select b from bt")
    ok = c._read_packet()
    assert ok[0] == 0x00
    stmt_id = struct.unpack_from("<I", ok, 1)[0]
    c.seq = 0
    c._send_packet(b"\x17" + struct.pack("<IBI", stmt_id, 0, 1))
    ncols, _ = c._lenenc(c._read_packet(), 0)
    assert ncols == 1
    assert _coldef_type(c._read_packet()) == 0xFB  # LONG_BLOB
    assert c._read_packet()[0] == 0xFE
    row = c._read_packet()
    pos = 1 + (1 + 7 + 2) // 8
    ln, pos = c._lenenc(row, pos)
    assert row[pos : pos + ln] == raw
    c.close()


# --- KILL <id> query cancellation (round 9) ---------------------------------


def test_mysql_kill_query_cancels_running_statement(mysql_server):
    import threading as _th
    import time as _time

    victim = MiniMySQLClient(mysql_server.port)
    victim.sock.settimeout(120)
    killer = MiniMySQLClient(mysql_server.port)
    # victim's connection id rides the greeting; recover it from the
    # server-side registry via the order of connects (victim first)
    ids = sorted(mysql_server._conn_gids)
    victim_id = ids[0]
    victim.query("select 1 as one")  # pay view registration OUTSIDE the race

    state = {}

    def run_victim():
        t0 = _time.time()
        try:
            victim.query("select sum(id % 7) as s from range(2000000000000)")
            state["outcome"] = "completed"
        except RuntimeError as e:
            state["outcome"] = str(e)
        state["secs"] = _time.time() - t0

    th = _th.Thread(target=run_victim)
    th.start()
    # cancel only cancels ACTIVE jobs — wait until the victim's job is
    # actually running before killing (planning is a no-op window,
    # matching cancel-active-only semantics)
    sc = mysql_server.engine.spark.sparkContext
    for _ in range(300):
        if sc.statusTracker().getActiveJobsIds():
            break
        _time.sleep(0.1)
    assert sc.statusTracker().getActiveJobsIds(), "victim job never started"
    assert killer.query(f"KILL QUERY {victim_id}") == ("ok", 0)
    th.join(timeout=60)
    assert not th.is_alive()
    # 100G-row sum would take minutes; cancellation must land fast and as
    # the MySQL interrupted error, not a connection drop
    assert "interrupted" in state["outcome"].lower()
    assert state["secs"] < 45
    # victim connection stays usable after the cancel
    _, rows = victim.query("select 1 as one")
    assert rows == [("1",)]
    # unknown thread id → ER_NO_SUCH_THREAD
    with pytest.raises(RuntimeError, match="1094"):
        killer.query("KILL QUERY 999999")
    victim.close()
    killer.close()

def test_mysql_kill_connection_closes_victim_socket(mysql_server):
    """KILL CONNECTION must terminate the victim's connection (socket
    shutdown), not just cancel its jobs — clients/pools expect the
    connection to die (ADVICE r09 #4).  Bare KILL <id> is the
    CONNECTION form, per MySQL."""
    victim = MiniMySQLClient(mysql_server.port)
    killer = MiniMySQLClient(mysql_server.port)
    victim_id = sorted(mysql_server._conn_gids)[0]
    assert victim.query("select 1 as one")[1] == [("1",)]
    assert killer.query(f"KILL CONNECTION {victim_id}") == ("ok", 0)
    # the victim's next round-trip hits the shut-down socket
    with pytest.raises((ConnectionError, OSError, RuntimeError)):
        victim.query("select 1 as one")
    # killer stays usable; KILL QUERY must NOT close the socket
    killer2 = MiniMySQLClient(mysql_server.port)
    k2_id = max(mysql_server._conn_gids)
    assert killer.query(f"KILL QUERY {k2_id}") == ("ok", 0)
    assert killer2.query("select 2 as two")[1] == [("2",)]
    killer2.close()
    killer.close()
