"""End-to-end BINARY wire-protocol correctness (VERDICT r10 next-round #2).

`copy_load_ingest_read` proved the TEXT bulk paths through real sockets;
this gate closes the last unoracled wire surface — the BINARY protocol
forms on both servers:

- write side, MySQL: the fixture half is inserted through a real MySQL
  socket with COM_STMT_PREPARE + COM_STMT_EXECUTE carrying TYPED BINARY
  parameters — VAR_STRING lenenc, DOUBLE little-endian IEEE-754,
  LONGLONG, and the 11-byte binary DATETIME component encoding (r11),
  NULLs via the null bitmap, multi-row VALUES so one execute frames
  thousands of typed values;
- write side, PostgreSQL: the other half flows through a real PG socket's
  extended protocol (Parse with declared OIDs → Bind with per-parameter
  format codes mixing text strings with BINARY float8/int8 big-endian and
  BINARY timestamp as int64 2000-epoch microseconds → Execute → Sync);
- read side, PostgreSQL: the verification aggregate is executed through a
  PG extended-protocol portal with ALL result-format codes = BINARY, and
  the int8/float8/timestamp cells are decoded from their wire encodings
  (timestamps as 2000-epoch µs) into the returned DataFrame;
- cross-check, MySQL: the same counts re-read through a COM_STMT_EXECUTE
  binary resultset must equal the PG-decoded values (a mismatch raises,
  which the driver records as err).

The DuckDB oracle states the same aggregate over the RAW events table, so
a value corrupted anywhere in binary param encode → server decode →
storage → aggregate → binary result encode → client decode shows up as a
hash mismatch.

Reference contract: integration_tests/mysql/basic.sh and
integration_tests/postgresql/basic.sh drive the reference's wire servers;
the reference's MySQL worker rejects every prepare (worker.rs:66-85) and
its PG handler is simple-query-only (handler.rs:44), so the binary forms
are beyond-reference surface gated with the same fixture-through-socket
rigor.

Scale shape: the wire-client role is driver-side by nature (it frames
packets); the fixture subset is bounded (1/5 of one event type split
across the two protocols) and sends ride multi-row statements (800 rows
per COM_STMT_EXECUTE / Bind), so round trips stay O(rows/800).  The
at-scale bulk path is parquet/streaming ingest, gated elsewhere; the READ
side aggregate runs distributed in the engine and only the one result row
crosses the wire.
"""

from __future__ import annotations

import datetime
import socket
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_horaedb_spark.functions.detfloat import dyadic_sql, r_out_sql
from incubator_horaedb_spark.querybank.registry import (
    _ts_read_confs,
    load,
    register,
)
from incubator_horaedb_spark.querybank.streaming_e2e import _new_store

# disjoint from copy_load_ingest_read's (user_id % 5) = 0 split
_BIN_PRED = "event_type = 'signup' AND (user_id % 5) = 1"
_MY_PRED = _BIN_PRED + " AND (user_id % 10) = 1"
_PG_PRED = _BIN_PRED + " AND (user_id % 10) = 6"
_CHUNK_ROWS = 800  # rows per prepared multi-row INSERT (6 params each)
_PG_EPOCH_US = 946_684_800_000_000  # 2000-01-01 in epoch µs

_STATE: dict = {"sf_dir": None, "table": None, "store": None}


# --------------------------------------------------------------- clients --
# Minimal from-scratch binary-protocol clients (no psycopg/mysql lib in
# the container) — the querybank cannot import test modules, so the same
# roles tests/test_wire_*.py's Mini clients play are embedded here.


class _MyBinary:
    """Handshake 4.1 → COM_STMT_PREPARE/EXECUTE with binary params and
    binary resultset decode."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=120)
        self.seq = 0
        greeting = self._read_packet()
        if greeting[0:1] != b"\x0a":
            raise RuntimeError("unexpected mysql greeting")
        caps = 0x0200 | 0x8000  # PROTOCOL_41 | SECURE_CONNECTION
        self._send_packet(
            struct.pack("<IIB", caps, 1 << 24, 0x21) + b"\x00" * 23 + b"root\x00" + b"\x00"
        )
        if self._read_packet()[0:1] != b"\x00":
            raise RuntimeError("mysql handshake failed")

    def _read_n(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("mysql server closed")
            buf += chunk
        return buf

    def _read_packet(self) -> bytes:
        head = self._read_n(4)
        length = head[0] | (head[1] << 8) | (head[2] << 16)
        self.seq = (head[3] + 1) & 0xFF
        return self._read_n(length)

    def _send_packet(self, payload: bytes) -> None:
        self.sock.sendall(
            struct.pack("<I", len(payload))[:3] + bytes([self.seq]) + payload
        )
        self.seq = (self.seq + 1) & 0xFF

    @staticmethod
    def _lenenc_int(data: bytes, pos: int) -> tuple[int, int]:
        first = data[pos]
        if first < 0xFB:
            return first, pos + 1
        if first == 0xFC:
            return struct.unpack_from("<H", data, pos + 1)[0], pos + 3
        if first == 0xFD:
            return data[pos + 1] | (data[pos + 2] << 8) | (data[pos + 3] << 16), pos + 4
        return struct.unpack_from("<Q", data, pos + 1)[0], pos + 9

    def query(self, sql: str) -> None:
        self.seq = 0
        self._send_packet(b"\x03" + sql.encode())
        first = self._read_packet()
        if first[0:1] == b"\xff":
            raise RuntimeError(f"mysql: {first[10:].decode()}")
        if first[0:1] != b"\x00":  # drain a resultset we don't need
            ncols, _ = self._lenenc_int(first, 0)
            for _ in range(ncols + 1):  # defs + EOF
                self._read_packet()
            while True:
                pkt = self._read_packet()
                if pkt[0:1] == b"\xfe" and len(pkt) < 9:
                    break

    def prepare(self, sql: str) -> tuple[int, int]:
        self.seq = 0
        self._send_packet(b"\x16" + sql.encode())
        ok = self._read_packet()
        if ok[0:1] == b"\xff":
            raise RuntimeError(f"mysql prepare: {ok[10:].decode()}")
        stmt_id, ncols, nparams = struct.unpack_from("<IHH", ok, 1)
        for _ in range(nparams):
            self._read_packet()
        if nparams:
            self._read_packet()  # EOF
        for _ in range(ncols):
            self._read_packet()
        if ncols:
            self._read_packet()  # EOF
        return stmt_id, nparams

    def execute(self, stmt_id: int, params: list) -> list[tuple]:
        """params: list of (mysql_type, wire_bytes_or_None).  Returns
        binary-resultset rows decoded for LONGLONG/DOUBLE columns."""
        n = len(params)
        body = struct.pack("<IBI", stmt_id, 0, 1)
        if n:
            bitmap = bytearray((n + 7) // 8)
            for i, (_t, raw) in enumerate(params):
                if raw is None:
                    bitmap[i // 8] |= 1 << (i % 8)
            body += bytes(bitmap) + b"\x01"
            for t, _raw in params:
                body += bytes([t, 0])
            for _t, raw in params:
                if raw is not None:
                    body += raw
        self.seq = 0
        self._send_packet(b"\x17" + body)
        first = self._read_packet()
        if first[0:1] == b"\xff":
            raise RuntimeError(f"mysql execute: {first[10:].decode()}")
        if first[0:1] == b"\x00":
            return []
        ncols, _ = self._lenenc_int(first, 0)
        ctypes = []
        for _ in range(ncols):
            cdef = self._read_packet()
            pos = 0
            for _ in range(6):
                ln, pos = self._lenenc_int(cdef, pos)
                pos += ln
            pos += 1 + 2 + 4  # fixed-len marker, charset, length
            ctypes.append(cdef[pos])
        self._read_packet()  # EOF after defs
        rows = []
        while True:
            pkt = self._read_packet()
            if pkt[0:1] == b"\xfe" and len(pkt) < 9:
                break
            if pkt[0:1] != b"\x00":
                raise RuntimeError("expected binary row header 0x00")
            nbm = (ncols + 7 + 2) // 8
            bitmap = pkt[1 : 1 + nbm]
            pos, row = 1 + nbm, []
            for k, ct in enumerate(ctypes):
                if bitmap[(k + 2) // 8] & (1 << ((k + 2) % 8)):
                    row.append(None)
                    continue
                if ct == 0x08:  # LONGLONG
                    row.append(struct.unpack_from("<q", pkt, pos)[0])
                    pos += 8
                elif ct == 0x05:  # DOUBLE
                    row.append(struct.unpack_from("<d", pkt, pos)[0])
                    pos += 8
                elif ct == 0x03:  # LONG
                    row.append(struct.unpack_from("<i", pkt, pos)[0])
                    pos += 4
                else:  # lenenc string forms
                    ln, pos = self._lenenc_int(pkt, pos)
                    row.append(pkt[pos : pos + ln].decode())
                    pos += ln
            rows.append(tuple(row))
        return rows

    def close(self) -> None:
        try:
            self.seq = 0
            self._send_packet(b"\x01")
        finally:
            self.sock.close()


class _PgExtended:
    """Startup → Parse/Bind/Execute/Sync with binary param and result
    format codes."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=120)
        params = b"user\x00postgres\x00database\x00public\x00\x00"
        body = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(body) + 4) + body)
        while self._read()[0] != b"Z":
            pass

    def _read_n(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("pg server closed")
            buf += chunk
        return buf

    def _read(self) -> tuple[bytes, bytes]:
        head = self._read_n(5)
        return head[:1], self._read_n(struct.unpack("!I", head[1:])[0] - 4)

    def _send(self, mtype: bytes, body: bytes) -> None:
        self.sock.sendall(mtype + struct.pack("!I", len(body) + 4) + body)

    def simple(self, sql: str) -> None:
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        err = None
        while True:
            t, b = self._read()
            if t == b"E":
                err = self._err(b)
            elif t == b"Z":
                break
        if err is not None:
            raise RuntimeError(f"pg: {err}")

    @staticmethod
    def _err(b: bytes) -> str:
        fields = dict((c[:1], c[1:].decode()) for c in b.split(b"\x00") if c)
        return fields.get(b"M", "unknown")

    def exec_binary(
        self, sql: str, oids: tuple, params: list, param_fmts: list,
        result_binary: bool = False,
    ) -> list[tuple]:
        """One Parse/Bind/Execute/Sync round; params are pre-encoded wire
        bytes (or None for NULL).  Returns raw undecoded result cells."""
        body = b"\x00" + sql.encode() + b"\x00" + struct.pack("!h", len(oids))
        for o in oids:
            body += struct.pack("!I", o)
        self._send(b"P", body)
        body = b"\x00\x00" + struct.pack("!h", len(param_fmts))
        for f in param_fmts:
            body += struct.pack("!h", f)
        body += struct.pack("!h", len(params))
        for p in params:
            if p is None:
                body += struct.pack("!i", -1)
            else:
                body += struct.pack("!i", len(p)) + p
        body += struct.pack("!h", 1 if result_binary else 0)
        if result_binary:
            body += struct.pack("!h", 1)
        self._send(b"B", body)
        self._send(b"E", b"\x00" + struct.pack("!i", 0))
        self._send(b"S", b"")
        rows, err = [], None
        while True:
            t, b = self._read()
            if t == b"D":
                (n,) = struct.unpack_from("!h", b, 0)
                pos, row = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack_from("!i", b, pos)
                    pos += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(b[pos : pos + ln])
                        pos += ln
                rows.append(tuple(row))
            elif t == b"E":
                err = self._err(b)
            elif t == b"Z":
                break
        if err is not None:
            raise RuntimeError(f"pg extended: {err}")
        return rows

    def close(self) -> None:
        try:
            self.sock.sendall(b"X" + struct.pack("!I", 4))
        finally:
            self.sock.close()


# --------------------------------------------------------------- payloads --


def _fixture_rows(spark: SparkSession, sf_dir: str, pred: str) -> list:
    df = load(spark, sf_dir, "events").filter(F.expr(pred))
    return df.select(
        "event_id", "event_type", "props", "value", "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
    ).collect()


def _my_lenenc(data: bytes) -> bytes:
    n = len(data)
    if n < 0xFB:
        return bytes([n]) + data
    if n <= 0xFFFF:
        return b"\xfc" + struct.pack("<H", n) + data
    return b"\xfd" + struct.pack("<I", n)[:3] + data


def _my_datetime(us: int) -> bytes:
    """Epoch µs → the 11-byte binary DATETIME component encoding."""
    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
    return (
        bytes([11])
        + struct.pack("<HBB", dt.year, dt.month, dt.day)
        + bytes([dt.hour, dt.minute, dt.second])
        + struct.pack("<I", dt.microsecond)
    )


def _insert_mysql(port: int, table: str, rows: list) -> None:
    """Typed binary COM_STMT_EXECUTE inserts: VAR_STRING / DOUBLE /
    LONGLONG / binary DATETIME params, NULLs via the null bitmap."""
    my = _MyBinary(port)
    try:
        prepared: dict[int, int] = {}  # chunk size → stmt_id
        for i in range(0, len(rows), _CHUNK_ROWS):
            chunk = rows[i : i + _CHUNK_ROWS]
            k = len(chunk)
            if k not in prepared:
                sql = (
                    f"INSERT INTO {table} "
                    "(event_id, event_type, props, value, user_id, ts) VALUES "
                    + ", ".join(["(?, ?, ?, ?, ?, ?)"] * k)
                )
                prepared[k], nparams = my.prepare(sql)
                if nparams != 6 * k:
                    raise RuntimeError(f"prepare counted {nparams} params, want {6 * k}")
            params: list = []
            for r in chunk:
                params.append((0xFD, _my_lenenc(str(r.event_id).encode())))
                params.append((0xFD, _my_lenenc(str(r.event_type).encode())))
                params.append(
                    (0xFD, None if r.props is None else _my_lenenc(r.props.encode()))
                )
                params.append(
                    (0x05, None if r.value is None else struct.pack("<d", r.value))
                )
                params.append((0x08, struct.pack("<q", r.user_id)))
                params.append((0x0C, _my_datetime(r.us)))
            my.execute(prepared[k], params)
    finally:
        my.close()


def _insert_pg(port: int, table: str, rows: list) -> None:
    """Extended-protocol inserts: text strings mixed with BINARY float8 /
    int8 / timestamp (2000-epoch µs) params via per-param format codes."""
    pg = _PgExtended(port)
    try:
        for i in range(0, len(rows), _CHUNK_ROWS):
            chunk = rows[i : i + _CHUNK_ROWS]
            k = len(chunk)
            placeholders = ", ".join(
                "(" + ", ".join(f"${j * 6 + c + 1}" for c in range(6)) + ")"
                for j in range(k)
            )
            sql = (
                f"INSERT INTO {table} "
                f"(event_id, event_type, props, value, user_id, ts) VALUES {placeholders}"
            )
            oids = (25, 25, 25, 701, 20, 1114) * k
            fmts = [0, 0, 0, 1, 1, 1] * k
            params: list = []
            for r in chunk:
                params.append(str(r.event_id).encode())
                params.append(str(r.event_type).encode())
                params.append(None if r.props is None else r.props.encode())
                params.append(None if r.value is None else struct.pack("!d", r.value))
                params.append(struct.pack("!q", r.user_id))
                params.append(struct.pack("!q", r.us - _PG_EPOCH_US))
            pg.exec_binary(sql, oids, params, fmts)
    finally:
        pg.close()


def _binary_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the binary-wire-loaded table; returns its
    name with servers torn down."""
    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.wire.mysql import MySQLServer
    from incubator_horaedb_spark.wire.postgresql import PostgresServer

    if _STATE["sf_dir"] == sf_dir and _STATE["table"] is not None:
        eng = _STATE["table"]
        if eng.spark is spark:
            return eng
    _ts_read_confs(spark)
    store = _new_store("sg_wire_bin_", _STATE)
    engine = Engine(spark, store)
    name = "ev_bin"
    my_srv = MySQLServer(engine).start()
    try:
        my = _MyBinary(my_srv.port)
        try:
            my.query(
                f"CREATE TABLE IF NOT EXISTS {name} ("
                "event_id string TAG, event_type string TAG, props string TAG, "
                "value double, user_id bigint, ts timestamp NOT NULL, "
                "timestamp KEY(ts)) WITH (enable_ttl='false')"
            )
        finally:
            my.close()
        _insert_mysql(my_srv.port, name, _fixture_rows(spark, sf_dir, _MY_PRED))
    finally:
        my_srv.stop()
    pg_srv = PostgresServer(engine).start()
    try:
        _insert_pg(pg_srv.port, name, _fixture_rows(spark, sf_dir, _PG_PRED))
    finally:
        pg_srv.stop()
    _STATE["sf_dir"] = sf_dir
    _STATE["table"] = engine
    return engine


# engine-side aggregate (Spark SQL dialect; the oracle below states the
# DuckDB rendering of the same math over the raw events table).  min(ts)
# stays a TIMESTAMP column so the binary result path must encode/decode
# 2000-epoch µs; the oracle reconstructs it at the engine's ms grain.
_READ_SQL_SPARK = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(ts) AS oldest_ts,
           CAST(max(unix_millis(ts)) AS BIGINT) AS newest_ms
    FROM ev_bin
    """

_READ_SQL_DUCK = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           make_timestamp(CAST(min(epoch_ms(ts)) AS BIGINT) * 1000) AS oldest_ts,
           CAST(max(epoch_ms(ts)) AS BIGINT) AS newest_ms
    FROM events
    WHERE {_BIN_PRED}
    """


@register("wire_binary_roundtrip", oracle=_READ_SQL_DUCK)
def wire_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary wire roundtrip gate: fixture in through MySQL
    COM_STMT_EXECUTE typed binary params (mysql.py:_bind_stmt_execute) and
    PG extended-protocol Bind with binary format codes
    (postgresql.py:_decode_binary_param), aggregate read back through a PG
    portal with ALL result columns in BINARY format
    (postgresql.py:_encode_binary_result — int8/float8/timestamp as
    2000-epoch µs), counts cross-checked through a MySQL binary resultset.
    Decoded client-side into the returned DataFrame, hash-compared against
    the DuckDB oracle over the raw events table."""
    from incubator_horaedb_spark.wire.mysql import MySQLServer
    from incubator_horaedb_spark.wire.postgresql import PostgresServer

    engine = _binary_table(spark, sf_dir)
    pg_srv = PostgresServer(engine).start()
    try:
        pg = _PgExtended(pg_srv.port)
        try:
            rows = pg.exec_binary(
                _READ_SQL_SPARK, (), [], [], result_binary=True
            )
        finally:
            pg.close()
    finally:
        pg_srv.stop()
    (cells,) = rows
    n_rows = struct.unpack("!q", cells[0])[0]
    sum_value = None if cells[1] is None else struct.unpack("!d", cells[1])[0]
    n_users = struct.unpack("!q", cells[2])[0]
    ts_us = struct.unpack("!q", cells[3])[0] + _PG_EPOCH_US
    oldest_ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=ts_us)
    newest_ms = struct.unpack("!q", cells[4])[0]

    # cross-check: the same counts through a MySQL binary resultset
    my_srv = MySQLServer(engine).start()
    try:
        my = _MyBinary(my_srv.port)
        try:
            sid, _ = my.prepare(
                "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
                "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ev_bin"
            )
            (mrow,) = my.execute(sid, [])
        finally:
            my.close()
    finally:
        my_srv.stop()
    if (mrow[0], mrow[1]) != (n_rows, n_users):
        raise RuntimeError(
            f"mysql binary resultset {mrow} != pg binary portal ({n_rows}, {n_users})"
        )

    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("n_users", T.LongType()),
            T.StructField("oldest_ts", T.TimestampType()),
            T.StructField("newest_ms", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(n_rows, sum_value, n_users, oldest_ts, newest_ms)], schema
    )


# --- binary COPY roundtrip gate --------------------------------------------
# The bulk twin of wire_binary_roundtrip: copy_load_ingest_read proves the
# TEXT COPY/LOAD paths, wire_binary_roundtrip the binary prepared/portal
# paths; this gate closes binary COPY (r11) — a third disjoint fixture
# slice streams in as a hand-framed PGCOPY binary stream (typed big-endian
# fields, timestamps as 2000-epoch µs, NULLs as -1 lengths) and the
# verification aggregate reads back through COPY (SELECT ...) TO STDOUT
# (FORMAT binary), decoded client-side into the compared DataFrame.

_CPB_PRED = "event_type = 'signup' AND (user_id % 5) = 2"
_CPB_STATE: dict = {"sf_dir": None, "table": None, "store": None}


def _pgcopy_binary_payload(rows) -> bytes:
    out = [b"PGCOPY\n\xff\r\n\x00" + struct.pack("!II", 0, 0)]
    for r in rows:
        cells = [
            str(r.event_id).encode(),
            str(r.event_type).encode(),
            None if r.props is None else r.props.encode(),
            None if r.value is None else struct.pack("!d", r.value),
            struct.pack("!q", r.user_id),
            struct.pack("!q", r.us - _PG_EPOCH_US),
        ]
        body = struct.pack("!h", len(cells))
        for cell in cells:
            if cell is None:
                body += struct.pack("!i", -1)
            else:
                body += struct.pack("!i", len(cell)) + cell
        out.append(body)
    out.append(struct.pack("!h", -1))
    return b"".join(out)


def _copy_binary_table(spark: SparkSession, sf_dir: str):
    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.querybank.wire_e2e import _PgBulk
    from incubator_horaedb_spark.wire.postgresql import PostgresServer

    if _CPB_STATE["sf_dir"] == sf_dir and _CPB_STATE["table"] is not None:
        eng = _CPB_STATE["table"]
        if eng.spark is spark:
            return eng
    _ts_read_confs(spark)
    store = _new_store("sg_copy_bin_", _CPB_STATE)
    engine = Engine(spark, store)
    name = "ev_cpb"
    srv = PostgresServer(engine).start()
    try:
        pg = _PgBulk(srv.port)
        try:
            pg.query(
                f"CREATE TABLE IF NOT EXISTS {name} ("
                "event_id string TAG, event_type string TAG, props string TAG, "
                "value double, user_id bigint, ts timestamp NOT NULL, "
                "timestamp KEY(ts)) WITH (enable_ttl='false')"
            )
            rows = _fixture_rows(spark, sf_dir, _CPB_PRED)
            pg.copy_in(
                f"COPY {name} (event_id, event_type, props, value, user_id, ts) "
                "FROM STDIN WITH (FORMAT binary)",
                _pgcopy_binary_payload(rows),
            )
        finally:
            pg.close()
    finally:
        srv.stop()
    _CPB_STATE["sf_dir"] = sf_dir
    _CPB_STATE["table"] = engine
    return engine


_CPB_READ_SPARK = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(ts) AS oldest_ts,
           CAST(max(unix_millis(ts)) AS BIGINT) AS newest_ms
    FROM ev_cpb
    """

_CPB_ORACLE = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           make_timestamp(CAST(min(epoch_ms(ts)) AS BIGINT) * 1000) AS oldest_ts,
           CAST(max(epoch_ms(ts)) AS BIGINT) AS newest_ms
    FROM events
    WHERE {_CPB_PRED}
    """


@register("copy_binary_ingest_read", oracle=_CPB_ORACLE)
def copy_binary_ingest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary COPY roundtrip gate: the fixture slice streams in through a
    real PG socket as COPY FROM STDIN (FORMAT binary) — PGCOPY signature,
    typed big-endian fields, 2000-epoch-µs timestamps, NULL bitmap-free
    -1 lengths (postgresql.py:_copy_decode_binary) — and the aggregate
    reads back through COPY (SELECT ...) TO STDOUT (FORMAT binary)
    (postgresql.py:_copy_binary_cell), decoded client-side.  Corruption
    anywhere in frame→decode→store→aggregate→encode→decode shows as a
    hash mismatch against the raw-events oracle."""
    from incubator_horaedb_spark.querybank.wire_e2e import _PgBulk
    from incubator_horaedb_spark.wire.postgresql import PostgresServer

    engine = _copy_binary_table(spark, sf_dir)
    srv = PostgresServer(engine).start()
    try:
        pg = _PgBulk(srv.port)
        try:
            dump = pg.copy_out(
                f"COPY ({_CPB_READ_SPARK.strip()}) TO STDOUT WITH (FORMAT binary)"
            )
        finally:
            pg.close()
    finally:
        srv.stop()
    if not dump.startswith(b"PGCOPY\n\xff\r\n\x00"):
        raise RuntimeError("COPY TO binary: bad signature")
    off = 11 + 8
    (nf,) = struct.unpack_from("!h", dump, off)
    off += 2
    if nf != 5:
        raise RuntimeError(f"COPY TO binary: expected 5 fields, got {nf}")
    cells = []
    for _ in range(nf):
        (ln,) = struct.unpack_from("!i", dump, off)
        off += 4
        if ln == -1:
            cells.append(None)
            continue
        cells.append(dump[off : off + ln])
        off += ln
    (trailer,) = struct.unpack_from("!h", dump, off)
    if trailer != -1:
        raise RuntimeError("COPY TO binary: missing trailer")
    n_rows = struct.unpack("!q", cells[0])[0]
    sum_value = None if cells[1] is None else struct.unpack("!d", cells[1])[0]
    n_users = struct.unpack("!q", cells[2])[0]
    ts_us = struct.unpack("!q", cells[3])[0] + _PG_EPOCH_US
    oldest_ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=ts_us)
    newest_ms = struct.unpack("!q", cells[4])[0]
    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("n_users", T.LongType()),
            T.StructField("oldest_ts", T.TimestampType()),
            T.StructField("newest_ms", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(n_rows, sum_value, n_users, oldest_ts, newest_ms)], schema
    )
