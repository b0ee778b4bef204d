"""End-to-end WIRE BULK-LOAD correctness (VERDICT r09 next-round #2).

PG COPY FROM STDIN and MySQL LOAD DATA LOCAL INFILE (both round 9) were
pytest-green over real sockets, but no oracle-gated query's fixture ever
flowed through a wire socket — the protocol_e2e gates prove the HTTP
routes (influx/opentsdb/prom write), not the SQL wire protocols'
bulk-load paths.  This gate closes that: a deterministic subset of the
events table is split in half by user_id; one half is rendered as COPY
text rows and streamed through a real PostgreSQL socket (StartupMessage →
Query "COPY ... FROM STDIN" → CopyData/CopyDone), the other half as TSV
through a real MySQL socket (handshake → COM_QUERY "LOAD DATA LOCAL
INFILE" → 0xFB file-request → payload packets), both into the SAME engine
table.  The read side aggregates that table through the dedup view; the
DuckDB oracle states the same aggregate over the RAW events table, so a
row lost, duplicated, or corrupted anywhere in client rendering → wire
framing → COPY/LOAD parsing (wire/rowtext.py typed_cell) → insert_rows →
segment write → dedup-on-read shows up as a hash mismatch.

Reference contract: integration_tests/postgresql/basic.sh and
integration_tests/mysql/basic.sh drive the reference's wire servers
end-to-end the same way (the reference has no COPY/LOAD DATA at all —
its PG handler is simple-query-only, handler.rs:44, and its MySQL worker
rejects every prepare, worker.rs:66-85 — so this gate covers a
beyond-reference surface with the same fixture-through-socket rigor).

Scale shape: the wire-client role is inherently driver-side (it frames
packets), so the fixture subset is bounded (~1/5 of one event type,
split across the two protocols; ≈40k rows per half at sf1, chunked
sends).  The at-scale bulk path is the parquet/streaming ingest already
gated elsewhere; the READ side here is the standard distributed
dedup-view plan.
"""

from __future__ import annotations

import socket
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.detfloat import dyadic_sql, r_out_sql
from incubator_horaedb_spark.querybank.protocol_e2e import _quantized_sum
from incubator_horaedb_spark.querybank.registry import (
    _ts_read_confs,
    load,
    register,
)
from incubator_horaedb_spark.querybank.streaming_e2e import _new_store

# deterministic, oracle-expressible subset: signups of every 5th user
# (the protocol_e2e gates use click/error/view — a disjoint family here).
# PG COPY carries user_id % 10 == 0, MySQL LOAD DATA user_id % 10 == 5.
_BULK_PRED = "event_type = 'signup' AND (user_id % 5) = 0"
_PG_PRED = _BULK_PRED + " AND (user_id % 10) = 0"
_MY_PRED = _BULK_PRED + " AND (user_id % 10) = 5"
_CHUNK = 1 << 20  # bytes per CopyData / LOAD payload packet

_STATE: dict = {"sf_dir": None, "table": None, "store": None}


# --------------------------------------------------------------- clients --
# Minimal from-scratch wire clients (no psycopg/mysql lib in the
# container) — the same role tests/test_wire_*.py's Mini clients play,
# embedded here because the querybank cannot import test modules.


class _PgBulk:
    """StartupMessage → simple Query → COPY FROM STDIN exchange."""

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

    def _send(self, sql: str) -> None:
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)

    @staticmethod
    def _err(b: bytes) -> str:
        fields = dict((c[:1], c[1:].decode()) for c in b.split(b"\x00") if c)
        return fields.get(b"M", "unknown")

    def query(self, sql: str) -> None:
        self._send(sql)
        err = None
        while True:
            t, b = self._read()
            if t == b"E":
                err = self._err(b)
            elif t == b"Z":
                break
        if err is not None:
            raise RuntimeError(f"pg: {err}")

    def copy_in(self, sql: str, payload: bytes) -> str:
        self._send(sql)
        tag = err = None
        while True:
            t, b = self._read()
            if t == b"G":  # CopyInResponse → stream CopyData + CopyDone
                for i in range(0, len(payload), _CHUNK):
                    chunk = payload[i : i + _CHUNK]
                    self.sock.sendall(
                        b"d" + struct.pack("!I", len(chunk) + 4) + chunk
                    )
                self.sock.sendall(b"c" + struct.pack("!I", 4))
            elif t == b"C":
                tag = b.rstrip(b"\x00").decode()
            elif t == b"E":
                err = self._err(b)
            elif t == b"Z":
                break
        if err is not None:
            raise RuntimeError(f"pg COPY: {err}")
        return tag or ""

    def copy_out(self, sql: str) -> bytes:
        """COPY ... TO STDOUT exchange; returns the concatenated CopyData
        payload (text lines or the PGCOPY binary stream)."""
        self._send(sql)
        chunks: list[bytes] = []
        err = None
        while True:
            t, b = self._read()
            if t == b"d":
                chunks.append(b)
            elif t == b"E":
                err = self._err(b)
            elif t == b"Z":
                break
        if err is not None:
            raise RuntimeError(f"pg COPY TO: {err}")
        return b"".join(chunks)

    def close(self) -> None:
        try:
            self.sock.sendall(b"X" + struct.pack("!I", 4))
        finally:
            self.sock.close()


class _MyBulk:
    """Handshake 4.1 → COM_QUERY → LOAD DATA LOCAL INFILE exchange."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=120)
        self.seq = 0
        greeting = self._read_packet()
        if greeting[0:1] != b"\x0a":
            raise RuntimeError("unexpected mysql greeting")
        caps = 0x0200 | 0x8000 | 0x80  # PROTOCOL_41 | SECURE_CONN | LOCAL_FILES
        payload = (
            struct.pack("<IIB", caps, 1 << 24, 0x21)
            + b"\x00" * 23
            + b"root\x00"
            + b"\x00"
        )
        self._send_packet(payload)
        ok = self._read_packet()
        if ok[0:1] != b"\x00":
            raise RuntimeError(f"mysql handshake failed: {ok!r}")

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

    def load_data(self, sql: str, payload: bytes) -> None:
        self.seq = 0
        self._send_packet(b"\x03" + sql.encode())
        first = self._read_packet()
        if first[0:1] == b"\xff":
            raise RuntimeError(f"mysql LOAD: {first[10:].decode()}")
        if first[0:1] != b"\xfb":
            raise RuntimeError(f"expected LOCAL INFILE request, got {first[:1]!r}")
        for i in range(0, len(payload), _CHUNK):
            self._send_packet(payload[i : i + _CHUNK])
        self._send_packet(b"")  # EOF
        ok = self._read_packet()
        if ok[0:1] == b"\xff":
            raise RuntimeError(f"mysql LOAD: {ok[10:].decode()}")

    def close(self) -> None:
        try:
            self.seq = 0
            self._send_packet(b"\x01")  # COM_QUIT
        finally:
            self.sock.close()


# --------------------------------------------------------------- payloads --


def _esc_tsv(v) -> str:
    """One TSV cell: backslash-first escaping, identical for PG COPY text
    format and MySQL LOAD DATA's default clauses (ESCAPED BY '\\\\'), and
    ``\\N`` for NULL — the NULL spelling both loaders accept.  A None
    reaching either loader unescaped would crash (None.replace) or load
    the literal string 'None' (r10 review #8)."""
    if v is None:
        return "\\N"
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _tsv_rows(spark: SparkSession, sf_dir: str, pred: str) -> bytes:
    """The fixture half as tab-separated text rows:
    event_id, event_type, props, value, user_id, ts(epoch-ms)."""
    df = load(spark, sf_dir, "events").filter(F.expr(pred))
    rows = df.select(
        "event_id", "event_type", "props", "value", "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
    ).collect()
    lines = [
        "\t".join(
            (
                _esc_tsv(r.event_id),
                _esc_tsv(r.event_type),
                _esc_tsv(r.props),
                "\\N" if r.value is None else repr(r.value),
                _esc_tsv(r.user_id),
                "\\N" if r.us is None else str(r.us // 1000),
            )
        )
        for r in rows
    ]
    return ("\n".join(lines) + "\n").encode() if lines else b""


def _bulk_table(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) the wire-bulk-loaded table and return its
    Table handle.  Fresh PG + MySQL servers on ephemeral ports live only
    for the duration of the loads."""
    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.table import Table
    from incubator_horaedb_spark.wire.mysql import MySQLServer
    from incubator_horaedb_spark.wire.postgresql import PostgresServer

    if _STATE["sf_dir"] == sf_dir and _STATE["table"] is not None:
        tbl = _STATE["table"]
        if tbl.spark is spark:
            return tbl
    _ts_read_confs(spark)
    store = _new_store("sg_wire_bulk_", _STATE)
    engine = Engine(spark, store)
    name = "ev_bulk"
    cols = "(event_id, event_type, props, value, user_id, ts)"
    pg_srv = PostgresServer(engine).start()
    try:
        pg = _PgBulk(pg_srv.port)
        try:
            pg.query(
                f"CREATE TABLE IF NOT EXISTS {name} ("
                "event_id string TAG, event_type string TAG, props string TAG, "
                "value double, user_id bigint, ts timestamp NOT NULL, "
                "timestamp KEY(ts)) WITH (enable_ttl='false')"
            )
            pg.copy_in(
                f"COPY {name} {cols} FROM STDIN",
                _tsv_rows(spark, sf_dir, _PG_PRED),
            )
        finally:
            pg.close()
    finally:
        pg_srv.stop()
    my_srv = MySQLServer(engine).start()
    try:
        my = _MyBulk(my_srv.port)
        try:
            my.load_data(
                f"LOAD DATA LOCAL INFILE 'ev_bulk.tsv' INTO TABLE {name} {cols}",
                _tsv_rows(spark, sf_dir, _MY_PRED),
            )
        finally:
            my.close()
    finally:
        my_srv.stop()
    tbl = Table(spark, engine.catalog, name)
    _STATE["sf_dir"] = sf_dir
    _STATE["table"] = tbl
    return tbl


_BULK_SQL = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(epoch_ms(ts)) AS BIGINT) AS oldest_ms,
           CAST(max(epoch_ms(ts)) AS BIGINT) AS newest_ms
    FROM events
    WHERE {_BULK_PRED}
    """


@register("copy_load_ingest_read", oracle=_BULK_SQL)
def copy_load_ingest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire bulk-load → read gate: signups of every 5th user, one half
    streamed through a real PostgreSQL socket as COPY FROM STDIN text
    (postgresql.py:808, typed by wire/rowtext.py), the other half through
    a real MySQL socket as LOAD DATA LOCAL INFILE TSV (mysql.py:430),
    both into one engine table, read back through the dedup view.
    Counts catch dropped/duplicated rows or a half lost entirely, the
    quantized sum catches value corruption in either parser, the
    distinct-user count catches integer decode errors, and the
    oldest/newest-ms pair catches epoch-ms timestamp mishandling on
    either path."""
    tbl = _bulk_table(spark, sf_dir)
    return tbl.read().select(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _quantized_sum("value").alias("sum_value"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min(F.unix_millis("ts")).cast("long").alias("oldest_ms"),
        F.max(F.unix_millis("ts")).cast("long").alias("newest_ms"),
    )
