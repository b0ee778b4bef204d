"""PostgreSQL wire server driven by a from-scratch simple-query client
(no psycopg in the container) — mirrors integration_tests/postgresql/
basic.sh: show tables / select 1, now() / drop if exists / CREATE TABLE /
INSERT / SELECT * FROM demo.
"""

from __future__ import annotations

import socket
import struct

import pytest

from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.wire.postgresql import PostgresServer


class MiniPgClient:
    def __init__(self, port: int, with_ssl_probe: bool = True):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        if with_ssl_probe:
            # psql sends SSLRequest first; server must answer 'N'
            self.sock.sendall(struct.pack("!II", 8, 80877103))
            assert self.sock.recv(1) == b"N"
        params = b"user\x00postgres\x00database\x00public\x00\x00"
        body = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(body) + 4) + body)
        self.params: dict[str, str] = {}
        while True:
            t, b = self._read_message()
            if t == b"R":
                assert struct.unpack("!I", b)[0] == 0  # AuthenticationOk
            elif t == b"S":
                k, v = b.rstrip(b"\x00").split(b"\x00")
                self.params[k.decode()] = v.decode()
            elif t == b"Z":
                break

    def _read_n(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return buf

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._read_n(5)
        return head[:1], self._read_n(struct.unpack("!I", head[1:])[0] - 4)

    def query(self, sql: str):
        """Returns (tag, columns, rows); raises on ErrorResponse."""
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        columns, rows, tag, err = [], [], None, None
        while True:
            t, b = self._read_message()
            if t == b"T":
                (ncols,) = struct.unpack_from("!h", b, 0)
                pos = 2
                for _ in range(ncols):
                    end = b.index(b"\x00", pos)
                    name = b[pos:end].decode()
                    pos = end + 1
                    _tbl, _att, oid, _sz, _mod, _fmt = struct.unpack_from("!IhIhih", b, pos)
                    pos += 18
                    columns.append((name, oid))
            elif t == b"D":
                (n,) = struct.unpack_from("!h", b, 0)
                pos, row = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack_from("!i", b, pos)
                    pos += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(b[pos : pos + ln].decode())
                        pos += ln
                rows.append(tuple(row))
            elif t == b"C":
                tag = b.rstrip(b"\x00").decode()
            elif t == b"E":
                fields = dict(
                    (chunk[:1], chunk[1:].decode())
                    for chunk in b.split(b"\x00")
                    if chunk
                )
                err = fields.get(b"M", "unknown")
            elif t == b"Z":
                break
        if err is not None:
            raise RuntimeError(err)
        return tag, columns, rows

    def close(self) -> None:
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()


@pytest.fixture()
def pg_server(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "store"))
    srv = PostgresServer(engine).start()
    yield srv
    srv.stop()


def test_pg_basic_sh_sequence(pg_server):
    c = MiniPgClient(pg_server.port)
    assert "HoraeDB" in c.params.get("server_version", "")

    tag, cols, rows = c.query("show tables")
    assert tag == "SELECT 0" and [n for n, _ in cols] == ["table_name"]

    tag, cols, rows = c.query("select 1 as one, now() as t")
    assert rows[0][0] == "1" and int(rows[0][1]) > 1_000_000_000_000  # epoch ms
    assert dict(cols)["t"] == 1114  # TIMESTAMP oid (handler.rs convert_data_type)

    tag, _, _ = c.query("drop table if exists demo")
    assert tag == "DROP TABLE"
    tag, _, _ = c.query(
        "CREATE TABLE `demo`(`name` string TAG, `value` double NOT NULL, "
        "`t` timestamp NOT NULL, timestamp KEY(t)) ENGINE = Analytic "
        "WITH (enable_ttl='false')"
    )
    assert tag == "CREATE TABLE"
    tag, _, _ = c.query(
        "insert into demo (name, value, t) values ('horaedb', 1, 1691116127622)"
    )
    assert tag == "INSERT 0 1"

    tag, cols, rows = c.query("select name, value, t from demo")
    assert tag == "SELECT 1"
    oids = dict(cols)
    assert oids["name"] == 25 and oids["value"] == 701 and oids["t"] == 1114
    assert rows == [("horaedb", "1.0", "1691116127622")]
    c.close()


def test_pg_error_and_null(pg_server):
    c = MiniPgClient(pg_server.port, with_ssl_probe=False)  # direct startup
    with pytest.raises(RuntimeError, match="(?i)table|found"):
        c.query("select * from missing_table")
    # connection stays usable after an error (ReadyForQuery followed)
    c.query(
        "CREATE TABLE n2 (tag1 string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY(t)) WITH (enable_ttl='false')"
    )
    c.query("insert into n2 (t, v) values (1691116127622, 2.5)")
    _, _, rows = c.query("select tag1, v from n2")
    assert rows == [(None, "2.5")]
    c.close()
