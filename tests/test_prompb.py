"""Prometheus remote read/write protobuf+snappy framing
(frontends/prompb.py + the /prom/v1/* routes): codec roundtrips, a
hand-built snappy stream with copy elements, and the
integration_tests/prom/remote-query.py data shape driven end-to-end
through protobuf bodies over a real socket.
"""

from __future__ import annotations

import struct
import urllib.request

import pytest

from incubator_horaedb_spark.frontends import prompb
from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.server import EngineServer


# ------------------------------------------------------------- snappy --
def test_snappy_roundtrip():
    for payload in (b"", b"x", b"hello world" * 1000, bytes(range(256)) * 300):
        assert prompb.snappy_decompress(prompb.snappy_compress(payload)) == payload


def test_snappy_decodes_copies():
    # hand-built stream: literal "abcd", copy1(len 4, offset 4) → "abcdabcd"
    stream = prompb._enc_uvarint(8) + bytes([3 << 2]) + b"abcd" + bytes([(0 << 5) | (0 << 2) | 1, 4])
    assert prompb.snappy_decompress(stream) == b"abcdabcd"
    # overlapping copy: literal "ab", copy1(len 6, offset 2) → "abababab"
    stream = prompb._enc_uvarint(8) + bytes([1 << 2]) + b"ab" + bytes([(0 << 5) | (2 << 2) | 1, 2])
    assert prompb.snappy_decompress(stream) == b"abababab"
    # copy2: literal "xy", 2-byte offset form
    stream = prompb._enc_uvarint(6) + bytes([1 << 2]) + b"xy" + bytes([(4 - 1) << 2 | 2]) + struct.pack("<H", 2)
    assert prompb.snappy_decompress(stream) == b"xyxyxy"


# ----------------------------------------------------------- protobuf --
def test_write_request_roundtrip():
    series = [
        {
            "labels": {"__name__": "cpu", "host": "a"},
            "samples": [(1700000000000, 0.5), (1700000001000, 1.5)],
        },
        {"labels": {"__name__": "mem", "host": "b"}, "samples": [(1700000000000, 7.0)]},
    ]
    out = prompb.decode_write_request(prompb.encode_write_request(series))
    assert out == series


def test_read_request_roundtrip():
    queries = [
        {
            "start_ms": 1700000000000,
            "end_ms": 1700000100000,
            "matchers": [("__name__", "=", "cpu"), ("host", "!=", "b"), ("dc", "=~", "us.*")],
        }
    ]
    assert prompb.decode_read_request(prompb.encode_read_request(queries)) == queries


def test_read_response_roundtrip():
    results = [
        [{"labels": {"__name__": "cpu", "host": "a"}, "samples": [(1700000000000, 1.0)]}],
        [],
    ]
    assert prompb.decode_read_response(prompb.encode_read_response(results)) == results


# ------------------------------------------------- end-to-end over HTTP --
@pytest.fixture()
def server(spark, tmp_path):
    srv = EngineServer(Engine(spark, str(tmp_path / "store"))).start()
    yield srv
    srv.stop()


def _post_proto(srv, path: str, body: bytes) -> tuple[int, bytes]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=body,
        headers={
            "content-type": "application/x-protobuf",
            "content-encoding": "snappy",
        },
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read()


def test_prom_remote_protobuf_roundtrip(server):
    import time

    # remote-query.py shape: tag1="v1", TAG2="v2", two samples 5s apart
    # (current timestamps like remote-query.py `now()` — the auto-created
    # table has the default 7d TTL)
    ts = int(time.time()) * 1000
    write = prompb.snappy_compress(
        prompb.encode_write_request(
            [
                {
                    "labels": {"__name__": "prom_pb_test", "tag1": "v1", "TAG2": "v2"},
                    "samples": [(ts - 5000, 1.0), (ts, 11.0)],
                }
            ]
        )
    )
    status, _ = _post_proto(server, "/prom/v1/write", write)
    assert status == 204

    read = prompb.snappy_compress(
        prompb.encode_read_request(
            [
                {
                    "start_ms": ts - 300_000,
                    "end_ms": ts,
                    "matchers": [("__name__", "=", "prom_pb_test"), ("tag1", "=", "v1")],
                }
            ]
        )
    )
    status, body = _post_proto(server, "/prom/v1/read", read)
    assert status == 200
    results = prompb.decode_read_response(prompb.snappy_decompress(body))
    assert len(results) == 1 and len(results[0]) == 1
    series = results[0][0]
    # remote-query.py asserts: metric labels + both samples in order
    assert series["labels"] == {
        "__name__": "prom_pb_test",
        "tag1": "v1",
        "TAG2": "v2",
    }
    assert series["samples"] == [(ts - 5000, 1.0), (ts, 11.0)]


def test_prom_remote_regex_matcher_protobuf(server):
    import time

    ts = int(time.time()) * 1000
    write = prompb.snappy_compress(
        prompb.encode_write_request(
            [
                {"labels": {"__name__": "pbm", "host": "web01"}, "samples": [(ts, 1.0)]},
                {"labels": {"__name__": "pbm", "host": "db01"}, "samples": [(ts, 2.0)]},
            ]
        )
    )
    assert _post_proto(server, "/prom/v1/write", write)[0] == 204
    read = prompb.snappy_compress(
        prompb.encode_read_request(
            [
                {
                    "start_ms": ts - 1000,
                    "end_ms": ts + 1000,
                    "matchers": [("__name__", "=", "pbm"), ("host", "=~", "web.*")],
                }
            ]
        )
    )
    _, body = _post_proto(server, "/prom/v1/read", read)
    results = prompb.decode_read_response(prompb.snappy_decompress(body))
    assert [s["labels"]["host"] for s in results[0]] == ["web01"]
