"""Prometheus remote-storage transport framing: the ``prompb`` protobuf
messages and snappy block-format codec, hand-rolled from the PUBLIC wire
specifications (protobuf encoding spec; snappy format description;
prometheus/prompb/remote.proto + types.proto message layouts).

The reference speaks exactly this on its ``/prom/v1/{write,read}`` routes
(src/server/src/http.rs:274-291 — snappy-compressed protobuf bodies,
handled by the proxy's remote read/write).  The query semantics live in
frontends/prom_remote.py; this module is only the byte framing:

    WriteRequest  { repeated TimeSeries timeseries = 1; }
    TimeSeries    { repeated Label labels = 1; repeated Sample samples = 2; }
    Label         { string name = 1; string value = 2; }
    Sample        { double value = 1; int64 timestamp = 2; }
    ReadRequest   { repeated Query queries = 1; }
    Query         { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
                    repeated LabelMatcher matchers = 3; }
    LabelMatcher  { enum Type { EQ NEQ RE NRE } type = 1;
                    string name = 2; string value = 3; }
    ReadResponse  { repeated QueryResult results = 1; }
    QueryResult   { repeated TimeSeries timeseries = 1; }

No third-party snappy/protobuf library is used: the decoder handles the
full snappy block format (literals + all three copy element kinds), the
encoder emits a valid literals-only stream (the format permits any
element mix; compression ratio is transport detail, not correctness).
"""

from __future__ import annotations

import struct
from typing import Any

# --------------------------------------------------------------- varint --


def _enc_uvarint(n: int) -> bytes:
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# ---------------------------------------------------------------- snappy --


def snappy_compress(data: bytes) -> bytes:
    """Valid snappy block stream using literal elements only (the format
    allows it; Prometheus/golang-snappy decodes it fine)."""
    out = bytearray(_enc_uvarint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        n = len(chunk) - 1
        if n < 60:
            out.append(n << 2)
        elif n < 0x100:
            out.append(60 << 2)
            out.append(n)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", n)
        out += chunk
        pos += len(chunk)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Full block-format decoder: literals and copy-1/2/4 elements."""
    expected, pos = _dec_uvarint(data, 0)
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            n = tag >> 2
            if n >= 60:
                extra = n - 59
                n = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            n += 1
            out += data[pos : pos + n]
            pos += n
            continue
        if kind == 1:  # copy with 1-byte offset
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy with 2-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy with 4-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0:
            raise ValueError("snappy: zero copy offset")
        # overlapping copies are defined byte-at-a-time
        for _ in range(length):
            out.append(out[-offset])
    if len(out) != expected:
        raise ValueError(f"snappy: length mismatch {len(out)} != {expected}")
    return bytes(out)


# -------------------------------------------------------------- protobuf --


def _field(num: int, wire: int) -> bytes:
    return _enc_uvarint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _enc_uvarint(len(payload)) + payload


def _str(num: int, s: str) -> bytes:
    return _len_delim(num, s.encode())


def _iter_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _dec_uvarint(buf, pos)
        num, wire = key >> 3, key & 0x07
        if wire == 0:  # varint
            val, pos = _dec_uvarint(buf, pos)
        elif wire == 1:  # fixed64
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            n, pos = _dec_uvarint(buf, pos)
            val = buf[pos : pos + n]
            pos += n
        elif wire == 5:  # fixed32
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, val


# ---- TimeSeries <-> the dict form used by frontends/prom_remote.py ----
# {"labels": {name: value, ...}, "samples": [(ts_ms, value), ...]}


def _enc_timeseries(series: dict[str, Any]) -> bytes:
    body = b""
    for name, value in series["labels"].items():
        body += _len_delim(1, _str(1, name) + _str(2, str(value)))
    for ts_ms, value in series["samples"]:
        sample = (
            _field(1, 1)
            + struct.pack("<d", float(value))
            + _field(2, 0)
            + _enc_uvarint(int(ts_ms))
        )
        body += _len_delim(2, sample)
    return body


def _dec_timeseries(buf: bytes) -> dict[str, Any]:
    labels: dict[str, str] = {}
    samples: list[tuple[int, float]] = []
    for num, _wire, val in _iter_fields(buf):
        if num == 1:
            name = value = ""
            for n2, _w2, v2 in _iter_fields(val):
                if n2 == 1:
                    name = v2.decode()
                elif n2 == 2:
                    value = v2.decode()
            labels[name] = value
        elif num == 2:
            ts, v = 0, 0.0
            for n2, w2, v2 in _iter_fields(val):
                if n2 == 1 and w2 == 1:
                    v = struct.unpack("<d", v2)[0]
                elif n2 == 2:
                    ts = v2 if isinstance(v2, int) else 0
                    if ts >= 1 << 63:  # two's complement int64
                        ts -= 1 << 64
            samples.append((ts, v))
    return {"labels": labels, "samples": samples}


def encode_write_request(series_list: list[dict[str, Any]]) -> bytes:
    return b"".join(_len_delim(1, _enc_timeseries(s)) for s in series_list)


def decode_write_request(buf: bytes) -> list[dict[str, Any]]:
    return [_dec_timeseries(val) for num, _w, val in _iter_fields(buf) if num == 1]


# ---- ReadRequest / ReadResponse ----

_MATCHER_OPS = ["=", "!=", "=~", "!~"]  # prompb LabelMatcher.Type EQ NEQ RE NRE


def encode_read_request(queries: list[dict[str, Any]]) -> bytes:
    """queries: [{"start_ms", "end_ms", "matchers": [(name, op, value)]}]"""
    out = b""
    for q in queries:
        body = _field(1, 0) + _enc_uvarint(int(q["start_ms"]))
        body += _field(2, 0) + _enc_uvarint(int(q["end_ms"]))
        for name, op, value in q["matchers"]:
            m = (
                _field(1, 0)
                + _enc_uvarint(_MATCHER_OPS.index(op))
                + _str(2, name)
                + _str(3, value)
            )
            body += _len_delim(3, m)
        out += _len_delim(1, body)
    return out


def decode_read_request(buf: bytes) -> list[dict[str, Any]]:
    queries = []
    for num, _w, val in _iter_fields(buf):
        if num != 1:
            continue
        q: dict[str, Any] = {"start_ms": 0, "end_ms": 0, "matchers": []}
        for n2, _w2, v2 in _iter_fields(val):
            if n2 == 1:
                q["start_ms"] = v2
            elif n2 == 2:
                q["end_ms"] = v2
            elif n2 == 3:
                mtype, name, value = 0, "", ""
                for n3, _w3, v3 in _iter_fields(v2):
                    if n3 == 1:
                        mtype = v3
                    elif n3 == 2:
                        name = v3.decode()
                    elif n3 == 3:
                        value = v3.decode()
                q["matchers"].append((name, _MATCHER_OPS[mtype], value))
        queries.append(q)
    return queries


def encode_read_response(results: list[list[dict[str, Any]]]) -> bytes:
    """results: one list of series dicts per query."""
    out = b""
    for series_list in results:
        body = b"".join(_len_delim(1, _enc_timeseries(s)) for s in series_list)
        out += _len_delim(1, body)
    return out


def decode_read_response(buf: bytes) -> list[list[dict[str, Any]]]:
    results = []
    for num, _w, val in _iter_fields(buf):
        if num == 1:
            results.append(
                [_dec_timeseries(v2) for n2, _w2, v2 in _iter_fields(val) if n2 == 1]
            )
    return results
