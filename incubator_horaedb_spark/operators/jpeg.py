"""Baseline JPEG codec in pure numpy — no codec libraries.

Closes the last multimodal decode stub (VERDICT r04 next-round #4): the
sequential-DCT baseline JPEG pipeline of ITU-T T.81 (public spec) is
implementable with stdlib + numpy:

- encoder: level shift → 8×8 forward DCT (orthonormal matrix form) →
  quantization → zigzag → DC-delta/AC run-length Huffman coding with the
  Annex K luminance tables → byte stuffing → SOI/DQT/SOF0/DHT/SOS/EOI;
- decoder: full marker walk, DQT/DHT tables built FROM THE STREAM (the
  file is self-describing — the decoder never assumes the encoder's
  constants), bit-unstuffing entropy decode, dequantize, inverse zigzag,
  IDCT, +128 level shift, clamp, crop.

Scope (honest): 8-bit single-component (grayscale) sequential baseline,
no chroma subsampling, no restart intervals, no progressive — the full
entropy/transform pipeline with the smallest container.  Color adds a
YCbCr conversion whose rounding makes per-channel sums non-exact; the
grayscale path keeps the oracle closed-form (see
querybank/multimodal.py::multimodal_jpeg_pixel_stats).  Unsupported
shapes raise with a clear message instead of mis-decoding.

Exactness note for the gated query: the synthetic corpus uses
block-constant pixels, whose DCT is a pure integer DC (8·(v−128)) with
analytically-zero AC — float noise ~1e-13 is killed by coefficient
rounding, so encode→decode reproduces the source EXACTLY and an SQL
oracle can restate the pixel sums from the generator formula without
seeing any bytes.  Arbitrary images round-trip within a small tolerance
(quantization error only — exercised by unit tests, which drive the AC
Huffman path for real).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared constants ------------------------------------------------------

# Orthonormal 8x8 DCT-II matrix: C[u, x] = a(u) * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _zigzag_pairs() -> list[tuple[int, int]]:
    """(row, col) visiting order of the JPEG zigzag — generated, not
    hand-typed (T.81 Figure A.6)."""
    out = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            rows = reversed(rows)
        out.extend((r, s - r) for r in rows)
    return out


_ZZ = _zigzag_pairs()
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ])

# Annex K (T.81 Tables K.3 / K.5) luminance Huffman tables, as
# (bits[1..16], values).  The stream carries these in DHT, so the decoder
# works for ANY table; these are just the encoder's choice.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)

# All-ones quantization table: near-lossless (the "quality 100+" corner of
# baseline JPEG) — the gated corpus needs exact reconstruction and the
# round-trip tests want tight tolerances.  A real deployment would scale
# the Annex K table by quality; the codec is table-agnostic either way
# (both sides read/write DQT).
_QUANT = np.ones((8, 8), dtype=np.int32)


def _category(v: int) -> int:
    """Bit size of |v| (0 for 0) — T.81 F.1.2.1.1."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _encode_amplitude(v: int) -> tuple[int, int]:
    """(raw bits, size) for a DC diff / AC value — negatives use the
    one's-complement convention (T.81 F.1.2.1)."""
    s = _category(v)
    return (v if v >= 0 else v + (1 << s) - 1, s)


def encode_baseline_jpeg(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale array as a sequential baseline
    JPEG.  Dimensions need not be multiples of 8 (edge blocks replicate
    the last row/column, the standard padding choice)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    shifted = padded.astype(np.float64) - 128.0

    wtr = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _C @ block @ _C.T
            q = np.round(coef / _QUANT).astype(np.int64)
            zz = q.reshape(-1)[_ZZ_FLAT]
            # DC: delta-coded
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            amp, size = _encode_amplitude(diff)
            code, length = _DC_CODES[size]
            wtr.write(code, length)
            if size:
                wtr.write(amp, size)
            # AC: (run, size) symbols with ZRL and EOB
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _AC_CODES[0xF0]  # ZRL
                    wtr.write(code, length)
                    run -= 16
                amp, size = _encode_amplitude(v)
                code, length = _AC_CODES[run * 16 + size]
                wtr.write(code, length)
                wtr.write(amp, size)
                run = 0
            if last_nz < 63:
                code, length = _AC_CODES[0x00]  # EOB
                wtr.write(code, length)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0x00]) + bytes(int(x) for x in _QUANT.reshape(-1)[_ZZ_FLAT]))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof0 + dht + sos + bytes(wtr.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG: dangling 0xFF in entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"JPEG: unexpected marker FF{nxt:02X} in scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huffman(rdr: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | rdr.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("JPEG: invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    """Inverse of _encode_amplitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a single-component sequential baseline JPEG to an (h, w)
    int64 array.  Tables come from the stream's DQT/DHT segments; any
    unsupported shape (progressive, multi-component, subsampling, restart
    intervals) raises rather than mis-decoding."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    i, n = 2, len(payload)
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_q = dc_id = ac_id = 0
    scan_start = None
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[i + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ_FLAT] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT — build decode tables from the stream
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(body[j + 17 : j + 17 + nvals])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                j += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("JPEG: only single-component (grayscale) supported")
            if body[7] != 0x11:
                raise ValueError("JPEG: subsampling unsupported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("JPEG: only sequential baseline (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("JPEG: restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("JPEG: only single-component scans supported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan_start = i + 2 + seglen
            break
        i += 2 + seglen
    if scan_start is None or h is None:
        raise ValueError("JPEG: missing SOS/SOF0")

    # locate EOI: scan data runs to the next non-stuffed marker
    j = scan_start
    while j + 1 < n:
        if payload[j] == 0xFF and payload[j + 1] not in (0x00,):
            break
        j += 1
    rdr = _BitReader(payload[scan_start:j])
    qt = quant[comp_q]
    dc_tab, ac_tab = huff[(0, dc_id)], huff[(1, ac_id)]

    bh, bw = -(-h // 8), -(-w // 8)
    img = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            size = _decode_huffman(rdr, dc_tab)
            prev_dc += _extend(rdr.read_bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _decode_huffman(rdr, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, s = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("JPEG: AC run past block end")
                zz[k] = _extend(rdr.read_bits(s), s)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[_ZZ_FLAT] = zz * qt.reshape(-1)[_ZZ_FLAT]
            block = _C.T @ coef.reshape(8, 8) @ _C
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    out = np.clip(np.round(img + 128.0), 0, 255).astype(np.int64)
    return out[:h, :w]
