"""parse_image_header: real PNG/JPEG header decoding (pure Python).

Fixtures are hand-assembled per the public specs (PNG RFC 2083 §3.1,
JPEG ITU T.81 §B.2) — independent of the synth_image_payload writer.
"""

from __future__ import annotations

import struct

from incubator_horaedb_spark.operators.multimodal import (
    _decode,
    parse_image_header,
    synth_image_payload,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\xde\xad\xbe\xef"
    )


def _jpeg(w: int, h: int, progressive: bool = False, prefix_segments: bytes = b"") -> bytes:
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = sof_marker + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    return b"\xff\xd8" + prefix_segments + sof + b"\xff\xd9"


def test_png_ihdr():
    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_png(1, 1)) == ("png", 1, 1)


def test_jpeg_sof0_and_progressive():
    assert parse_image_header(_jpeg(320, 200)) == ("jpeg", 320, 200)
    assert parse_image_header(_jpeg(320, 200, progressive=True)) == ("jpeg", 320, 200)


def test_jpeg_walks_preceding_segments():
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    assert parse_image_header(_jpeg(12, 34, prefix_segments=app0 + com)) == ("jpeg", 12, 34)


def test_non_image_and_corrupt_fall_through():
    assert parse_image_header(b"plain utf-8 text payload") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\nXXXXIDAT") is None  # no IHDR first
    assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00") is None  # corrupt marker
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
    # truncated SOF segment
    assert parse_image_header(b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + b"\x08") is None


def test_decode_prefers_real_header_over_stub():
    n, w, h, frames = _decode(_png(99, 77))
    assert (w, h, frames) == (99, 77, 1)
    # non-image payloads keep the deterministic stub formulas
    payload = b"x" * 10
    n, w, h, frames = _decode(payload)
    assert n == 10 and w == 64 + (10 * 7919) % 1216


def test_synth_payload_roundtrip_and_sizes():
    for mid in (0, 1, 2, 3, 1023, 1024, 77777):
        got = parse_image_header(synth_image_payload(mid))
        codec = "png" if mid % 2 == 0 else "jpeg"
        assert got == (codec, 16 + mid % 1024, 16 + mid % 512), mid
    assert len(synth_image_payload(0)) == 33  # oracle n_bytes contract
    assert len(synth_image_payload(1)) == 50


def test_parsers_never_crash_on_arbitrary_bytes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from incubator_horaedb_spark.operators.multimodal import (
        parse_mp4_header,
        parse_wav_header,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=256))
    def _fuzz(payload):
        # parsers must return a tuple or None — never raise, never hang —
        # on arbitrary bytes (these run inside executor-side kernels where
        # an exception kills the task)
        for parse in (parse_image_header, parse_wav_header, parse_mp4_header):
            r = parse(payload)
            assert r is None or isinstance(r, tuple)

    _fuzz()

    # adversarial prefixes: valid magics with garbage bodies
    for parse, magic in (
        (parse_image_header, b"\x89PNG\r\n\x1a\n"),
        (parse_image_header, b"\xff\xd8"),
        (parse_wav_header, b"RIFF\xff\xff\xff\xffWAVE"),
        (parse_mp4_header, b"\x00\x00\x00\x10ftyp"),
    ):
        for tail in (b"", b"\x00", b"\xff" * 32, bytes(range(64))):
            r = parse(magic + tail)
            assert r is None or isinstance(r, tuple)


def test_wav_header_roundtrip():
    from incubator_horaedb_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav_payload,
    )

    for mid in (0, 1, 4, 5, 399, 401, 12345):
        got = parse_wav_header(synth_wav_payload(mid))
        assert got == (1 + mid % 2, 8000 + (mid % 5) * 4000, 100 + mid % 400), mid
    assert parse_wav_header(b"RIFFxxxxNOPE") is None
    assert parse_wav_header(b"plain text") is None
    # fmt-only (no data chunk) is incomplete
    incomplete = synth_wav_payload(0)
    assert parse_wav_header(incomplete[:40]) is None


def test_mp4_header_roundtrip():
    from incubator_horaedb_spark.operators.multimodal import (
        parse_mp4_header,
        synth_mp4_payload,
    )

    for mid in (0, 1, 639, 640, 98765):
        got = parse_mp4_header(synth_mp4_payload(mid))
        assert got == (16 + mid % 640, 16 + mid % 360), mid
    assert len(synth_mp4_payload(7)) == 132  # oracle n_bytes contract
    assert parse_mp4_header(b"\x00\x00\x00\x08ftyp") is None  # no moov
    assert parse_mp4_header(b"not a box at all") is None
    # _decode prefers the real MP4 dims over the stub
    n, w, h, frames = _decode(synth_mp4_payload(100))
    assert (w, h, frames) == (116, 116, 1)
