"""Pure-numpy baseline JPEG codec (operators/jpeg.py): round-trip
properties that drive the AC/run-length Huffman paths the gated
block-constant corpus cannot, plus self-description and error handling.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators.jpeg import (
    _ZZ_FLAT,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def test_zigzag_is_the_standard_order():
    # first 16 flat indices of the T.81 zigzag (public spec, Figure A.6)
    assert list(_ZZ_FLAT[:16]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(_ZZ_FLAT) == list(range(64))


def test_block_constant_roundtrip_is_exact():
    rng = np.random.default_rng(1)
    for _ in range(5):
        bh, bw = int(rng.integers(1, 6)), int(rng.integers(1, 7))
        blocks = rng.integers(0, 256, size=(bh, bw))
        px = np.kron(blocks, np.ones((8, 8), dtype=int)).astype(np.uint8)
        assert np.array_equal(decode_baseline_jpeg(encode_baseline_jpeg(px)), px)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=48),
    w=st.integers(min_value=1, max_value=48),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_arbitrary_roundtrip_near_lossless(h, w, seed):
    # arbitrary pixels exercise DC deltas, AC run-lengths, ZRL and EOB for
    # real; with the all-ones quant table the only loss is coefficient
    # rounding, bounded to ±1 per pixel (and non-multiple-of-8 dims
    # exercise edge-block padding + crop)
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(px))
    assert dec.shape == (h, w)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 1


def test_gradient_and_structured_content():
    # smooth + structured content (long zero runs -> ZRL/EOB heavy)
    y, x = np.mgrid[0:32, 0:40]
    for px in (
        ((x * 255) // 39).astype(np.uint8),
        ((x // 8 * 8 + y // 8 * 8) % 256).astype(np.uint8),
        np.where((x // 4 + y // 4) % 2 == 0, 230, 20).astype(np.uint8),
    ):
        dec = decode_baseline_jpeg(encode_baseline_jpeg(px))
        assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 1


def test_decoder_reads_tables_from_stream():
    # corrupting the DHT in the byte stream must change/break decoding —
    # i.e., the decoder really uses the stream's tables, not constants
    px = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
    enc = bytearray(encode_baseline_jpeg(px))
    i = enc.index(b"\xff\xc4")  # DHT marker
    enc[i + 5] ^= 0x07  # mangle the BITS table
    with pytest.raises(Exception):
        got = decode_baseline_jpeg(bytes(enc))
        assert not np.array_equal(got, px)  # or it decodes to garbage


def test_unsupported_shapes_raise():
    px = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(encode_baseline_jpeg(px))
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"\x00\x00" + bytes(enc))
    i = enc.index(b"\xff\xc0")
    prog = enc.copy()
    prog[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_baseline_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="truncated|Huffman|marker"):
        decode_baseline_jpeg(bytes(enc[:-8]))


def test_synth_payload_header_parses():
    from incubator_horaedb_spark.operators.multimodal import (
        parse_image_header,
        synth_jpeg_full_payload,
    )

    for mid in (0, 1, 17, 123):
        payload = synth_jpeg_full_payload(mid)
        codec, w, h = parse_image_header(payload)
        assert codec == "jpeg"
        assert w == (2 + mid % 6) * 8 and h == (2 + mid % 5) * 8


# --- MJPEG-in-AVI demux (video frame decode) --------------------------------


def test_avi_demux_and_frame_decode():
    from incubator_horaedb_spark.operators.multimodal import (
        parse_avi_mjpeg_frames,
        synth_avi_mjpeg_payload,
    )

    for mid in (0, 3, 42):
        payload = synth_avi_mjpeg_payload(mid)
        frames = parse_avi_mjpeg_frames(payload)
        assert len(frames) == 2 + mid % 4
        for f, fr in enumerate(frames):
            px = decode_baseline_jpeg(fr)
            assert px.shape == ((2 + mid % 2) * 8, (2 + mid % 3) * 8)
            # frame content differs frame-to-frame (f*101 term)
            if f:
                prev = decode_baseline_jpeg(frames[f - 1])
                assert not np.array_equal(px, prev)


def test_avi_demux_rejects_non_avi():
    from incubator_horaedb_spark.operators.multimodal import (
        parse_avi_mjpeg_frames,
        synth_wav_payload,
    )

    assert parse_avi_mjpeg_frames(b"not a container") == []
    assert parse_avi_mjpeg_frames(synth_wav_payload(7)) == []  # RIFF but WAVE
