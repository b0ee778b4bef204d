"""H.264 Baseline I-frame DC-only codec (operators/h264.py): round-trip
exactness for MB-constant planes, emulation-prevention inverse, subset
rejection paths, and the synthesized-payload closed form."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators.h264 import (
    _ebsp,
    _unescape,
    decode_h264_iframe,
    encode_h264_iframe,
)

_planes = st.tuples(
    st.integers(min_value=1, max_value=6),  # mb_w
    st.integers(min_value=1, max_value=4),  # mb_h
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)


@settings(max_examples=60, deadline=None)
@given(_planes)
def test_roundtrip_mb_constant_exact(p):
    mb_w, mb_h, seed = p
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(mb_h, mb_w))
    plane = np.repeat(np.repeat(vals, 16, 0), 16, 1).astype(np.uint8)
    out = decode_h264_iframe(encode_h264_iframe(plane))
    assert out.dtype == np.uint8
    assert np.array_equal(out, plane)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_emulation_prevention_inverse(data):
    assert _unescape(_ebsp(data)) == data
    # escaped stream never contains a start-code-like 00 00 0x run
    esc = _ebsp(data)
    for i in range(len(esc) - 2):
        assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2)


def test_non_mb_multiple_rejected():
    with pytest.raises(ValueError):
        encode_h264_iframe(np.zeros((17, 16), dtype=np.uint8))


def test_truncated_stream_rejected():
    plane = np.full((16, 16), 77, dtype=np.uint8)
    stream = encode_h264_iframe(plane)
    with pytest.raises(Exception):
        decode_h264_iframe(stream[:10])


def test_gradient_plane_decodes_to_mb_means():
    """Non-constant MBs: the DC-only subset reconstructs each MB as its
    (rounded) mean — the documented lossy boundary."""
    x = np.arange(32)[None, :].repeat(16, 0)
    plane = (x * 8).astype(np.uint8)  # two MBs: means 60 and 188
    out = decode_h264_iframe(encode_h264_iframe(plane))
    assert out.shape == plane.shape
    got = out[::16, ::16].astype(int).ravel().tolist()
    want = [int(round(plane[:, :16].mean())), int(round(plane[:, 16:].mean()))]
    assert got == want


def test_synth_payload_closed_form():
    from incubator_horaedb_spark.operators.multimodal import synth_h264_payload

    for mid in (0, 1, 17, 123):
        px = decode_h264_iframe(synth_h264_payload(mid))
        bw, bh = 1 + mid % 4, 1 + mid % 3
        assert px.shape == (bh * 16, bw * 16)
        want = sum(
            256 * ((mid * 7 + x * 31 + y * 53) % 256)
            for x in range(bw)
            for y in range(bh)
        )
        assert int(px.sum()) == want
