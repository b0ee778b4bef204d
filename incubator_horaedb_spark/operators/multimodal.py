"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference operator family (north star: LLM training-data pipelines).
Design for 100 TB:

- media lives in a ``binary`` column with a ``media_type`` discriminator and
  a metadata struct; rows stay row-group-aligned in parquet so scans that
  only touch metadata never read the bytes (column pruning);
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** transforms — the only sane shape for Python media codecs
  on Spark: one Python worker per partition, zero-copy Arrow transfer,
  bounded batch memory via ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- IMAGE dimensions are decoded for REAL: ``parse_image_header`` reads the
  PNG IHDR chunk and walks JPEG markers to SOF0/SOF2 in pure Python (the
  public file formats need no codec library for header metadata);
- full pixel decode and audio/video codecs (PIL/ffmpeg/torchaudio) are NOT
  in this container, so non-image payloads fall back to ``_fake_decode`` —
  a clearly marked deterministic stub keyed on the byte length.  The
  Spark-side plumbing (schema contract, batch iteration, partitioning) is
  real and tested; a deployment swaps ``_fake_decode`` for the codec and
  nothing else moves.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta_json", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL header-level image decoding, pure Python (no codec libs):
    (codec, width, height) from PNG IHDR or JPEG SOF0/1/2/3 markers;
    ``None`` when the payload is neither (caller falls back).

    PNG (public spec, RFC 2083): 8-byte signature, then the IHDR chunk is
    required first — width/height are the two big-endian u32 at bytes
    16..24.  JPEG (ITU T.81): SOI then marker segments, each FF xx + u16
    big-endian length (length includes itself); frame dimensions live in
    the SOFn segment as u16 height, u16 width at offset +5.  Standalone
    markers (RSTn, TEM) and padding FFs are skipped without a length."""
    import struct

    if payload[:8] == _PNG_MAGIC and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None  # not a marker where one is required: corrupt
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
                continue
            if marker in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF seen
                return None
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if seglen < 2:
                return None
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0..3 (baseline/progressive)
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seglen
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode — deterministic fake dimensions from the byte length,
    for payloads that are not header-parseable images (audio/video: the
    container has no codec libs).

    A real deployment replaces this with PIL/ffmpeg:
        raise NotImplementedError("install a codec and swap _fake_decode")
    The formulas are plain integer arithmetic so the correctness oracle can
    reproduce them in SQL.
    """
    n = len(payload)
    width = 64 + (n * 7919) % 1216
    height = 64 + (n * 104729) % 656
    n_frames = 1 + n % 30
    return n, width, height, n_frames


def _decode(payload: bytes) -> tuple[int, int, int, int]:
    """Header parse first (real), stub fallback (labeled fake)."""
    parsed = parse_image_header(payload)
    if parsed is not None:
        _, w, h = parsed
        return len(payload), w, h, 1
    return _fake_decode(payload)


def decode_media(df: DataFrame, media_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Decode metadata extraction over binary media via mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode(bytes(b)) if b is not None else (None, None, None, None)
                for b in pdf[media_col]
            ]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_nth: int = 10,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame index.

    With the stub decode, frame indices are derived from the fake frame
    count; a real kernel would emit decoded frame tensors per row."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                _, _, _, n_frames = _decode(bytes(b))
                rows.extend((int(mid), i) for i in range(0, n_frames, every_nth))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx"])

    return df.mapInPandas(kernel, schema=schema)


def synth_image_payload(media_id: int) -> bytes:
    """Deterministic minimal-but-REAL image payload for a media id: even
    ids get a PNG (signature + IHDR chunk), odd ids a JPEG (SOI + APP0 +
    COM + SOF0 + EOI — the COM segment forces the parser to walk markers).
    Dimensions are width = 16 + id % 1024, height = 16 + id % 512, so an
    SQL oracle can state the expected parse without seeing the bytes.
    Writer and parser are independent code paths (pack vs unpack), making
    the round-trip a genuine header-decoding check."""
    import struct

    w = 16 + media_id % 1024
    h = 16 + media_id % 512
    if media_id % 2 == 0:
        ihdr_data = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
        return (
            _PNG_MAGIC
            + struct.pack(">I", len(ihdr_data))
            + b"IHDR"
            + ihdr_data
            + b"\x00\x00\x00\x00"  # CRC not validated by header parsers
        )
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"spark"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def synthesize_image_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, media) frame of synthesized PNG/JPEG payloads — the
    fixture generator for environments with no image files (distributed:
    one builder call per row inside mapInPandas, no driver materialize)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {"media_id": ids, "media": [synth_image_payload(i) for i in ids]}
            )

    return df.mapInPandas(kernel, schema=schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the testdata: documents.text utf-8 bytes as a media
    payload (the container has no real image/audio fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.lit("image").alias("media_type"),
        F.to_json(F.struct("lang", "source")).alias("meta_json"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("out_w", T.LongType(), True),
        T.StructField("out_h", T.LongType(), True),
        T.StructField("est_bytes", T.LongType(), True),
    ]
)


def resize_media(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Aspect-preserving fit-in-box resize plumbing via mapInPandas.

    With the stub decode, output dimensions come from the fake (width,
    height); a real kernel would also emit the resized pixel buffer.  The
    scale math (double multiply + floor, clamped to >= 1) is reproduced by
    the oracle in SQL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                _, w, h, _ = _decode(bytes(b))
                scale = min(target_w / w, target_h / h)
                out_w = max(1, int(w * scale))
                out_h = max(1, int(h * scale))
                rows.append((int(mid), w, h, out_w, out_h, out_w * out_h * 3))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "out_w", "out_h", "est_bytes"]
            )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.LongType(), False),
        T.StructField("start_byte", T.LongType(), False),
        T.StructField("win_len", T.LongType(), False),
    ]
)


def audio_windows(
    df: DataFrame,
    win: int = 400,
    hop: int = 160,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio framing plumbing: one row per (overlapping) analysis window —
    the STFT/MFCC batch shape.  Windows start at k*hop while start < n;
    the last windows may be short (win_len = min(win, n-start)).  A real
    kernel computes features over payload[start:start+len]; the stub emits
    the framing only, which the oracle reproduces in SQL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                n = len(bytes(b))
                k = 0
                while k * hop < n:
                    start = k * hop
                    rows.append((int(mid), k, start, min(win, n - start)))
                    k += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "window_idx", "start_byte", "win_len"]
            )

    return df.mapInPandas(kernel, schema=AUDIO_WINDOW_SCHEMA)
