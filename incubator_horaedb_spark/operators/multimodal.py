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
- real codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
  decode kernel is STUBBED behind ``decode_media`` — a clearly marked
  deterministic fake keyed on the byte payload.  The Spark-side plumbing
  (schema contract, batch iteration, partitioning) is real and tested; a
  deployment swaps ``_fake_decode`` for the codec and nothing else moves.
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


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode — deterministic fake dimensions from the byte length.

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


def decode_media(df: DataFrame, media_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Decode metadata extraction over binary media via mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(bytes(b)) if b is not None else (None, None, None, None)
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
                _, _, _, n_frames = _fake_decode(bytes(b))
                rows.extend((int(mid), i) for i in range(0, n_frames, every_nth))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx"])

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
                _, w, h, _ = _fake_decode(bytes(b))
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
