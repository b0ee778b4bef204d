"""Multimodal operator queries: binary media decode + frame sampling over
the documents table (text bytes as payload — see operators/multimodal.py;
the decode kernel is a documented deterministic stub, the mapInPandas
plumbing is real).  Oracles reproduce the stub's integer math in SQL;
DuckDB ``strlen`` is byte length, matching Python ``len(bytes)``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_horaedb_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    frame_sample,
)
from incubator_horaedb_spark.querybank.registry import load, register


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT)                       AS n_bytes,
           CAST(64 + (strlen(text) * 7919) % 1216 AS BIGINT)  AS width,
           CAST(64 + (strlen(text) * 104729) % 656 AS BIGINT) AS height,
           CAST(1 + strlen(text) % 30 AS BIGINT)              AS n_frames
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load(spark, sf_dir, "documents"))
    return decode_media(media)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, CAST(f.i AS BIGINT) AS frame_idx
    FROM documents,
         LATERAL (SELECT unnest(range(0, 1 + strlen(text) % 30, 10)) AS i) f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load(spark, sf_dir, "documents"))
    return frame_sample(media, every_nth=10)
