"""Multimodal-column queries: binary payload metadata (oracle-checked) and
the pandas-UDF decode pipeline (rows-only: the decode runs in Python via
mapInPandas, which SQL cannot express)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.multimodal import (
    decode_images,
    sample_frames,
    with_binary_payload,
)
from sql_engine_spark.registry import register


@register(
    "multimodal_binary_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               md5(text)                                        AS content_md5,
               upper(substring(md5(text), 1, 8))                AS magic
        FROM documents
    """,
    doc="Binary-column metadata: byte length + content digest over the "
    "payload (text bytes stand in for media blobs).",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    return docs.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.upper(F.substring(F.md5("text"), 1, 8)).alias("magic"),
    )


@register(
    "multimodal_decode_features",
    oracle=None,  # mapInPandas decode is not SQL-expressible
    doc="Arrow-batched image-decode pipeline over binary payloads "
    "(deterministic fake decoder standing in for PIL — codecs absent in "
    "this container). Exercises the real mapInPandas plumbing: schema, "
    "batch iteration, column pruning to (id, payload).",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    return decode_images(docs, id_col="doc_id", binary_col="payload")


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id,
               CAST(idx AS INT) AS frame_idx,
               md5(text || '|' || CAST(idx AS VARCHAR)) AS frame_digest
        FROM (
            SELECT doc_id, text,
                   unnest(range(0,
                       greatest(1, octet_length(CAST(text AS BLOB)) // 16), 10)) AS idx
            FROM documents
        )
    """,
    doc="Video frame-sampling plumbing: one output row per sampled frame "
    "(stride 10 over a payload-derived frame count), via mapInPandas. "
    "The frame digest is SQL-expressible so even the stub is "
    "oracle-checked row-for-row.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    return sample_frames(docs, id_col="doc_id", binary_col="payload", every_n=10)
