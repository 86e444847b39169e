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


# Hex-pair -> byte value, pure SQL (DuckDB has no blob indexing).
def _sql_byte(h: str, i: int) -> str:
    c1 = f"substring({h}, {2 * i + 1}, 1)"
    c2 = f"substring({h}, {2 * i + 2}, 1)"
    hexpos = "strpos('0123456789abcdef', {c}) - 1"
    return f"(16 * ({hexpos.format(c=c1)}) + ({hexpos.format(c=c2)}))"


def _decode_oracle() -> str:
    """The fake decoder derives everything from md5(payload), so DuckDB can
    reproduce it byte-for-byte from the hex digest: width/height/channels
    from bytes 0-2, an 8-dim feature vector from bytes 3-10 (each b/255
    rounded to 6 places, emitted element-wise as FLOAT columns so no
    float-formatting string comparison is involved)."""
    feats = ",\n               ".join(
        f"CAST(round({_sql_byte('h', 3 + i)} / 255.0, 6) AS FLOAT) AS f{i}"
        for i in range(8)
    )
    return f"""
        WITH d AS (
            SELECT doc_id, md5(text) AS h,
                   CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
            FROM documents
        )
        SELECT doc_id, n_bytes,
               CAST(1 + {_sql_byte('h', 0)} % 64 AS INT) AS width,
               CAST(1 + {_sql_byte('h', 1)} % 64 AS INT) AS height,
               CAST(1 + {_sql_byte('h', 2)} % 4 AS INT)  AS channels,
               {feats}
        FROM d
    """


@register(
    "multimodal_decode_features",
    oracle=_decode_oracle(),
    doc="Arrow-batched image-decode pipeline over binary payloads "
    "(deterministic fake decoder standing in for PIL — codecs absent in "
    "this container). Exercises the real mapInPandas plumbing: schema, "
    "batch iteration, column pruning to (id, payload). The 8-dim feature "
    "vector is projected element-wise to FLOAT columns so the driver "
    "harness can hash it, and the digest-derived formulas are "
    "SQL-expressible for a row-for-row oracle check.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    decoded = decode_images(docs, id_col="doc_id", binary_col="payload")
    return decoded.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "channels",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


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


@register(
    "multimodal_resize",
    oracle=f"""
        WITH d AS (SELECT doc_id, text, md5(text) AS h FROM documents),
        dims AS (
            SELECT doc_id, text,
                   least(1 + {_sql_byte('h', 0)} % 64, 32) AS width,
                   least(1 + {_sql_byte('h', 1)} % 64, 32) AS height
            FROM d
        )
        SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
               md5(text || '|' || CAST(width AS VARCHAR) || 'x'
                        || CAST(height AS VARCHAR)) AS resized_digest
        FROM dims
    """,
    doc="Image-resize plumbing (mapInPandas, PIL absent so dims come from "
    "the deterministic fake decoder): clamp decoded dims to 32 and digest "
    "(payload, final dims). The dimension/digest formulas are "
    "SQL-expressible, so the batch pipeline is oracle-checked "
    "row-for-row.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.multimodal import resize_images

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    return resize_images(docs, id_col="doc_id", binary_col="payload", target=32)


@register(
    "multimodal_audio_features",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, md5(text) AS h,
                   CAST(octet_length(CAST(text AS BLOB)) * 4 AS BIGINT) AS n_samples
            FROM documents
        )
        SELECT doc_id, n_samples,
               n_samples / 16000.0 AS duration_s,
               CAST(round({_sql_byte('h', 0)} / 255.0, 6) AS FLOAT) AS mfcc_0,
               CAST(round({_sql_byte('h', 1)} / 255.0, 6) AS FLOAT) AS mfcc_1,
               CAST(round({_sql_byte('h', 2)} / 255.0, 6) AS FLOAT) AS mfcc_2,
               CAST(round({_sql_byte('h', 3)} / 255.0, 6) AS FLOAT) AS mfcc_3
        FROM d
    """,
    doc="Audio feature plumbing (librosa absent; digest-derived MFCC "
    "stand-in): sample count from payload bytes, duration at 16 kHz, "
    "4-dim feature vector — Arrow-batched mapInPandas with the formulas "
    "SQL-expressible for a row-for-row oracle check. The vector is "
    "projected element-wise to FLOAT columns so the driver harness can "
    "hash it.",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.multimodal import extract_audio_features

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    feats = extract_audio_features(docs, id_col="doc_id", binary_col="payload")
    return feats.select(
        "doc_id",
        "n_samples",
        "duration_s",
        *[F.col("mfcc")[i].alias(f"mfcc_{i}") for i in range(4)],
    )


@register(
    "multimodal_dedup_exact",
    oracle="""
        SELECT MIN(doc_id) AS rep_id,
               COUNT(*) AS n_copies,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        FROM documents
        GROUP BY md5(text), octet_length(CAST(text AS BLOB))
    """,
    doc="Exact dedup over BINARY payloads: group on (content digest, "
    "byte length) — the size column makes digest collisions harmless "
    "and lets the scan skip by size stats — keep the min id per group. "
    "One map-side-combined hash aggregate computed from the binary "
    "column directly (md5 accepts binary in both engines); the standard "
    "first pass over an image/audio lake before any decode work.",
)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    return (
        docs.groupBy(
            F.md5("payload").alias("__h"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        )
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("rep_id", "n_copies", "n_bytes")
    )


@register(
    "multimodal_frame_dedup",
    oracle="""
        WITH fr AS (
            SELECT doc_id,
                   md5(text || '|' || CAST(idx AS VARCHAR)) AS frame_digest
            FROM (
                SELECT doc_id, text,
                       unnest(range(0,
                           greatest(1, octet_length(CAST(text AS BLOB)) // 16), 10)) AS idx
                FROM documents
            )
        )
        SELECT frame_digest,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               MIN(doc_id) AS rep_doc_id
        FROM fr
        GROUP BY frame_digest
    """,
    doc="Frame-level dedup index ACROSS videos: sampled-frame digests "
    "grouped corpus-wide into one row per distinct frame with its copy "
    "count and min-id representative — the multimodal analogue of "
    "exact text dedup (the dedup table a downstream decode pass joins "
    "to skip repeated stills), composed from the frame-sampling stream "
    "plus one map-side-combinable hash aggregate. This synthetic "
    "corpus has no duplicate payloads, so counts are 1 here; the "
    "collapse behavior is pinned with planted duplicates in "
    "tests/test_multimodal.py.",
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.multimodal import sample_frames

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    frames = sample_frames(docs, id_col="doc_id", binary_col="payload", every_n=10)
    return frames.groupBy("frame_digest").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("doc_id").alias("rep_doc_id"),
    )
