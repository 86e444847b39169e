"""Multimodal column processing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a metadata struct; the
compute pattern is Arrow-batched `mapInPandas` so decode libraries see
whole batches, never per-row Python. The actual codecs (PIL/librosa/ffmpeg)
are NOT in this container, so the decode kernels are stubbed behind
`_decode_image_real` (raises NotImplementedError) with a deterministic
md5-based fake used instead — the Spark-side plumbing (schema, batching,
partition flow, UDF signatures) is real and tested.

At scale: binary payloads dominate partition size — repartition so
`rows_per_partition * avg_payload <= spark.sql.files.maxPartitionBytes`,
and select the binary column as late as possible (column pruning keeps it
out of earlier shuffles).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "features array<float>"
)


def _decode_image_real(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Real decoder would use PIL/torchvision here; not available in this
    environment."""
    raise NotImplementedError("image codecs not installed in this container")


def _decode_image_fake(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in: dimensions and an 8-dim feature vector
    derived from the payload digest (stable across runs/engines)."""
    d = hashlib.md5(payload).digest()
    width = 1 + d[0] % 64
    height = 1 + d[1] % 64
    channels = 1 + d[2] % 4
    features = [round(b / 255.0, 6) for b in d[3:11]]
    return width, height, channels, features


def decode_images(df: DataFrame, *, id_col: str, binary_col: str, use_fake: bool = True) -> DataFrame:
    """Arrow-batched decode of a binary column -> (dims, features).

    mapInPandas keeps the per-batch loop in pandas; only the needed
    columns cross the Arrow boundary.
    """
    decode = _decode_image_fake if use_fake else _decode_image_real
    id_name, bin_name = id_col, binary_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(bytes(p)) for p in pdf[bin_name]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "n_bytes": pdf[bin_name].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, DECODED_SCHEMA)


def sample_frames(df: DataFrame, *, id_col: str, binary_col: str, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per sampled
    'frame' (index stride over a fake frame count derived from payload
    size). Real implementation would demux with ffmpeg per batch."""
    out_schema = "doc_id long, frame_idx int, frame_digest string"
    id_name, bin_name = id_col, binary_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_digest": []}
            for i, payload in zip(pdf[id_name], pdf[bin_name]):
                payload = bytes(payload)
                n_frames = max(1, len(payload) // 16)
                for idx in range(0, n_frames, every_n):
                    rows["doc_id"].append(int(i))
                    rows["frame_idx"].append(idx)
                    # digest formula is SQL-expressible (md5 of payload
                    # bytes ++ '|' ++ decimal index) so the pipeline stays
                    # oracle-checkable
                    rows["frame_digest"].append(
                        hashlib.md5(payload + b"|" + str(idx).encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


RESIZED_SCHEMA = "doc_id long, width int, height int, resized_digest string"


def resize_images(
    df: DataFrame, *, id_col: str, binary_col: str, target: int = 32
) -> DataFrame:
    """Resize stub: clamps the fake-decoded dimensions to `target` and
    emits a digest of (payload, final dims). A real kernel would call
    PIL.Image.resize per batch — the Arrow/batch shape is identical."""

    id_name, bin_name = id_col, binary_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "width": [],
                "height": [],
                "resized_digest": [],
            }
            for i, payload in zip(pdf[id_name], pdf[bin_name]):
                payload = bytes(payload)
                w, h, _, _ = _decode_image_fake(payload)
                w2, h2 = min(w, target), min(h, target)
                out["doc_id"].append(int(i))
                out["width"].append(w2)
                out["height"].append(h2)
                out["resized_digest"].append(
                    hashlib.md5(payload + f"|{w2}x{h2}".encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_SCHEMA = "doc_id long, n_samples long, duration_s double, mfcc array<float>"


def extract_audio_features(
    df: DataFrame, *, id_col: str, binary_col: str, sample_rate: int = 16_000
) -> DataFrame:
    """Audio feature stub (librosa absent): sample count from payload
    length, duration at `sample_rate`, and an MFCC-shaped 4-dim vector
    from the digest — deterministic, batch-wise, Arrow-transported."""

    id_name, bin_name = id_col, binary_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "n_samples": [],
                "duration_s": [],
                "mfcc": [],
            }
            for i, payload in zip(pdf[id_name], pdf[bin_name]):
                payload = bytes(payload)
                d = hashlib.md5(payload).digest()
                n = len(payload) * 4  # fake: 4 samples per byte
                out["doc_id"].append(int(i))
                out["n_samples"].append(n)
                out["duration_s"].append(n / sample_rate)
                out["mfcc"].append([round(b / 255.0, 6) for b in d[:4]])
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(batches, AUDIO_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str, out: str = "payload") -> DataFrame:
    """Materialize a binary column from text (the testdata has no real
    media blobs; UTF-8 bytes stand in so the binary plumbing is exercised)."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))
