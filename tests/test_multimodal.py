"""Multimodal plumbing: schemas, Arrow batching, column pruning to
(id, payload) — plus the REAL decode legs, which run in this container
through stdlib 24-bit-BMP and PCM-WAV fallbacks (Pillow/soundfile are
used instead when installed; the kernels are bit-identical for those
formats by construction, so both environments assert the same values)."""

from __future__ import annotations

import pytest

from sql_engine_spark.io import load
from sql_engine_spark.operators.multimodal import (
    decode_images,
    extract_audio_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from sql_engine_spark.plans.audit import audit


def _docs(spark, sf_dir):
    return with_binary_payload(load(spark, sf_dir, "documents"), "text")


def test_decode_schema_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = decode_images(docs, id_col="doc_id", binary_col="payload")
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "channels", "features",
    ]
    a = sorted(map(tuple, out.limit(50).collect()))
    b = sorted(map(tuple, decode_images(docs, id_col="doc_id", binary_col="payload").limit(50).collect()))
    assert a == b
    row = out.first()
    assert 1 <= row.width <= 64 and len(row.features) == 8


def test_decode_prunes_to_needed_columns(spark, sf_dir):
    out = decode_images(_docs(spark, sf_dir), id_col="doc_id", binary_col="payload")
    # only doc_id and text (payload source) may be read from parquet
    assert audit(out).reads_only("doc_id", "text")


def test_resize_clamps_dims(spark, sf_dir):
    out = resize_images(_docs(spark, sf_dir), id_col="doc_id", binary_col="payload", target=16)
    rows = out.limit(100).collect()
    assert rows and all(r.width <= 16 and r.height <= 16 for r in rows)


def test_audio_features_shape(spark, sf_dir):
    out = extract_audio_features(_docs(spark, sf_dir), id_col="doc_id", binary_col="payload")
    r = out.first()
    assert r.n_samples > 0 and abs(r.duration_s - r.n_samples / 16000) < 1e-9
    assert len(r.mfcc) == 4


def test_frame_sample_stride(spark, sf_dir):
    out = sample_frames(_docs(spark, sf_dir), id_col="doc_id", binary_col="payload", every_n=10)
    rows = out.where("doc_id = 1").collect()
    idxs = sorted(r.frame_idx for r in rows)
    assert idxs == list(range(0, 10 * len(idxs), 10))


def test_real_codec_feature_detection():
    """Without the libs, the real kernels must fail loudly (clear install
    hint), never silently fall back; flags mirror availability."""
    import pytest

    from sql_engine_spark.operators import multimodal as mm

    if not mm.HAS_PIL:
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm._decode_image_real(b"\x89PNG")
    if not mm.HAS_SOUNDFILE:
        with pytest.raises(NotImplementedError, match="soundfile"):
            mm._decode_audio_real(b"RIFF", 16000)


def _bmp24(width: int, height: int, pixel_fn) -> bytes:
    """Stdlib-built uncompressed 24-bit BMP (bottom-up rows, 4-byte row
    padding). pixel_fn(x, y) -> (r, g, b) with y=0 the TOP row."""
    import struct

    row_pad = (-(width * 3)) % 4
    rows = []
    for yy in range(height - 1, -1, -1):  # file stores bottom-up
        row = bytearray()
        for xx in range(width):
            r, g, b = pixel_fn(xx, yy)
            row += bytes([b, g, r])
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    data = b"".join(rows)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return hdr + info + data


@pytest.mark.realcodec
def test_real_image_decode_bmp(spark):
    """The REAL image leg runs in this container via the stdlib 24-bit
    BMP fallback (Pillow used instead when installed — same results:
    identical integer luma kernel). Solid RGB(200,100,50) has luma
    (19595*200 + 38470*100 + 7471*50 + 0x8000) >> 16 = 124 -> bin 3."""
    from sql_engine_spark.operators.multimodal import decode_images

    payload = _bmp24(20, 10, lambda x, y: (200, 100, 50))
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = decode_images(
        df, id_col="doc_id", binary_col="payload", use_fake=False
    ).first()
    assert (row.width, row.height, row.channels) == (20, 10, 3)
    assert len(row.features) == 8 and abs(sum(row.features) - 1.0) < 1e-3
    assert row.features[3] == pytest.approx(1.0)


@pytest.mark.realcodec
def test_real_image_decode_bmp_gradient_histogram(spark):
    """Gradient BMP: the decoded 8-bin histogram must equal an
    independent per-pixel recompute with PIL's integer luma formula."""
    from sql_engine_spark.operators.multimodal import decode_images

    def px(x, y):
        return ((x * 13) % 256, (y * 29) % 256, ((x + y) * 7) % 256)

    w, h = 33, 17  # odd width exercises row padding
    payload = _bmp24(w, h, px)
    bins = [0] * 8
    for yy in range(h):
        for xx in range(w):
            r, g, b = px(xx, yy)
            luma = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
            bins[luma // 32] += 1
    expected = [round(c / (w * h), 6) for c in bins]
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = decode_images(
        df, id_col="doc_id", binary_col="payload", use_fake=False
    ).first()
    assert list(row.features) == pytest.approx(expected, abs=2e-6)


def _wav_pcm16(sr: int, n: int) -> bytes:
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(20000 * math.sin(2 * math.pi * 440 * i / sr))
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


@pytest.mark.realcodec
def test_real_audio_decode_wav(spark):
    """The REAL audio leg runs in this container via the stdlib `wave`
    PCM fallback (soundfile used instead when installed — identical
    int16/32768 normalization): a stdlib-built PCM WAV comes back with
    its true sample count, duration, and band energies through the same
    mapInPandas plumbing."""
    import math

    from sql_engine_spark.operators.multimodal import extract_audio_features

    sr, n = 16_000, 800  # 50 ms of a 440 Hz tone
    df = spark.createDataFrame(
        [(1, bytearray(_wav_pcm16(sr, n)))], "doc_id long, payload binary"
    )
    row = extract_audio_features(
        df, id_col="doc_id", binary_col="payload", sample_rate=sr, use_fake=False
    ).first()
    assert row.n_samples == n
    assert abs(row.duration_s - n / sr) < 1e-9
    assert len(row.mfcc) == 4
    # independent recompute of the 4 band energies
    samples = [
        int(20000 * math.sin(2 * math.pi * 440 * i / sr)) / 32768.0
        for i in range(n)
    ]
    q = n // 4
    exp = [
        round(sum(abs(s) for s in samples[j * q : (j + 1) * q]) / q, 6)
        for j in range(4)
    ]
    assert list(row.mfcc) == pytest.approx(exp, abs=2e-6)


def test_frame_dedup_collapses_planted_duplicate_payloads(spark):
    """Identical payloads in different docs must collapse to one frame
    row per sampled index with n_copies=2 and the min doc id as rep."""
    from pyspark.sql import functions as F

    from sql_engine_spark.operators.multimodal import sample_frames

    payload = bytearray(b"0123456789abcdef" * 25)  # 400 bytes -> 25 frames, 3 sampled
    other = bytearray(b"fedcba9876543210" * 25)
    df = spark.createDataFrame(
        [(7, payload), (3, payload), (9, other)], "doc_id long, payload binary"
    )
    frames = sample_frames(df, id_col="doc_id", binary_col="payload", every_n=10)
    idx = (
        frames.groupBy("frame_digest")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .collect()
    )
    dups = [r for r in idx if r.n_copies == 2]
    singles = [r for r in idx if r.n_copies == 1]
    assert len(dups) == 3 and all(r.rep_doc_id == 3 for r in dups)
    assert len(singles) == 3 and all(r.rep_doc_id == 9 for r in singles)
