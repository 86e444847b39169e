"""Streaming-specific behavior tests.

Stream-batch parity for the registered streaming queries is covered by the
oracle gate (test_oracle_gate.py). Here we pin the behaviors only a live
stream exhibits: watermark-based late-data dropping and append-mode
finalization.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.streaming.windows import tumbling_agg

SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _ev(eid, ts, etype="A", value=1.0):
    import datetime

    return (eid, datetime.datetime.fromisoformat(ts), 1, etype, value, None)


@pytest.mark.streaming
def test_append_mode_late_data_after_restart(spark, tmp_path):
    """Watermark state survives a checkpoint restart, and a row arriving
    later than the recovered watermark cannot alter an already-finalized
    window (Spark only guarantees dropping once the watermark has been
    committed; within one pre-planned replay the drop is best-effort).
    Finalized windows are emitted exactly once; an open tail window is
    withheld in append mode."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    base = time.time() - 3600

    def write_chunk(rows, i):
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.mode("append").parquet(src)
        paths = [
            os.path.join(src, f) for f in os.listdir(src) if f.startswith("part-")
        ]
        newest = max(paths, key=os.path.getmtime)
        os.utime(newest, (base + i * 10, base + i * 10))

    def run_cycle():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            tumbling_agg(stream, minutes=5, watermark="10 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # cycle 1: watermark ends at 10:50; window [10:00, 10:05) finalizes n=2
    write_chunk([_ev(1, "2024-01-01T10:00:00"), _ev(2, "2024-01-01T10:01:00")], 0)
    write_chunk([_ev(4, "2024-01-01T11:00:00", "B")], 1)
    run_cycle()
    # cycle 2: a 10:02 row is 48 min behind the recovered watermark ->
    # dropped; 12:00 advances the watermark so [11:00, 11:05) finalizes
    write_chunk([_ev(5, "2024-01-01T10:02:00"), _ev(6, "2024-01-01T12:00:00", "B")], 2)
    run_cycle()

    rows = spark.read.parquet(sink).select("event_type", "window_start", "n").collect()
    got = sorted((r.event_type, str(r.window_start), r.n) for r in rows)
    assert got == [
        ("A", "2024-01-01 10:00:00", 2),
        ("B", "2024-01-01 11:00:00", 1),
    ], got


@pytest.mark.streaming
def test_replay_is_time_ordered(spark, sf_dir):
    """events_replay_chunks must replay chunks in time order (mtime-stamped
    files), otherwise cross-batch state sees artificial disorder."""
    from sql_engine_spark.streaming.source import events_replay_chunks

    out_dir, _ = events_replay_chunks(spark, sf_dir, 3)
    parts = sorted(
        f for f in os.listdir(out_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    mtimes = [os.path.getmtime(os.path.join(out_dir, p)) for p in parts]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # part files partition the time range: max(ts) of part i < min(ts) of part i+1
    bounds = []
    for p in parts:
        df = spark.read.parquet(os.path.join(out_dir, p))
        lo, hi = df.agg(F.min("ts"), F.max("ts")).collect()[0]
        bounds.append((lo, hi))
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """Exactly-once into parquet: a second run over the SAME source with a
    FRESH checkpoint replays every batch — dynamic partition overwrite by
    batch id must leave row counts unchanged (no append duplicates)."""
    from sql_engine_spark.io import load
    from sql_engine_spark.streaming.sinks import stream_to_parquet_idempotent
    from sql_engine_spark.streaming.source import events_replay_chunks

    out = str(tmp_path / "sink_out")
    src_dir, stream = events_replay_chunks(spark, sf_dir, 3, str(tmp_path / "replay"))
    expected = load(spark, sf_dir, "events").count()

    q = stream_to_parquet_idempotent(
        stream.select("event_id", "user_id", "ts"), out, str(tmp_path / "ck1")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == expected

    # Simulate a full replay (lost checkpoint): same batches, same ids.
    schema = load(spark, sf_dir, "events").schema
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src_dir)
    )
    q2 = stream_to_parquet_idempotent(
        stream2.select("event_id", "user_id", "ts"), out, str(tmp_path / "ck2")
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after = spark.read.parquet(out)
    assert after.count() == expected
    assert after.select("event_id").distinct().count() == expected
