"""Streaming crash-recovery INTEGRATION test (r9 verdict #7): a real
foreachBatch stream maintaining an IdempotentMatView is hard-killed
mid-commit (between the view's two renames — the worst crash point),
then restarted from the SAME Spark checkpoint. Recovery must roll the
view forward, the checkpoint must redeliver the in-flight batch, the
view's applied-batch dedup must drop the redelivery, and the drained
view must equal the batch oracle exactly.

The matview unit pins (tests/test_r5/r6/r7_fixes.py) cover each rename
permutation in isolation; this test drives the whole chain through an
actual StreamingQuery kill-and-restart, which none of them did."""

from __future__ import annotations

import os
from unittest import mock

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.streaming.matview import IdempotentMatView
from sql_engine_spark.streaming.source import table_replay_chunks

N_CHUNKS = 5
CRASH_BATCH = 2


def _partial(batch_df):
    return batch_df.groupBy("user_id").agg(
        F.count("*").cast("long").alias("cnt")
    )


def _combine(cur, partial):
    return (
        cur.unionByName(partial)
        .groupBy("user_id")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _start(spark, replay_dir, schema, mv, checkpoint):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: mv.merge(df, bid))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


@pytest.mark.streaming
def test_kill_between_renames_then_restart_equals_batch_oracle(
    spark, sf_dir, tmp_path
):
    replay_dir, _ = table_replay_chunks(
        spark, sf_dir, "events", ["ts", "event_id"], N_CHUNKS,
        out_dir=str(tmp_path / "replay"),
    )
    schema = load(spark, sf_dir, "events").schema
    view_dir = str(tmp_path / "view")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(view_dir, exist_ok=True)

    mv = IdempotentMatView(view_dir, partial_of=_partial, combine=_combine)
    target = mv.target

    # Inject the crash at the WORST point of batch CRASH_BATCH's commit:
    # after `current` was renamed away to `current.old`, before the
    # fully-written swap_<id> (marker included) was renamed in. On disk:
    # no `current`, a complete swap, a stale `.old` — exactly the state
    # _recover() must roll FORWARD from.
    real_rename = os.rename

    def crashy_rename(src, dst):
        if os.path.basename(src) == f"swap_{CRASH_BATCH}" and dst == target:
            raise RuntimeError("injected crash between commit renames")
        return real_rename(src, dst)

    with mock.patch("os.rename", side_effect=crashy_rename):
        q = _start(spark, replay_dir, schema, mv, checkpoint)
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises(StreamingQueryException):
            q.awaitTermination()

    # Crash state on disk is as constructed: view headless, swap complete.
    assert not os.path.isdir(target)
    assert os.path.isdir(os.path.join(view_dir, f"swap_{CRASH_BATCH}"))
    assert os.path.isdir(target + ".old")

    # "Restart the process": a fresh matview over the same directory
    # (recovery runs in __init__) + a fresh query on the SAME checkpoint.
    # foreachBatch never returned for batch 2, so the checkpoint
    # redelivers it; the rolled-forward marker says it IS applied, so the
    # dedup must drop the redelivery instead of double-counting it.
    mv2 = IdempotentMatView(view_dir, partial_of=_partial, combine=_combine)
    assert mv2.last_applied() == CRASH_BATCH
    assert not os.path.isdir(target + ".old")  # recovery swept the stale roll-back dir

    q2 = _start(spark, replay_dir, schema, mv2, checkpoint)
    q2.awaitTermination()

    got = {
        r.user_id: r.cnt
        for r in spark.read.parquet(target).collect()
    }
    expected = {
        r.user_id: r.cnt
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    assert got == expected
    assert mv2.last_applied() == N_CHUNKS - 1


@pytest.mark.streaming
def test_kill_before_marker_then_restart_refolds_batch(spark, sf_dir, tmp_path):
    """Crash BEFORE the swap's marker is written (mid parquet write, the
    other failure class): the incomplete swap must be ignored, the view
    rolls BACK to the pre-batch state, and the restarted stream re-folds
    the batch (at-least-once delivery actually applying this time)."""
    replay_dir, _ = table_replay_chunks(
        spark, sf_dir, "events", ["ts", "event_id"], N_CHUNKS,
        out_dir=str(tmp_path / "replay"),
    )
    schema = load(spark, sf_dir, "events").schema
    view_dir = str(tmp_path / "view")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(view_dir, exist_ok=True)

    mv = IdempotentMatView(view_dir, partial_of=_partial, combine=_combine)

    real_open = open

    def crashy_open(path, *a, **kw):
        if (
            isinstance(path, str)
            and path.endswith("_applied_batch")
            and f"swap_{CRASH_BATCH}" in path
            and a
            and a[0] == "w"
        ):
            raise RuntimeError("injected crash before marker write")
        return real_open(path, *a, **kw)

    with mock.patch(
        "sql_engine_spark.streaming.matview.open", side_effect=crashy_open
    ):
        q = _start(spark, replay_dir, schema, mv, checkpoint)
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises(StreamingQueryException):
            q.awaitTermination()

    # The swap has no marker -> not a roll-forward candidate; the view
    # itself was never renamed away, so last_applied is the prior batch.
    mv2 = IdempotentMatView(view_dir, partial_of=_partial, combine=_combine)
    assert mv2.last_applied() == CRASH_BATCH - 1

    q2 = _start(spark, replay_dir, schema, mv2, checkpoint)
    q2.awaitTermination()

    got = {r.user_id: r.cnt for r in mv2.read(spark).collect()}
    expected = {
        r.user_id: r.cnt
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    assert got == expected
    assert mv2.last_applied() == N_CHUNKS - 1
