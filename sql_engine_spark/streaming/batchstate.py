"""JVM-only custom-state streaming over foreachBatch: bounded per-key
state maintained through the IdempotentMatView commit protocol, with
per-batch output committed exactly-once by batch id.

Why this exists (guide §4.1 — eliminate the Python boundary): the
applyInPandasWithState twins pay the pandas-state API's Arrow round
trip for every row and a Python invocation per (group, batch). The
measured floor (scripts/pandas_state_floor.py) prices an IDENTITY
pandas-state op at ~7x the pure-JVM state path on the same replay —
the API, not the state logic, is the wall. Where the per-event state
transition is expressible as JVM expressions (the EWMA halving fold,
a running max-by struct), this runner keeps the same incremental
semantics — bounded per-key state, exactly-once under foreachBatch
retries and batch replays against the SAME out/state directories (the
crash tests restart a handler over the committed dirs; the registered
queries use fresh dirs per invocation, so for them the guarantee is
within-run retry idempotence — the stream itself runs on a
non-recoverable temp checkpoint) — with zero Python in the row path.

Per micro-batch the runner calls

    step(state_df_or_none, batch_df) -> (out_df, new_state_df)
    # or -> (out_df, new_state_df, persisted_frames)

and commits the two results in a fixed order:

1. `out_df` is written under out/batch_<id>/ via write-to-tmp + rename.
   A replayed batch finds the committed directory (its `_SUCCESS`
   marker) and skips the write.
2. `new_state_df` replaces the state view through IdempotentMatView's
   two-rename commit (partial_of=identity, combine=replace); a
   replayed batch sees `last_applied >= id` and skips.

Crash anywhere between the two commits is safe because the output of
batch k is a pure function of (state after k-1, batch k): a replay
recomputes identical rows, finds the output directory already
committed, and proceeds straight to the state commit. Batch ids from
one streaming query are strictly increasing, so the id-keyed skip is
exactly the dedup condition (same argument as streaming/matview.py).

Both directories are fresh per invocation (tracked_tmpdir), so every
query run drains its own stream and recomputes from the parquet
inputs — only the chunked replay input dir is process-shared
(_REPLAY_DIRS), the established source pattern.

Scale posture: state stays aggregate-sized (the step contract), the
per-batch work is ordinary whole-stage-codegen SQL sharded by the
state key, and the output moves straight from the batch computation
to its sink — no per-row JVM<->Python transpose at any volume.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.streaming.matview import IdempotentMatView


def _output_committed(out_root: str, batch_id: int) -> bool:
    d = os.path.join(out_root, f"batch_{batch_id}")
    return os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS"))


def _commit_output(out_df: DataFrame, out_root: str, batch_id: int) -> None:
    """Exactly-once parquet append keyed by batch id: write to a tmp
    dir, then a single rename publishes it. A half-written directory
    (no parquet `_SUCCESS`) from a crashed attempt is discarded."""
    if _output_committed(out_root, batch_id):
        return
    final = os.path.join(out_root, f"batch_{batch_id}")
    tmp = os.path.join(out_root, f"_tmp_{batch_id}")
    shutil.rmtree(tmp, ignore_errors=True)
    out_df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)


def batchstate_handler(spark: SparkSession, out_root: str, state_dir: str, step):
    """The foreachBatch handler implementing the two-commit protocol
    (module docstring). Factored out so the replay/crash semantics are
    testable without a stream; returns (handle, schemas)."""
    state = IdempotentMatView(
        state_dir,
        partial_of=lambda df: df,
        combine=lambda _cur, new: new,
    )
    schemas: dict[str, object] = {}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_applied():
            return  # retried/replayed batch: both commits are on disk
        cur = (
            state.read(spark, schema=schemas.get("state"))
            if state.last_applied() >= 0
            else None
        )
        res = step(cur, batch_df)
        # Steps that persist a shared intermediate (the windowed
        # relation feeding both commits) return it as a third element
        # so it is released once both commits hold — otherwise the
        # batch-sized cached blocks outlive the drain and bypass the
        # repo's _CACHED tracking (r12 advice).
        out_df, new_state = res[0], res[1]
        persisted = res[2] if len(res) > 2 else ()
        # Pinning the (per-query fixed) schemas skips the parquet
        # footer-inference job every later read would otherwise pay.
        schemas.setdefault("state", new_state.schema)
        schemas.setdefault("out", out_df.schema)
        try:
            _commit_output(out_df, out_root, batch_id)
            state.merge(new_state, batch_id)
        finally:
            for df in persisted:
                df.unpersist(blocking=False)

    return handle, schemas


def run_batchstate(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    step,
) -> DataFrame:
    """Drain `stream_df` (a bounded availableNow replay) through `step`
    and return the union of every batch's committed output."""
    from sql_engine_spark.operators.dedup import tracked_tmpdir

    out_root = tracked_tmpdir(f"bstate_out_{name}_")
    handle, schemas = batchstate_handler(
        spark, out_root, tracked_tmpdir(f"bstate_state_{name}_"), step
    )
    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if "out" not in schemas:
        # Zero batches committed: the unmatched batch_* glob below would
        # throw an opaque PATH_NOT_FOUND, and with no step invocation
        # there is no output schema to shape an empty result — fail
        # loudly instead (r12 advice; every registered replay is
        # non-empty by construction).
        raise ValueError(
            f"run_batchstate({name!r}): the bounded replay produced "
            "zero micro-batches — the source dir is empty or the "
            "stream matched no files"
        )
    return spark.read.schema(schemas["out"]).parquet(
        os.path.join(out_root, "batch_*")
    )
