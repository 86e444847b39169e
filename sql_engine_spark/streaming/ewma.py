"""Stateful streaming EWMA: the batch `events_ewma_half` semantics
(alpha = 1/2 over the last 16 readings per user) maintained online
across micro-batches with bounded per-user state — zero Python in the
row path.

Through round 12 (first optimization round) this twin ran on
applyInPandasWithState; the measured harness floor
(scripts/pandas_state_floor.py: an IDENTITY pandas-state op costs ~7x
the pure-JVM state path on the same replay) showed the Arrow round
trip, not the fold, was the wall — ewma emits every event, so every
row paid the JVM->Python->JVM transpose twice. The state transition is
fully expressible in JVM SQL, so the twin now runs on the
foreachBatch batch-state runner (streaming/batchstate.py):

- state per user is the trailing `window-1` (ts, event_id, value)
  readings — constant size, exactly the rows the pandas twin carried;
- each micro-batch unions the carried state under the batch (state
  rows precede batch rows in (ts, event_id) order because the chunked
  replay is range-partitioned on exactly that key), runs the IDENTICAL
  windowed halving fold as the batch query — the same
  `aggregate(collect_list(value) OVER (...), 0.0, (a,x) -> a*0.5+x)`
  expression, same IEEE double op sequence, so convergence to the
  batch window (and the shared DuckDB oracle) is BIT-exact — and emits
  only the batch's own rows;
- the new state is the trailing `window-1` rows of (state UNION batch)
  per user.

Exactly-once under retries/restart is the runner's two-commit
protocol (output dir keyed by batch id + IdempotentMatView state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EWMA_FOLD_NUM = "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)"
EWMA_FOLD_DEN = "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + 1.0D)"


def ewma_batchstate_step(window: int):
    """step(state_df, batch_df) -> (out_df, new_state_df) for
    streaming/batchstate.run_batchstate: the per-batch EWMA emission
    plus the trailing-(window-1) state trim."""
    pad = window - 1

    def step(state_df: DataFrame | None, batch_df: DataFrame):
        b = batch_df.select("user_id", "ts", "event_id", "value").withColumn(
            "__live", F.lit(True)
        )
        if state_df is not None:
            u = (
                state_df.select("user_id", "ts", "event_id", "value")
                .withColumn("__live", F.lit(False))
                .unionByName(b)
            )
        else:
            u = b
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(-pad, Window.currentRow)
        )
        wk = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        # One shuffled+windowed relation feeds BOTH commits (the output
        # write materializes it; the state write reads the cache).
        win = u.withColumn("__vals", F.collect_list("value").over(w)).withColumn(
            "__rk", F.row_number().over(wk)
        )
        if state_df is not None:
            # Strict-order guard (r12 advice, the asof step's pattern):
            # a batch row older than the carried trailing window would
            # silently change the fold — fail loudly in both commits
            # instead. Same user_id partitioning as the fold windows,
            # so no extra exchange.
            w_all = Window.partitionBy("user_id")
            win = win.withColumn(
                "__min_live_ts",
                F.min(F.when(F.col("__live"), F.col("ts"))).over(w_all),
            ).withColumn(
                "__st_max",
                F.max(F.when(~F.col("__live"), F.col("ts"))).over(w_all),
            )
        win.persist()

        def _checked(value_col):
            if state_df is None:
                return value_col
            viol = F.col("__st_max").isNotNull() & (
                F.col("__min_live_ts") < F.col("__st_max")
            )
            return F.when(
                viol,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "ewma batch-state: out-of-order replay for "
                            "key "
                        ),
                        F.col("user_id").cast("string"),
                        F.lit(": batch delivered ts "),
                        F.col("__min_live_ts").cast("string"),
                        F.lit(" < carried trailing-window max "),
                        F.col("__st_max").cast("string"),
                        F.lit(
                            ". Cross-batch time order per key is the "
                            "operator's exact-convergence precondition."
                        ),
                    )
                ),
            ).otherwise(value_col)
        # Batch outputs are small (one chunk of the replay); single-file
        # commits cut the per-write task+commit overhead that dominates
        # a 4-trigger drain. The fold itself is partitioning-insensitive.
        out = (
            win.where("__live")
            .select(
                "event_id",
                "user_id",
                _checked(F.col("ts")).alias("ts"),
                (F.expr(EWMA_FOLD_NUM) / F.expr(EWMA_FOLD_DEN)).alias("ewma"),
            )
            .coalesce(1)
        )
        new_state = (
            win.where(F.col("__rk") <= pad)
            .select(
                "user_id", _checked(F.col("ts")).alias("ts"), "event_id", "value"
            )
            .coalesce(1)
        )
        return out, new_state, [win]

    return step


def ewma_stateful_replay(
    spark: SparkSession, stream: DataFrame, window: int = 16
) -> DataFrame:
    """Drain the bounded events replay through the EWMA batch-state
    step and return every event with its smoothed value."""
    from sql_engine_spark.streaming.batchstate import run_batchstate

    return run_batchstate(
        spark, stream, "ewma_half", ewma_batchstate_step(window)
    ).select("event_id", "user_id", "ts", "ewma")
