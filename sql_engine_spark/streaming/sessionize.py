"""Custom stateful streaming operator: gap-based sessionization.

The shape the built-ins can't express: reference-compatible session
*ids* (ordinal per user) and arbitrary per-session payloads, not just
merged window bounds. (A JVM `session_window` aggregate followed by a
stateful ordinal-assigner would keep the per-event work JVM-side, but
Spark's unsupported-operation checker rejects arbitrary-stateful
operators downstream of a streaming aggregation.)

Two spellings live here. `sessionize_batchstate_step` (r12) runs the
registered query on the JVM foreachBatch batch-state runner — zero
Python in the row path. The original applyInPandasWithState operator
below is retained as the measured pandas-state baseline
(scripts/stream_stress.py, scripts/pandas_state_floor.py — the ~7-8x
Arrow-floor numbers in PERF_NOTES were taken against it).
State per user is a single open session (constant size); a session row
is emitted when a later event closes it. To flush open sessions at
end-of-stream, feed a far-future sentinel event per user (see
queries/streaming.py) — time-based GroupState timeouts would keep the
microbatch engine spinning on empty batches. Grouping keys distribute by
user_id, so state shards horizontally across executors.

Per-event work is VECTORIZED (numpy diff over the sorted microsecond
array → break indices → segment bounds), not a Python loop per event:
at the sf1 stress scale (1M events) the loop spelling paid ~8x the
JVM-state twins per row, and most of that was per-event Python
bytecode, not Arrow (see PERF_NOTES r12 'streaming Arrow tax').
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_id bigint, session_start timestamp_ntz, "
    "session_end timestamp_ntz, n_events bigint"
)
STATE_SCHEMA = "next_id bigint, start bigint, last bigint, n bigint"

_US = 1_000_000


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    # timestamp_ntz arrives as datetime64[us]; keep integer micros so
    # gap arithmetic is exact (matches the batch date_trunc semantics).
    arrs = [
        pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        for pdf in pdfs
    ]
    ts = np.concatenate(arrs) if len(arrs) != 1 else arrs[0]
    ts.sort(kind="stable")

    if state.exists:
        next_id, start, last, n = state.get
    else:
        next_id, start, last, n = 1, None, None, 0

    if ts.size == 0:
        state.update((next_id, start, last, n))
        return

    # Segment the batch at gaps > gap_s measured on TRUNCATED seconds
    # (t // _US), identical to the scalar spelling and the batch
    # date_trunc semantics. seg i spans [bounds[i], bounds[i+1]).
    secs = ts // _US
    breaks = np.flatnonzero(np.diff(secs) > gap_s) + 1
    bounds = np.concatenate(([0], breaks, [ts.size]))
    seg_start = ts[bounds[:-1]]
    seg_last = ts[bounds[1:] - 1]
    seg_n = np.diff(bounds)

    carried: tuple[int, int, int] | None = None
    if start is not None:
        if secs[0] - (last // _US) > gap_s:
            # The carried-open session closes before the batch's first
            # event — emit it ahead of the batch's own sessions.
            carried = (start, last, n)
        else:
            # First batch segment continues the carried session.
            seg_start[0] = start
            seg_n[0] += n

    # Every segment but the last is closed by the gap that follows it;
    # the last stays open in state.
    start, last, n = int(seg_start[-1]), int(seg_last[-1]), int(seg_n[-1])
    starts = seg_start[:-1]
    lasts = seg_last[:-1]
    ns = seg_n[:-1]
    if carried is not None:
        starts = np.concatenate(([carried[0]], starts))
        lasts = np.concatenate(([carried[1]], lasts))
        ns = np.concatenate(([carried[2]], ns))
    n_out = starts.size
    if n_out:
        ids = np.arange(next_id, next_id + n_out, dtype="int64")
        next_id += n_out
        out = pd.DataFrame(
            {
                "user_id": np.full(n_out, user_id, dtype="int64"),
                "session_id": ids,
                "session_start": starts.astype("datetime64[us]"),
                "session_end": lasts.astype("datetime64[us]"),
                "n_events": ns.astype("int64"),
            }
        )
    state.update((next_id, start, last, n))
    if n_out:
        yield out


def sessionize_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming sessionization emitting ordinal session ids per user.

    Sessions close when a gap > `gap_s` is observed; flush tail sessions
    with a per-user sentinel event past the horizon.
    """

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_s)

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_BATCHSTATE_STATE = (
    "user_id bigint, next_id bigint, start timestamp_ntz, "
    "last timestamp_ntz, n bigint"
)


def sessionize_batchstate_step(gap_s: int = 1800):
    """step(state_df, batch_df) -> (out_df, new_state_df) for
    streaming/batchstate.run_batchstate: gap sessionization with ZERO
    Python in the row path (guide §4.1 — the pandas-state spelling paid
    the ~7x Arrow identity floor of scripts/pandas_state_floor.py plus
    per-event Python at the sf1 stress).

    Identical semantics to `_sessionize_group`, spelled as ONE union +
    window + aggregate per batch (the ewma/asof state-UNION-batch
    shape, no state joins):

    - state per user is the single open session (next ordinal id,
      start, last event ts, event count). It enters the batch as a
      pseudo-row at ts = last (sorted before any equal-ts batch row),
      carrying its real start/count, so the ordinary lag-gap
      segmentation decides carried-merge exactly like the scalar code:
      gap(last -> first batch event) <= gap_s extends the carried
      session (min(start) keeps the carried start, sum(n) adds the
      carried count); a larger gap leaves the carried session as its
      own segment, emitted closed ahead of the batch's sessions;
    - gaps are measured on date_trunc('second') differences — the
      identical spelling (and IEEE-free integer arithmetic) as the
      batch events_sessionize and the shared DuckDB oracle;
    - segment s of S per user emits closed for s < S with session_id =
      next_id + s - 1; segment S becomes the new open state with
      next_id advanced by S - 1. Users absent from the batch flow
      through as their own single segment: nothing emitted, state
      bit-identical.

    Every value is a timestamp or integer, so convergence to the batch
    twin (and oracle) is structural.
    """

    def step(state_df, batch_df):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        b = batch_df.select(
            "user_id",
            "ts",
            F.lit(1).alias("__side"),
            "event_id",
            F.col("ts").alias("__start"),
            F.lit(1).cast("long").alias("__n"),
            F.lit(None).cast("long").alias("__next"),
        )
        if state_df is not None:
            stu = state_df.select(
                "user_id",
                F.col("last").alias("ts"),
                F.lit(0).alias("__side"),
                F.lit(-1).cast("long").alias("event_id"),
                F.col("start").alias("__start"),
                F.col("n").alias("__n"),
                F.col("next_id").alias("__next"),
            )
            u = stu.unionByName(b)
        else:
            u = b
        w_sort = Window.partitionBy("user_id").orderBy("ts", "__side", "event_id")
        gap = F.expr(
            "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
            "OVER (PARTITION BY user_id ORDER BY ts, __side, event_id), "
            "date_trunc('second', ts))"
        )
        win = u.withColumn(
            "__seg",
            F.sum(
                F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
            ).over(w_sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        w_user = Window.partitionBy("user_id")
        if state_df is not None:
            # Strict-order guard (r12 advice, the asof step's pattern):
            # a batch row older than the carried session's last event
            # would silently re-segment history — fail loudly in both
            # commits instead. Same user_id partitioning as the
            # segmentation window, no extra exchange.
            win = win.withColumn(
                "__viol",
                F.max(F.when(F.col("__side") == 0, F.col("ts"))).over(
                    w_user
                ).isNotNull()
                & (
                    F.min(F.when(F.col("__side") == 1, F.col("ts"))).over(
                        w_user
                    )
                    < F.max(F.when(F.col("__side") == 0, F.col("ts"))).over(
                        w_user
                    )
                ),
            )
        else:
            win = win.withColumn("__viol", F.lit(False))
        segs = (
            win.groupBy("user_id", "__seg")
            .agg(
                F.min("__start").alias("__s_start"),
                F.max("ts").alias("__s_last"),
                F.sum("__n").alias("__s_n"),
                F.max("__next").alias("__nxt"),
                F.max("__viol").alias("__viol"),
            )
            .withColumn(
                "__base", F.coalesce(F.max("__nxt").over(w_user), F.lit(1))
            )
            .withColumn("__S", F.max("__seg").over(w_user))
        )
        segs.persist()

        def _checked(value_col):
            if state_df is None:
                return value_col
            return F.when(
                F.col("__viol"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "sessionize batch-state: out-of-order replay "
                            "for key "
                        ),
                        F.col("user_id").cast("string"),
                        F.lit(
                            ": a batch event precedes the carried open "
                            "session's last event. Cross-batch time "
                            "order per key is the operator's "
                            "exact-convergence precondition."
                        ),
                    )
                ),
            ).otherwise(value_col)

        out = (
            segs.where(F.col("__seg") < F.col("__S"))
            .select(
                "user_id",
                (F.col("__base") + F.col("__seg") - 1).alias("session_id"),
                _checked(F.col("__s_start")).alias("session_start"),
                F.col("__s_last").alias("session_end"),
                F.col("__s_n").alias("n_events"),
            )
            .coalesce(1)
        )
        new_state = (
            segs.where(F.col("__seg") == F.col("__S"))
            .select(
                "user_id",
                (F.col("__base") + F.col("__S") - 1).alias("next_id"),
                _checked(F.col("__s_start")).alias("start"),
                F.col("__s_last").alias("last"),
                F.col("__s_n").alias("n"),
            )
            .coalesce(1)
        )
        return out, new_state, [segs]

    return step


def sessionize_replay(spark, stream, gap_s: int = 1800):
    """Drain the bounded (sentinel-augmented) events replay through the
    sessionization batch-state step; closed sessions accumulate across
    batches, the sentinel closes every tail session in the final one."""
    from sql_engine_spark.streaming.batchstate import run_batchstate

    return run_batchstate(
        spark, stream, "sessionize", sessionize_batchstate_step(gap_s)
    ).select("user_id", "session_id", "session_start", "session_end", "n_events")
