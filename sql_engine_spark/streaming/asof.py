"""Custom stateful streaming operator: the as-of join as a stream.

Structured Streaming has no as-of join (stream-stream joins need
equality keys plus bounded time ranges, and give EVERY match in range,
not the latest). But the as-of match "latest right row with right.ts <=
left.ts per key" is one-pass computable over a time-ordered stream with
O(1) state per key: carry the best (ts, id) right row seen so far, and
each left row matches the carried state at its arrival point. This is
the streaming twin of operators/asof.py's union+ordered-window batch
spelling (same tie rules: a right row at exactly left.ts matches; ties
among right rows break to the greatest id) — over a time-ordered replay
it converges to the batch result EXACTLY.

ORDERING PRECONDITION (r7 advice — now enforced, not assumed): the
exact-convergence guarantee holds only when the replay is time-ordered
ACROSS micro-batches per key. Within one batch the operator sorts, but
a right row delivered in a LATER batch than a left row with greater ts
would silently yield a stale/NULL enrichment relative to the batch
twin. `strict_order=True` (default) carries the per-key max event ts in
state and raises loudly when any batch delivers a row older than what
the key has already processed, so an out-of-order replay fails instead
of diverging from the shared DuckDB oracle. Set strict_order=False for
genuinely unordered feeds where best-effort enrichment is acceptable.

State shards by the join key (user_id), so a 100 TB stream distributes
as one tiny (ts, id, max_ts) triple per live user across executors. By
default state never expires (a live dimension, not a window); at 100 TB
user cardinality pass `idle_ttl_minutes` to evict keys idle longer than
the TTL (GroupStateTimeout.ProcessingTimeTimeout) — an evicted user's
next purchase enriches as NULL until their next view, the standard
dimension-eviction trade.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp_ntz, "
    "asof_ts timestamp_ntz, asof_event_id bigint"
)
ASOF_STATE_SCHEMA = "best_ts bigint, best_id bigint, max_ts bigint"


def _asof_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    right_type: str,
    left_type: str,
    strict_order: bool,
    idle_ttl_minutes: float | None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # Idle past the TTL: evict the carried dimension row. Nothing
        # to emit — left rows were enriched at arrival.
        state.remove()
        return
    user_id = key[0]
    ts_l, eid_l, side_l = [], [], []
    for pdf in pdfs:
        et = pdf["event_type"].to_numpy()
        keep = (et == right_type) | (et == left_type)
        if not keep.any():
            continue
        ts_l.append(
            pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")[keep]
        )
        eid_l.append(pdf["event_id"].to_numpy(dtype="int64")[keep])
        # views sort before purchases at equal ts (side 0 < 1) so a
        # simultaneous view matches; among equal-ts views the max
        # event_id wins — identical to the batch operator's order.
        side_l.append((et[keep] != right_type).astype("int8"))
    if ts_l:
        tms = np.concatenate(ts_l)
        eids = np.concatenate(eid_l)
        side = np.concatenate(side_l)
        order = np.lexsort((eids, side, tms))
        tms, eids, side = tms[order], eids[order], side[order]
    else:
        tms = eids = np.empty(0, dtype="int64")
        side = np.empty(0, dtype="int8")
    n = tms.size

    best_ts, best_id, max_ts = (
        state.get if state.exists else (None, None, None)
    )
    if strict_order and n and max_ts is not None and int(tms[0]) < max_ts:
        raise ValueError(
            f"asof_enrich_stateful: out-of-order replay for key {user_id}: "
            f"batch delivered ts {int(tms[0])}us < already-processed max "
            f"{max_ts}us. Cross-batch time order per key is the operator's "
            "exact-convergence precondition (see streaming/asof.py); feed a "
            "time-ordered replay or pass strict_order=False for best-effort "
            "enrichment."
        )
    out = None
    if n:
        # Vectorized running-best: in the (ts, side, eid) sort, the best
        # view before position i is the LAST view row at index < i (its
        # (ts, eid) is the per-prefix maximum by construction), except
        # when the carried state wins a tie — the carried best replaces
        # a batch view only if (ts, eid) is strictly greater, matching
        # the scalar update rule (replace on ts >, or ts == and eid >).
        is_view = side == 0
        idx = np.arange(n, dtype="int64")
        last_view = np.maximum.accumulate(np.where(is_view, idx, -1))
        purch = ~is_view
        k = int(purch.sum())
        if k:
            lv = last_view[purch]
            has_batch = lv >= 0
            bts = np.where(has_batch, tms[np.maximum(lv, 0)], np.int64(0))
            bid = np.where(has_batch, eids[np.maximum(lv, 0)], np.int64(0))
            if best_ts is not None:
                carried_wins = ~has_batch | (
                    (best_ts > bts) | ((best_ts == bts) & (best_id >= bid))
                )
                a_ts = np.where(carried_wins, np.int64(best_ts), bts)
                a_id = np.where(carried_wins, np.int64(best_id), bid)
                has = np.ones(k, dtype=bool)
            else:
                a_ts, a_id, has = bts, bid, has_batch
            ats = np.full(k, np.datetime64("NaT", "us"))
            ats[has] = a_ts[has].astype("datetime64[us]")
            aid = pd.array(a_id, dtype="Int64")
            aid[~has] = pd.NA
            out = pd.DataFrame(
                {
                    "event_id": eids[purch],
                    "user_id": np.full(k, user_id, dtype="int64"),
                    "ts": tms[purch].astype("datetime64[us]"),
                    "asof_ts": ats,
                    "asof_event_id": aid,
                }
            )
        # New carried best: the batch's last view vs the old carried,
        # by the same strictly-greater rule.
        if is_view.any():
            lidx = int(last_view[-1])
            vts, vid = int(tms[lidx]), int(eids[lidx])
            if (
                best_ts is None
                or vts > best_ts
                or (vts == best_ts and vid > best_id)
            ):
                best_ts, best_id = vts, vid
        mb = int(tms[-1])
        max_ts = mb if max_ts is None else max(max_ts, mb)
    if best_ts is not None or (strict_order and max_ts is not None):
        state.update((best_ts, best_id, max_ts))
    if idle_ttl_minutes is not None and state.exists:
        # ProcessingTimeTimeout requires re-arming after every batch
        # that touches the key; idle keys then expire at TTL.
        state.setTimeoutDuration(int(idle_ttl_minutes * 60_000))

    if out is not None:
        yield out


ASOF_BATCHSTATE_STATE = (
    "user_id bigint, best_ts timestamp_ntz, best_id bigint, max_ts timestamp_ntz"
)


def asof_batchstate_step(
    right_type: str = "view", left_type: str = "purchase"
):
    """step(state_df, batch_df) -> (out_df, new_state_df) for
    streaming/batchstate.run_batchstate: the as-of enrichment with ZERO
    Python in the row path (guide §4.1 — the pandas-state spelling paid
    the measured ~7x Arrow floor on every emitted purchase).

    Identical semantics to `_asof_group` with strict_order=True, spelled
    as ONE union + window + aggregate per batch (the ewma step's
    state-UNION-batch shape — no state joins, so a batch costs one
    user-sharded exchange feeding both commits):

    - state per user is the best (ts, id) `right_type` row seen so far
      plus the max processed ts (one slim row per user — the same
      triple the pandas twin carried). It enters the batch as a
      pseudo-view row: the strict-order precondition puts it at (or
      before) the front of the per-user (ts, side, event_id) sort, so
      the window fold sees carried-vs-batch precedence for free;
    - within a batch, rows sort by (ts, side, event_id) with views
      (side 0) before purchases at equal ts, so a simultaneous view
      matches and equal-ts views break to the max event_id — the batch
      operator's order; a purchase's match is the LAST view before it
      in that sort (carried pseudo-row included);
    - the new carried best is simply max(view struct) over (carried
      UNION batch views) — the strictly-greater replace rule IS the
      max — and max_ts accumulates the same way, so users absent from
      the batch flow through the aggregate unchanged (no outer join);
    - the strict-order precondition (no batch row older than the key's
      processed max) is enforced with a lazily-evaluated raise_error
      branch in both commits, so an out-of-order replay still fails
      loudly BEFORE its batch publishes.

    Every emitted value is a timestamp or integer id — no floats — so
    convergence to the batch operator (and the shared DuckDB oracle)
    is structural, not numerical.
    """

    def step(state_df: DataFrame | None, batch_df: DataFrame):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        b = batch_df.where(
            F.col("event_type").isin(right_type, left_type)
        ).select(
            "user_id",
            "ts",
            (F.col("event_type") != right_type).cast("int").alias("__side"),
            "event_id",
            F.when(
                F.col("event_type") == right_type,
                F.struct(F.col("ts").alias("vts"), F.col("event_id").alias("vid")),
            ).alias("__v"),
            F.col("ts").alias("__mts"),
            F.lit(True).alias("__live"),
        )
        if state_df is not None:
            # Carried state as pseudo-view rows: null-best rows carry a
            # null __v (transparent to the ignorenulls fold) and null ts
            # (sorts first). Live batch rows can never sort before a
            # carried row except under the out-of-order violation that
            # raises below.
            stu = state_df.select(
                "user_id",
                F.col("best_ts").alias("ts"),
                F.lit(0).alias("__side"),
                F.col("best_id").alias("event_id"),
                F.when(
                    F.col("best_ts").isNotNull(),
                    F.struct(
                        F.col("best_ts").alias("vts"),
                        F.col("best_id").alias("vid"),
                    ),
                ).alias("__v"),
                F.col("max_ts").alias("__mts"),
                F.lit(False).alias("__live"),
            )
            u = stu.unionByName(b)
        else:
            u = b
        w_sort = Window.partitionBy("user_id").orderBy("ts", "__side", "event_id")
        w_all = Window.partitionBy("user_id")
        win = (
            u.withColumn(
                "__prev_view",
                F.last("__v", ignorenulls=True).over(
                    w_sort.rowsBetween(Window.unboundedPreceding, -1)
                ),
            )
            .withColumn(
                "__min_live_ts",
                F.min(F.when(F.col("__live"), F.col("ts"))).over(w_all),
            )
            .withColumn(
                "__st_max",
                F.max(F.when(~F.col("__live"), F.col("__mts"))).over(w_all),
            )
        )
        win.persist()

        def _order_error():
            # Mirrors _asof_group's strict-order ValueError: fail the
            # batch loudly instead of silently diverging from the twin.
            return F.raise_error(
                F.concat(
                    F.lit("asof batch-state: out-of-order replay for key "),
                    F.col("user_id").cast("string"),
                    F.lit(": batch delivered ts "),
                    F.col("__min_live_ts").cast("string"),
                    F.lit(" < already-processed max "),
                    F.col("__st_max").cast("string"),
                    F.lit(
                        ". Cross-batch time order per key is the "
                        "operator's exact-convergence precondition "
                        "(see streaming/asof.py)."
                    ),
                )
            )

        def _checked(value_col):
            """`value_col`, behind a lazily-raising strict-order guard
            (no guard needed on the first batch — no processed max)."""
            if state_df is None:
                return value_col
            viol = F.col("__st_max").isNotNull() & (
                F.col("__min_live_ts") < F.col("__st_max")
            )
            return F.when(viol, _order_error()).otherwise(value_col)

        out = (
            win.where(F.col("__live") & (F.col("__side") == 1))
            .select(
                "event_id",
                "user_id",
                _checked(F.col("ts")).alias("ts"),
                F.col("__prev_view")["vts"].alias("asof_ts"),
                F.col("__prev_view")["vid"].alias("asof_event_id"),
            )
            .coalesce(1)
        )
        new_state = (
            win.groupBy("user_id")
            .agg(
                F.max("__v").alias("__best"),
                F.max("__mts").alias("__maxts"),
                F.min(F.when(F.col("__live"), F.col("ts"))).alias(
                    "__min_live_ts"
                ),
                F.max(F.when(~F.col("__live"), F.col("__mts"))).alias(
                    "__st_max"
                ),
            )
            .select(
                "user_id",
                F.col("__best")["vts"].alias("best_ts"),
                F.col("__best")["vid"].alias("best_id"),
                _checked(F.col("__maxts")).alias("max_ts"),
            )
            .coalesce(1)
        )
        return out, new_state, [win]

    return step


def asof_enrich_replay(
    spark,
    stream: DataFrame,
    *,
    right_type: str = "view",
    left_type: str = "purchase",
) -> DataFrame:
    """Drain the bounded events replay through the as-of batch-state
    step and return every `left_type` event with its enrichment."""
    from sql_engine_spark.streaming.batchstate import run_batchstate

    return run_batchstate(
        spark,
        stream,
        "asof_enrich",
        asof_batchstate_step(right_type, left_type),
    ).select("event_id", "user_id", "ts", "asof_ts", "asof_event_id")


def asof_enrich_stateful(
    stream: DataFrame,
    *,
    right_type: str = "view",
    left_type: str = "purchase",
    strict_order: bool = True,
    idle_ttl_minutes: float | None = None,
) -> DataFrame:
    """Each `left_type` event enriched with the latest prior (or
    simultaneous) `right_type` event of the same user. Emits rows in
    `append` mode as left events arrive. State is one (ts, id, max_ts)
    triple per user; `idle_ttl_minutes=None` keeps it forever (live
    dimension), a value evicts keys idle past the TTL — the scale-safe
    default at unbounded user cardinality. `strict_order` makes an
    out-of-order cross-batch replay fail loudly instead of silently
    diverging from the batch twin (module docstring)."""

    def fn(key, pdfs, state):
        return _asof_group(
            key, pdfs, state, right_type, left_type, strict_order, idle_ttl_minutes
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select("event_id", "user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ASOF_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
