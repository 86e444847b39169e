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
