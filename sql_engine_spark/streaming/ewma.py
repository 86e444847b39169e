"""Stateful streaming EWMA: the batch `events_ewma_half` semantics
(alpha = 1/2 over the last 16 readings per user) maintained online with
applyInPandasWithState.

State per user is the last window-1 readings — constant size, sharded
by user_id across executors. Every arriving event emits exactly one row
immediately (append mode, no watermark/flush dance needed), so the
drained stream is row-for-row the batch window result PROVIDED events
arrive in (ts, event_id) order per user — which the chunked replay
source guarantees globally (range-partitioned chunks, one per trigger).

The arithmetic is the identical left fold (acc*0.5 + x, oldest to
newest, normalized by the same fold over ones) in IEEE doubles with the
same rounding as the JVM expression — so the convergence to batch is
BIT-exact, same discipline as every replay query in
queries/streaming.py. The fold is VECTORIZED across events: instead of
re-folding a 16-element Python list per event (O(events x window)
interpreter ops — most of the twin's measured Arrow-tax at the sf1
stress), the window slots become `window` shifted numpy columns and the
fold runs as `window` elementwise passes (num = num*0.5 + col). Each
event's element sees exactly the same operation sequence and rounding
as the scalar loop, so results are bit-identical; slots before a user's
first event contribute (v=0, w=1-weight=0), which is the fold's
identity (0*0.5 + 0 == 0, the fresh-start accumulator).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = "event_id bigint, user_id bigint, ts timestamp_ntz, ewma double"
EWMA_STATE_SCHEMA = "tms array<bigint>, eids array<bigint>, vals array<double>"

_US = 1_000_000


def _ewma_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    window: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    tms_l, eids_l, vals_l = [], [], []
    for pdf in pdfs:
        tms_l.append(pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64"))
        eids_l.append(pdf["event_id"].to_numpy(dtype="int64"))
        vals_l.append(pdf["value"].to_numpy(dtype="float64"))
    tms = np.concatenate(tms_l) if tms_l else np.empty(0, dtype="int64")
    eids = np.concatenate(eids_l) if eids_l else np.empty(0, dtype="int64")
    vals = np.concatenate(vals_l) if vals_l else np.empty(0, dtype="float64")
    order = np.lexsort((eids, tms))  # (ts, event_id) — the batch ordering
    tms, eids, vals = tms[order], eids[order], vals[order]
    n = tms.size

    if state.exists:
        s_tms, s_eids, s_vals = state.get
        s_tms = np.asarray(s_tms, dtype="int64")
        s_eids = np.asarray(s_eids, dtype="int64")
        s_vals = np.asarray(s_vals, dtype="float64")
    else:
        s_tms = np.empty(0, dtype="int64")
        s_eids = np.empty(0, dtype="int64")
        s_vals = np.empty(0, dtype="float64")
    t_len = s_vals.size

    if n:
        allv = np.concatenate([s_vals, vals])
        # Left-pad with window-1 identity slots so every event has a
        # full `window` of column positions; weight 0 marks a pad.
        pad = window - 1
        pv = np.concatenate([np.zeros(pad), allv])
        pw = np.concatenate([np.zeros(pad), np.ones(allv.size)])
        num = np.zeros(n)
        den = np.zeros(n)
        # Event at absolute position p = t_len + t reads slots
        # pv[p - (window-1) + j + pad] = pv[t_len + t + j], oldest
        # (j=0) to newest (j=window-1) — the scalar fold's order.
        for j in range(window):
            colv = pv[t_len + j : t_len + j + n]
            colw = pw[t_len + j : t_len + j + n]
            num = num * 0.5 + colv
            den = den * 0.5 + colw
        out = pd.DataFrame(
            {
                "event_id": eids,
                "user_id": np.full(n, user_id, dtype="int64"),
                "ts": tms.astype("datetime64[us]"),
                "ewma": num / den,
            }
        )
        # keep only the trailing window-1 readings: the next event's
        # frame (window == 1 keeps nothing — pad == 0).
        keep = min(pad, t_len + n)
        a_tms = np.concatenate([s_tms, tms])[allv.size - keep :]
        a_eids = np.concatenate([s_eids, eids])[allv.size - keep :]
        a_vals = allv[allv.size - keep :]
        state.update((a_tms.tolist(), a_eids.tolist(), a_vals.tolist()))
        yield out
    else:
        state.update((s_tms.tolist(), s_eids.tolist(), s_vals.tolist()))


def ewma_stateful(events: DataFrame, window: int = 16) -> DataFrame:
    """Streaming per-user EWMA over the trailing `window` readings."""

    def fn(key, pdfs, state):
        return _ewma_group(key, pdfs, state, window)

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
