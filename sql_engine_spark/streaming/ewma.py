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
newest, normalized by the same fold over ones) in Python floats —
IEEE doubles with the same rounding as the JVM expression — so the
convergence to batch is BIT-exact, same discipline as every replay
query in queries/streaming.py.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = "event_id bigint, user_id bigint, ts timestamp_ntz, ewma double"
EWMA_STATE_SCHEMA = "tms array<bigint>, eids array<bigint>, vals array<double>"

_US = 1_000_000


def _ewma(window_vals: list[float]) -> float:
    num = 0.0
    den = 0.0
    for v in window_vals:
        num = num * 0.5 + v
        den = den * 0.5 + 1.0
    return num / den


def _ewma_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    window: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    rows: list[tuple[int, int, float]] = []
    for pdf in pdfs:
        tms = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
        rows.extend(zip(tms, pdf["event_id"].tolist(), pdf["value"].tolist()))
    rows.sort()  # (ts, event_id) — the batch window's ordering

    if state.exists:
        tms, eids, vals = state.get
        buf = list(zip(list(tms), list(eids), list(vals)))
    else:
        buf = []

    out_ids, out_tms, out_ewma = [], [], []
    for tm, eid, val in rows:
        buf.append((tm, eid, float(val)))
        if len(buf) > window:
            buf = buf[-window:]
        out_ids.append(eid)
        out_tms.append(tm)
        out_ewma.append(_ewma([b[2] for b in buf]))

    # keep only the trailing window-1 readings: the next event's frame.
    # window == 1 needs its own branch: buf[-(1 - 1):] is buf[-0:] ==
    # buf[0:], the WHOLE buffer — unbounded state growth.
    tail = buf[-(window - 1):] if window > 1 else []
    state.update(
        (
            [b[0] for b in tail],
            [b[1] for b in tail],
            [b[2] for b in tail],
        )
    )

    if out_ids:
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [user_id] * len(out_ids),
                "ts": pd.to_datetime(out_tms, unit="us"),
                "ewma": out_ewma,
            }
        )


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
