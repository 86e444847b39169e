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

State shards by the join key (user_id), so a 100 TB stream distributes
as one tiny (ts, id) pair per live user across executors.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp_ntz, "
    "asof_ts timestamp_ntz, asof_event_id bigint"
)
ASOF_STATE_SCHEMA = "best_ts bigint, best_id bigint"


def _asof_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    right_type: str,
    left_type: str,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    rows: list[tuple[int, int, int, str]] = []
    for pdf in pdfs:
        micros = pdf["ts"].astype("datetime64[us]").astype("int64")
        for ts, eid, et in zip(micros, pdf["event_id"], pdf["event_type"]):
            if et == right_type or et == left_type:
                # views sort before purchases at equal ts (side 0 < 1) so a
                # simultaneous view matches; among equal-ts views the max
                # event_id wins — identical to the batch operator's order.
                rows.append((int(ts), 0 if et == right_type else 1, int(eid), et))
    rows.sort()

    best_ts, best_id = state.get if state.exists else (None, None)
    out: list[tuple[int, int, int, int | None, int | None]] = []
    for ts, _side, eid, et in rows:
        if et == right_type:
            if best_ts is None or ts > best_ts or (ts == best_ts and eid > best_id):
                best_ts, best_id = ts, eid
        else:
            out.append((eid, user_id, ts, best_ts, best_id))
    if best_ts is not None:
        state.update((best_ts, best_id))

    if out:
        df = pd.DataFrame(
            out, columns=["event_id", "user_id", "ts", "asof_ts", "asof_event_id"]
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        df["asof_ts"] = df["asof_ts"].astype("datetime64[us]")
        yield df


def asof_enrich_stateful(
    stream: DataFrame, *, right_type: str = "view", left_type: str = "purchase"
) -> DataFrame:
    """Each `left_type` event enriched with the latest prior (or
    simultaneous) `right_type` event of the same user. Emits rows in
    `append` mode as left events arrive; state is one (ts, id) pair per
    user and never expires (a live dimension, not a window)."""

    def fn(key, pdfs, state):
        return _asof_group(key, pdfs, state, right_type, left_type)

    return (
        stream.select("event_id", "user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ASOF_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
