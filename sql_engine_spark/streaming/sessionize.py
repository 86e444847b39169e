"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState.

This is the one streaming shape the built-ins can't express: we need the
reference-compatible session *ids* (ordinal per user) and arbitrary
per-session payloads, not just merged window bounds. State per user is a
single open session (constant size); a session row is emitted when a
later event closes it. To flush open sessions at end-of-stream, feed a
far-future sentinel event per user (see queries/streaming.py) — time-based
GroupState timeouts would keep the microbatch engine spinning on empty
batches. Grouping keys distribute by user_id, so state shards
horizontally across executors.
"""

from __future__ import annotations

from typing import Any, Iterator

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
    ts: list[int] = []
    for pdf in pdfs:
        # timestamp_ntz arrives as datetime64[us]; keep integer micros so
        # gap arithmetic is exact (matches the batch date_trunc semantics).
        ts.extend(pdf["ts"].astype("datetime64[us]").astype("int64").tolist())
    ts.sort()

    if state.exists:
        next_id, start, last, n = state.get
    else:
        next_id, start, last, n = 1, None, None, 0

    out = []
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
            continue
        if (t // _US) - (last // _US) > gap_s:
            out.append((user_id, next_id, start, last, n))
            next_id += 1
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1

    state.update((next_id, start, last, n))

    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_id": [r[1] for r in out],
                "session_start": pd.to_datetime([r[2] for r in out], unit="us"),
                "session_end": pd.to_datetime([r[3] for r in out], unit="us"),
                "n_events": [r[4] for r in out],
            }
        )


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
