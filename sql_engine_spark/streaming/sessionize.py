"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState.

This is the one streaming shape the built-ins can't express: we need the
reference-compatible session *ids* (ordinal per user) and arbitrary
per-session payloads, not just merged window bounds. (A JVM
`session_window` aggregate followed by a stateful ordinal-assigner would
keep the per-event work JVM-side, but Spark's unsupported-operation
checker rejects arbitrary-stateful operators downstream of a streaming
aggregation, so the whole operator lives in one Python stateful pass.)
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
