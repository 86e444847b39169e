#!/usr/bin/env python
"""Minimal repro pricing the applyInPandasWithState harness floor
(r11 verdict #6): an IDENTITY stateful op — per (user, batch) it does
no per-event Python work at all (one integer state update, the input
columns passed through untouched) — over the exact events replay the
real custom-state twins use. Whatever wall this op pays is the
irreducible microbatch + Arrow + per-group price of the pandas state
API on this pipeline; the delta to a real twin is the twin's own
logic.

Usage: python scripts/pandas_state_floor.py SF_DIR OUT.json

Writes {"floor_wall": ..., "jvm_ref_wall": ...}: the identity pandas
op vs the pure-JVM dropDuplicates twin on the same replay.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState,
    GroupStateTimeout,
)


def identity_group(key, pdfs, state: GroupState):
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
        yield pdf[["user_id", "event_id"]]
    state.update((n,))


def main() -> int:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    from sql_engine_spark.queries.streaming import (
        N_CHUNKS,
        _state_partitions,
        run_to_memory,
    )
    from sql_engine_spark.session import get_spark
    from sql_engine_spark.streaming.source import events_stream

    spark = get_spark("pandas-state-floor")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the replay dir + JVM outside the timed region.
    events_stream(spark, sf_dir, N_CHUNKS)

    t0 = time.time()
    with _state_partitions(spark):
        stream = events_stream(spark, sf_dir, N_CHUNKS)
        out = (
            stream.select("user_id", "event_id")
            .groupBy("user_id")
            .applyInPandasWithState(
                identity_group,
                outputStructType="user_id bigint, event_id bigint",
                stateStructType="n bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        res = run_to_memory(out, "floor_identity", "append")
        n_rows = res.count()
    floor_wall = round(time.time() - t0, 2)

    t1 = time.time()
    with _state_partitions(spark):
        stream = events_stream(spark, sf_dir, N_CHUNKS)
        deduped = stream.select(
            "user_id", "event_type", "event_id"
        ).dropDuplicates(["user_id", "event_type"])
        ref = run_to_memory(deduped, "floor_jvm_ref", "append")
        n_ref = ref.count()
    jvm_wall = round(time.time() - t1, 2)

    payload = {
        "sf_dir": sf_dir,
        "floor_wall": floor_wall,
        "floor_rows": n_rows,
        "jvm_ref_wall": jvm_wall,
        "jvm_ref_rows": n_ref,
        "note": "identity applyInPandasWithState (zero per-event Python) "
        "vs pure-JVM dropDuplicates over the same chunked replay",
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(payload, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
