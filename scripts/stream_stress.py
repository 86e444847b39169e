#!/usr/bin/env python
"""Streaming-fleet scale stress (r10 verdict #7): the batch side got its
10x test at sf1; this instruments the STREAMING side at the same scale.

Three subcommands, each writing one JSON artifact:

  progress SF_DIR OUT.json [--chunks 16] [--state-parts 8]
      Replays the events table through three representative stateful
      pipelines (watermarked sliding-window agg; watermarked
      dropDuplicates — state ~= one row per event; applyInPandasWithState
      sessionize — the custom-state worst case) and records EVERY
      micro-batch's lastProgress: input rows, trigger wall, state rows,
      state memory. The per-batch lag curve is the instrument: a healthy
      stream's trigger wall tracks input volume; state growth must track
      the operator's contract (bounded for windows once the watermark
      closes them, ~rows for dropDuplicates, ~open sessions for
      sessionize).

  killrestart SF_DIR OUT.json [--chunks 8] [--kill-at 4]
      Crash-recovery AT VOLUME: a child process replays chunks through a
      foreachBatch IdempotentMatView and SIGKILLs itself at the start of
      batch --kill-at (after 3 commits); the parent restarts from the
      SAME checkpoint + view dir, drains, and exact-compares the view to
      the batch oracle. The unit/integration tests pin the rename
      protocol at sf0.001; this proves redelivery + dedup at 10x state.

  twins: per-twin end-to-end walls are bench_probe's job (the twins are
  registered queries):
      python scripts/bench_probe.py SF_DIR OUT.json streaming_... ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _progress_entries(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        if p is None:
            continue
        d = p if isinstance(p, dict) else json.loads(p.json)
        states = d.get("stateOperators") or []
        out.append(
            {
                "batch_id": d.get("batchId"),
                "input_rows": d.get("numInputRows"),
                "trigger_ms": (d.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "state_rows": sum(
                    s.get("numRowsTotal", 0) for s in states
                ),
                "state_mem_bytes": sum(
                    s.get("memoryUsedBytes", 0) for s in states
                ),
            }
        )
    return out


def cmd_progress(sf_dir: str, out_path: str, chunks: int, state_parts: int) -> int:
    from pyspark.sql import functions as F

    from sql_engine_spark.session import get_spark
    from sql_engine_spark.streaming.sessionize import sessionize_stateful
    from sql_engine_spark.streaming.source import table_replay_chunks
    from sql_engine_spark.streaming.windows import sliding_agg

    spark = get_spark("stream-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
    replay_dir, _ = table_replay_chunks(
        spark, sf_dir, "events", ["ts", "event_id"], chunks
    )
    schema = spark.read.parquet(replay_dir).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(replay_dir)
        )

    cases = {
        # Watermarked overlapping windows: state = open windows only.
        "sliding_window": lambda: sliding_agg(
            stream(), length_minutes=10, slide_minutes=5
        ),
        # Exactly-once event dedup: state ~= one row per event id — the
        # state-heaviest standard operator at any scale. Watermarks need
        # TIMESTAMP (ltz): cast the ntz column first (session tz is UTC,
        # wall-clock preserving — streaming/windows._with_event_time).
        "dropdup": lambda: stream()
        .withColumn("__etime", F.col("ts").cast("timestamp"))
        .withWatermark("__etime", "1 hour")
        .dropDuplicates(["event_id"]),
        # Custom state via applyInPandasWithState: per-user open-session
        # rows, the GroupState path a real pipeline's sessionizer runs.
        "sessionize_stateful": lambda: sessionize_stateful(stream()),
    }
    results: dict[str, dict] = {}
    for name, build in cases.items():
        t0 = time.time()
        q = (
            build()
            .writeStream.outputMode(
                "update" if name != "sessionize_stateful" else "append"
            )
            .format("noop")
            .option(
                "checkpointLocation",
                os.path.join(replay_dir, f"_ckpt_{name}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        batches = _progress_entries(q)
        q.stop()
        results[name] = {
            "wall_sec": wall,
            "n_batches": len(batches),
            "batches": batches,
            "max_state_rows": max(
                (b["state_rows"] or 0 for b in batches), default=0
            ),
            "max_state_mem_mb": round(
                max((b["state_mem_bytes"] or 0 for b in batches), default=0)
                / 1e6,
                1,
            ),
            "max_trigger_ms": max(
                (b["trigger_ms"] or 0 for b in batches), default=0
            ),
        }
        print(f"== {name}: {results[name]['wall_sec']}s, "
              f"{results[name]['n_batches']} batches, "
              f"max state rows {results[name]['max_state_rows']}, "
              f"max trigger {results[name]['max_trigger_ms']}ms", flush=True)
    payload = {
        "sf_dir": sf_dir,
        "chunks": chunks,
        "state_partitions": state_parts,
        "cases": results,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


_KILL_CHILD = r"""
import os, signal, sys
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from sql_engine_spark.session import get_spark
from sql_engine_spark.streaming.matview import IdempotentMatView

replay_dir, view_dir, ckpt, kill_at = {replay!r}, {view!r}, {ckpt!r}, {kill_at}
spark = get_spark("stream-kill-child")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "8")
schema = spark.read.parquet(replay_dir).schema
mv = IdempotentMatView(
    view_dir,
    partial_of=lambda df: df.groupBy("user_id").agg(
        F.count("*").cast("long").alias("cnt"),
    ),
    combine=lambda cur, p: cur.unionByName(p).groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("cnt"),
    ),
)

def handler(df, bid):
    if bid >= kill_at:
        os.kill(os.getpid(), signal.SIGKILL)  # no shutdown hooks, no flush
    mv.merge(df, bid)

q = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "1").parquet(replay_dir)
    .writeStream.outputMode("append").foreachBatch(handler)
    .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
)
q.awaitTermination()
"""


def cmd_killrestart(sf_dir: str, out_path: str, chunks: int, kill_at: int) -> int:
    import tempfile

    from pyspark.sql import functions as F

    from sql_engine_spark.session import get_spark
    from sql_engine_spark.streaming.matview import IdempotentMatView
    from sql_engine_spark.streaming.source import table_replay_chunks

    spark = get_spark("stream-kill-parent")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    work = tempfile.mkdtemp(prefix="stream_kill_")
    replay_dir, _ = table_replay_chunks(
        spark, sf_dir, "events", ["ts", "event_id"], chunks,
        out_dir=os.path.join(work, "replay"),
    )
    view_dir = os.path.join(work, "view")
    ckpt = os.path.join(work, "ckpt")
    code = _KILL_CHILD.format(
        root=HERE, replay=replay_dir, view=view_dir, ckpt=ckpt, kill_at=kill_at
    )
    t0 = time.time()
    child = subprocess.run(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    child_wall = round(time.time() - t0, 1)
    killed = child.returncode != 0
    # Restart from the SAME checkpoint in THIS process and drain.
    schema = spark.read.parquet(replay_dir).schema
    mv = IdempotentMatView(
        view_dir,
        partial_of=lambda df: df.groupBy("user_id").agg(
            F.count("*").cast("long").alias("cnt"),
        ),
        combine=lambda cur, p: cur.unionByName(p)
        .groupBy("user_id")
        .agg(F.sum("cnt").cast("long").alias("cnt")),
    )
    t1 = time.time()
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: mv.merge(df, bid))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    recover_wall = round(time.time() - t1, 1)
    # Exact-compare against the batch oracle.
    from sql_engine_spark.io import load

    got = {r["user_id"]: r["cnt"] for r in mv.read(spark).collect()}
    want = {
        r["user_id"]: r["cnt"]
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    ok = got == want
    payload = {
        "sf_dir": sf_dir,
        "chunks": chunks,
        "kill_at_batch": kill_at,
        "child_killed": killed,
        "child_wall_sec": child_wall,
        "recover_wall_sec": recover_wall,
        "rows_expected": len(want),
        "rows_got": len(got),
        "exact_match": ok,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    return 0 if (ok and killed) else 1


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] not in ("progress", "killrestart"):
        print(__doc__)
        return 2
    cmd = args[0]
    args = args[1:]
    chunks = 16 if cmd == "progress" else 8
    state_parts, kill_at = 8, 4
    if "--chunks" in args:
        i = args.index("--chunks")
        chunks = int(args[i + 1])
        del args[i : i + 2]
    if "--state-parts" in args:
        i = args.index("--state-parts")
        state_parts = int(args[i + 1])
        del args[i : i + 2]
    if "--kill-at" in args:
        i = args.index("--kill-at")
        kill_at = int(args[i + 1])
        del args[i : i + 2]
    sf_dir, out_path = args[0], args[1]
    if cmd == "progress":
        return cmd_progress(sf_dir, out_path, chunks, state_parts)
    return cmd_killrestart(sf_dir, out_path, chunks, kill_at)


if __name__ == "__main__":
    sys.exit(main())
