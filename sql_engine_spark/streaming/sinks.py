"""Streaming sinks beyond the memory-table harness.

`stream_to_parquet_idempotent` is the production-shaped file sink:
foreachBatch + dynamic partition overwrite keyed by batch id. A replayed
micro-batch (restart after a crash between sink write and offset commit)
overwrites ITS OWN partition instead of appending duplicates — that plus
the checkpoint's offset log gives end-to-end exactly-once into parquet.
The plain `writeStream.format("parquet")` sink is already exactly-once
via its file manifest; the foreachBatch form is what you use when the
write needs logic (merge keys, custom layout, multiple tables) and must
stay idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet_idempotent(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    partition_cols: list[str] | None = None,
) -> StreamingQuery:
    """Start a foreachBatch query writing each micro-batch to `path`
    under a `__batch_id=N` partition, overwriting only that partition on
    replay. Caller drives the query (processAllAvailable/stop)."""
    extra = list(partition_cols or [])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id", *extra)
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(checkpoint, "cp"))
        .start()
    )
