"""Write paths (sinks). The reference has no write path at all
(SURVEY.md §2.5 — Parquet read only); this is pure superset surface.

100 TB posture:
- `partition_by` produces a hive-layout dataset so downstream reads get
  partition pruning (a filter on the partition column skips whole
  directories, visible as PartitionFilters in the scan node).
- `sort_by` clusters rows within each output file (better min/max
  row-group statistics -> parquet predicate pushdown skips row groups,
  and runs compress better).
- `max_records_per_file` bounds file sizes so a 1000-executor read gets
  balanced splits; without it one skewed task can emit a multi-GB file.
- `write_bucketed` pre-shuffles a table once at write time (hash-bucketed
  by join key, optionally sorted within buckets): two tables bucketed the
  same way then sort-merge join with ZERO exchanges — the shuffle that
  would move 100 TB per join is paid once, at ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_engine_spark.errors import StorageError

_WRITE_FORMATS = {"parquet", "orc", "json", "csv"}


def write_table(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write `df` as a (optionally partitioned) dataset at `path`."""
    if format not in _WRITE_FORMATS:
        raise StorageError(f"Unsupported write format: {format}")
    out = df
    if sort_by:
        # Cluster within output tasks; with partition_by also repartition by
        # the partition columns first so each task writes few files.
        if partition_by:
            out = out.repartition(*partition_by)
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode).format(format)
    if format == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    try:
        writer.save(path)
    except Exception as exc:  # noqa: BLE001 - mapped to taxonomy
        raise StorageError(str(exc)) from exc


def _morton_interleave(c1, c2, bits: int):
    """Interleave the low `bits` bits of two non-negative long columns
    into a Morton (Z-order) code. Pure JVM bit ops inside codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(c1, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(c2, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    cols: tuple[str, str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write `df` Z-order-clustered on two numeric columns.

    Each column is min/max-normalized into `bits` bits and the bits are
    interleaved; range-partitioning + sorting by the Morton code makes
    every output file (and parquet row group) cover a small RECTANGLE of
    the (c1, c2) space, so min/max stats prune scans filtered on EITHER
    column — a plain sort only skips on its leading column. The min/max
    pass is one extra aggregate at write time; reads pay nothing.
    """
    a, b = cols
    row = df.agg(
        F.min(a).alias("a_min"), F.max(a).alias("a_max"),
        F.min(b).alias("b_min"), F.max(b).alias("b_max"),
    ).first()
    span = (1 << bits) - 1

    def norm(c: str, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        return ((F.col(c) - F.lit(lo)) * span / F.lit(hi - lo)).cast("long")

    z = _morton_interleave(norm(a, row.a_min, row.a_max), norm(b, row.b_min, row.b_max), bits)
    try:
        (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(path)
        )
    except Exception as exc:  # noqa: BLE001 - mapped to taxonomy
        raise StorageError(str(exc)) from exc


def compact_dataset(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    format: str = "parquet",
) -> int:
    """Rewrite a dataset into ~target_file_bytes files; returns the new
    part-file count (counted recursively, so partitioned layouts report
    their true file count).

    The small-files problem is the classic failure mode of incremental
    ingest at scale: thousands of KB-sized files turn a scan into a
    metadata storm (one task + one open per file). Compaction sizes the
    output from the dataset's actual on-disk bytes and optionally
    re-clusters rows (better row-group min/max stats -> more row-group
    skipping). Pass `partition_by` to preserve a hive-partitioned layout
    (the rewrite flattens directories otherwise).

    Swap discipline: write to a temp dir, rename the original aside, move
    the temp into place, then delete the old copy — the dataset is only
    ever missing during the two cheap `os.replace` renames (not during
    the slow write or the slow delete), and a failure at any step
    restores the original and removes the temp. This is crash-safe on a
    POSIX filesystem; on an object store (no atomic rename) use a
    catalog/manifest swap instead — this helper is for local/HDFS paths.
    """
    import shutil

    # Recover from a prior crashed compaction before writing anything:
    # a leftover `.__compact_old__` would make this run's os.replace
    # fail, and (after a crash between the two renames) may hold the
    # only surviving copy of the dataset.
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    if os.path.exists(old):
        if not os.path.exists(path):
            os.replace(old, path)  # crash landed between the renames
        else:
            shutil.rmtree(old)  # crash landed before the old-copy delete
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # incomplete write from a dead process

    src_bytes = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, -(-src_bytes // target_file_bytes))  # ceil-div
    df = spark.read.format(format).load(path)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode("overwrite").format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.save(tmp)
        os.replace(path, old)
        try:
            os.replace(tmp, path)
        except Exception:
            os.replace(old, path)  # restore the original before surfacing
            raise
    except Exception as exc:  # noqa: BLE001 - mapped to taxonomy
        shutil.rmtree(tmp, ignore_errors=True)
        raise StorageError(str(exc)) from exc
    shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.startswith("part-") and not f.endswith(".crc")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a hash-bucketed (optionally bucket-sorted) parquet
    table registered as `table` in the session catalog, stored at `path`.

    Two tables bucketed by the same keys into the same bucket count join
    with zero Exchange nodes (and zero Sorts if both are bucket-sorted):
    the per-join shuffle is paid once at write. This is the co-located
    join layout for fact tables that are joined repeatedly at 100 TB.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    try:
        writer.saveAsTable(table)
    except Exception as exc:  # noqa: BLE001 - mapped to taxonomy
        raise StorageError(str(exc)) from exc
