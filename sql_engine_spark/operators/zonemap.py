"""Zone-map (min/max) file skipping — the data-skipping layer every
lakehouse table format (Delta, Iceberg, Hudi) builds over parquet.

Parquet already prunes ROW GROUPS inside a file via footer statistics;
zone maps lift the same idea to WHOLE FILES so the planner never opens
(or lists into tasks) files whose [min, max] range cannot satisfy the
predicate. At 100 TB with ~100k files, the stats relation is ~100k tiny
rows — metadata scale, the exact thing Delta keeps in its transaction
log — while the skipped data is terabytes of never-scheduled input.

Stats come from PARQUET FOOTERS, read driver-side with pyarrow — no
Spark job, no row reads (round-4 review: the earlier scan-based stats
build cost more than the unpruned scan it replaced). That is exactly
what a table format's planner does: consult metadata (its log / the
file footers), hand the scan a pruned file list.

Two pieces:

- ``footer_file_stats``: per-file (n_rows, min, max, all_null,
  has_stats) folded over the file's row-group column statistics.
  Driver-side metadata reads only; needs no SparkSession.
- ``pruned_read``: keep files whose zone intersects the predicate
  (conservatively keeping files with missing stats), read ONLY those
  paths, re-apply the row-level filter (zone pruning is necessarily
  conservative). The qualifying file LIST lives on the driver — file
  count, not row count.

``collect_file_stats`` (the original full-scan stats build) is kept as
the slow-path cross-check the footer reader is tested against.

The result is definitionally equal to the unpruned filtered scan, which
is exactly what the oracle checks.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class FileZone:
    file: str
    n_rows: int
    min_val: object  # None when all_null or not has_stats
    max_val: object
    all_null: bool  # every value in every row group is NULL
    has_stats: bool  # every non-null-bearing row group carried min/max


def _local_path(p: str) -> str:
    u = urlparse(p)
    return u.path if u.scheme in ("", "file") else p


def _list_parquet_files(path: str) -> list[str]:
    p = _local_path(path)
    if os.path.isdir(p):
        return sorted(
            f
            for f in glob.glob(os.path.join(p, "*.parquet"))
            if not os.path.basename(f).startswith(("_", "."))
        )
    return [p]


def footer_file_stats(path: str, col: str) -> list[FileZone]:
    """Per-file zone stats from parquet FOOTER metadata — driver-side,
    zero row reads, no Spark job (callable without a SparkSession).

    A row group whose column is entirely NULL constrains nothing and is
    folded out; a row group with non-null values but NO min/max stats
    makes the whole file `has_stats=False` (the caller must keep it)."""
    import pyarrow.parquet as pq

    zones: list[FileZone] = []
    for f in _list_parquet_files(path):
        md = pq.ParquetFile(f).metadata
        idx = None
        for i in range(md.num_columns):
            if md.row_group(0).column(i).path_in_schema == col:
                idx = i
                break
        if idx is None:
            raise KeyError(f"column {col!r} not found in {f}")
        mn = mx = None
        all_null = True
        has_stats = True
        for rg in range(md.num_row_groups):
            cc = md.row_group(rg).column(idx)
            st = cc.statistics
            n_vals = cc.num_values
            if st is not None and st.null_count == n_vals:
                continue  # all-NULL row group: constrains nothing
            all_null = False
            if st is None or not st.has_min_max:
                has_stats = False
                continue
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        zones.append(FileZone(f, md.num_rows, mn, mx, all_null, has_stats))
    return zones


def collect_file_stats(spark: SparkSession, path: str, col: str) -> DataFrame:
    """(file, n_rows, min_val, max_val) per physical parquet file — the
    FULL-SCAN stats build. Not used by `pruned_read` (footers are); kept
    as the ground truth the footer reader is cross-checked against."""
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
    """Read `path` keeping only files whose [min, max] zone (from the
    parquet footer) intersects [lo, hi], then re-apply the row filter.
    Returns (dataframe, files_kept, files_total).

    Skip rules: an all-NULL file can satisfy no BETWEEN and is skipped;
    a file with missing stats is conservatively KEPT (zone pruning may
    only ever remove provably-disjoint files)."""
    zones = footer_file_stats(path, col)
    keep = [
        z.file
        for z in zones
        if not z.all_null
        and (not z.has_stats or not (z.max_val < lo or z.min_val > hi))
    ]
    df = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(path).limit(0)
    )
    return df.where(F.col(col).between(lo, hi)), len(keep), len(zones)
