"""Local replica of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark DataFrame and the oracle SQL on
the same parquet tables, then compare row count, column names, and the
order-insensitive multiset of values (columns sorted by name, rows sorted).
Comparison is EXACT — no float tolerance — because every query is designed
to be bit-identical across engines (see functions/numeric.py). If it passes
here it passes any reasonable hash-based compare.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from sql_engine_spark.io import TABLES
from sql_engine_spark.registry import Query


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Budget DuckDB explicitly: its default memory limit (~80% of RAM)
    # assumes it owns the machine, but here it shares a process with a
    # Spark driver JVM — at sf1 the dedup_lsh_recall_curve oracle ate
    # ~100 GB alongside the JVM and the OS OOM-killed the whole gate
    # (r11 sf1 seal). A hard cap makes DuckDB SPILL to its temp dir
    # instead; the gate slows down but never dies. Both knobs are
    # overridable via env for bigger hosts.
    import os as _os
    import tempfile as _tempfile

    mem = _os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "")
    if not mem:
        # RAM-aware default (r11 advisory): a hardcoded 24 GB is a
        # LOOSER cap than DuckDB's own 80%-of-RAM default on hosts with
        # <30 GB, reintroducing the OOM-kill the cap exists to prevent.
        # min(24 GB, 40% of detected RAM) leaves the Spark driver JVM
        # its share on any host size.
        try:
            pages = _os.sysconf("SC_PHYS_PAGES")
            page_sz = _os.sysconf("SC_PAGE_SIZE")
            total_gb = pages * page_sz / (1 << 30)
        except (ValueError, OSError, AttributeError):
            total_gb = 64.0
        mem = f"{max(1, min(24, int(total_gb * 0.4)))}GB"
    con.execute(f"SET memory_limit='{mem}'")
    # Always give DuckDB a spill directory: with a memory cap but no
    # temp_directory on an in-memory connection, cap-exceeding operators
    # hard-OOM instead of spilling.
    tmp = _os.environ.get("SPARK_GRAFT_DUCKDB_TMP", "") or _os.path.join(
        _tempfile.gettempdir(), "sqe_duckdb_spill"
    )
    _os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key(row: tuple) -> str:
    return repr(row)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    problems: list[str] = field(default_factory=list)
    # Per-side walls (seconds): engine collect vs oracle fetch. Recorded
    # so scale-seal planning can rank queries by MEASURED cost instead of
    # guessing which family members are expensive (r11 verdict #1).
    spark_sec: float = 0.0
    oracle_sec: float = 0.0


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    q: Query,
    sf_dir: str,
    sample_diffs: int = 3,
) -> CompareResult:
    import time as _time

    res = CompareResult(name=q.name, ok=True)
    _t0 = _time.time()
    sdf = q.build(spark, sf_dir)
    s_cols = list(sdf.columns)
    try:
        s_rows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
        res.spark_sec = round(_time.time() - _t0, 2)
    finally:
        # The dedup operators persist intermediates whose lifetime the
        # consumer owns (operators/dedup.py:_persist) — the collect above
        # is that consuming action, so drop the blocks before the next
        # query instead of letting them pile up across a 155-query gate.
        from sql_engine_spark.operators.dedup import release_cached

        release_cached()

    from sql_engine_spark.registry import resolve_oracle

    oracle_sql = resolve_oracle(q.oracle, sf_dir)
    if oracle_sql is None:
        res.spark_rows = len(s_rows)
        res.problems.append("no oracle (rows-only check)")
        return res

    _t1 = _time.time()
    rel = con.sql(oracle_sql)
    o_cols = list(rel.columns)
    o_rows = [tuple(_norm(v) for v in row) for row in rel.fetchall()]
    res.oracle_sec = round(_time.time() - _t1, 2)
    res.spark_rows, res.oracle_rows = len(s_rows), len(o_rows)

    if sorted(s_cols) != sorted(o_cols):
        res.ok = False
        res.problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return res
    if len(s_rows) != len(o_rows):
        res.ok = False
        res.problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")

    # Sort columns by name (the driver's convention), then sort rows.
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_sorted = sorted(_key(tuple(r[i] for i in s_idx)) for r in s_rows)
    o_sorted = sorted(_key(tuple(r[i] for i in o_idx)) for r in o_rows)
    if s_sorted != o_sorted:
        res.ok = False
        diffs = [
            (a, b) for a, b in zip(s_sorted, o_sorted) if a != b
        ][:sample_diffs]
        only_s = [r for r in s_sorted if r not in set(o_sorted)][:sample_diffs]
        only_o = [r for r in o_sorted if r not in set(s_sorted)][:sample_diffs]
        res.problems.append(f"value mismatch; first diffs={diffs}")
        if only_s:
            res.problems.append(f"spark-only rows: {only_s}")
        if only_o:
            res.problems.append(f"oracle-only rows: {only_o}")
    return res


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from sql_engine_spark.registry import all_queries

    qs = all_queries()
    con = duckdb_connection(sf_dir)
    out = []
    for name, q in sorted(qs.items()):
        if names and name not in names:
            continue
        try:
            out.append(compare_query(spark, con, q, sf_dir))
        except Exception as exc:  # noqa: BLE001
            out.append(CompareResult(name=name, ok=False, problems=[f"EXCEPTION: {exc}"]))
    return out
