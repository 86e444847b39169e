"""Quoted-file-path tables: `select * from 'data/x.parquet'`.

The reference's only table abstraction is a Parquet file addressed by a
quoted path used directly in FROM (/root/reference/src/planner/mod.rs:508-535;
quote-stripping at /root/reference/src/storage/mod.rs:9-15). We reproduce that
surface by rewriting quoted paths in table position into registered temp
views backed by `spark.read.<format>` — after which Catalyst provides
pushdown, pruning and vectorized decode that the reference's row-by-row
reader (/root/reference/src/storage/parquet.rs:18-53) lacks.

Superset: the reference reads Parquet only; we also accept .csv/.json/.orc.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.errors import StorageError

# A quoted relative/absolute path with a supported extension, in table
# position (preceded by FROM / JOIN / a comma in a FROM list).
_PATH_RE = re.compile(r"'([^']+\.(?:parquet|csv|json|orc))'", re.IGNORECASE)
_TABLE_POS_RE = re.compile(r"(?:\bfrom\s*|\bjoin\s*|,\s*)$", re.IGNORECASE)

_FORMAT_READERS = {
    ".parquet": lambda spark, p: spark.read.parquet(p),
    ".orc": lambda spark, p: spark.read.orc(p),
    ".csv": lambda spark, p: spark.read.options(header=True, inferSchema=True).csv(p),
    ".json": lambda spark, p: spark.read.json(p),
}


def view_name_for(path: str) -> str:
    digest = hashlib.md5(path.encode()).hexdigest()[:12]
    return f"path_table_{digest}"


def read_path(spark: SparkSession, path: str) -> DataFrame:
    for ext, reader in _FORMAT_READERS.items():
        if path.lower().endswith(ext):
            try:
                return reader(spark, path)
            except Exception as exc:  # noqa: BLE001 - mapped to taxonomy
                raise StorageError(str(exc)) from exc
    raise StorageError(f"Unsupported table format: {path}")


def rewrite_path_tables(spark: SparkSession, sql: str) -> str:
    """Replace quoted file paths in table position with temp-view names.

    Registration is lazy metadata only — no data is read until the query
    executes, matching Spark's deferred execution model.
    """

    def _sub(m: re.Match) -> str:
        prefix = sql[: m.start()]
        if not _TABLE_POS_RE.search(prefix):
            return m.group(0)  # a plain string literal, not a table
        path = m.group(1)
        name = view_name_for(path)
        if not spark.catalog.tableExists(name):
            read_path(spark, path).createOrReplaceTempView(name)
        return name

    return _PATH_RE.sub(_sub, sql)
