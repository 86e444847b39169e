"""Query registry: every implemented operator registers a (Spark builder,
DuckDB oracle SQL) pair here; `__spark_entry__.py` re-exports it.

An oracle of None marks a genuinely non-SQL-expressible op (the driver then
records a weaker rows-only check). An oracle may also be a CALLABLE
`(sf_dir) -> str` for operators whose oracle SQL depends on a data-derived
size (e.g. LSH plane counts derived from the corpus row count): the SQL is
still fully deterministic per dataset — `resolve_oracle` renders it against
the sf-dir the comparison actually runs on.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
OracleSpec = Union[str, Callable[[str], str]]


@dataclass
class Query:
    name: str
    build: QueryFn
    oracle: Optional[OracleSpec]
    doc: str = ""


def resolve_oracle(oracle: Optional[OracleSpec], sf_dir: str) -> Optional[str]:
    """Render an oracle spec to SQL for a concrete dataset directory.

    Besides calling callable oracles, this substitutes the deferred
    `__KNN_SHARED_K{k}__` markers (operators/graph.sql_knn_shared):
    the shared kNN graph's plane count is derived from the dataset's
    corpus size, which static f-string oracles can't know at import
    time. One substitution point keeps every graph-family oracle in
    lockstep with knn_graph_shared's derived build."""
    if oracle is None:
        return None
    sql = oracle(sf_dir) if callable(oracle) else oracle
    if "__KNN_SHARED_K" in sql:
        import re as _re

        from sql_engine_spark.operators.graph import render_knn_shared_sql

        sql = _re.sub(
            r"__KNN_SHARED_K(\d+)__",
            lambda m: render_knn_shared_sql(sf_dir, k=int(m.group(1))),
            sql,
        )
    return sql


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[OracleSpec] = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Importing the query modules populates the registry.
    import sql_engine_spark.queries  # noqa: F401

    return dict(_REGISTRY)
