"""Query registry: every implemented operator registers a (Spark builder,
DuckDB oracle SQL) pair here; `__spark_entry__.py` re-exports it.

An oracle of None marks a genuinely non-SQL-expressible op (the driver then
records a weaker rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    build: QueryFn
    oracle: Optional[str]
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Importing the query modules populates the registry.
    import sql_engine_spark.queries  # noqa: F401

    return dict(_REGISTRY)
