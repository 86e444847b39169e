"""Engine: the reference's `Database` entry point, Spark-first.

Reference pipeline: SQL -> sqlparser -> Planner -> (identity) Optimizer ->
pull-based Executor (/root/reference/src/database.rs:30-36). Ours: SQL ->
path-table rewrite -> `spark.sql` -> Catalyst (parse/analyze/optimize) ->
distributed execution. We intentionally do NOT rebuild a planner or
executor — Catalyst's predicate pushdown, column pruning, join strategy
selection and AQE replace the reference's identity optimizer
(/root/reference/src/optimizer/mod.rs:10-12) and its always-nested-loop join
(/root/reference/src/executor/nested_join.rs:37-89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.errors import EngineError, map_spark_exception
from sql_engine_spark.result import Result
from sql_engine_spark.session import get_spark
from sql_engine_spark.tables import rewrite_path_tables


def split_statements(sql: str) -> list[str]:
    """Split on top-level semicolons (quote-aware)."""
    out, buf, in_str = [], [], False
    for ch in sql:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return [s.strip() for s in out if s.strip()]


class Engine:
    """Public API, like `sqlengine::database::Database`
    (/root/reference/src/database.rs:16-36)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    def sql(self, sql: str) -> DataFrame:
        """Plan a single statement; returns a lazy DataFrame."""
        try:
            rewritten = rewrite_path_tables(self.spark, sql)
            return self.spark.sql(rewritten)
        except EngineError:
            raise
        except BaseException as exc:  # noqa: BLE001
            raise map_spark_exception(exc) from exc

    def explain(self, sql: str, mode: str = "formatted") -> str:
        """Catalyst plan for the (last) statement — the reference has no
        EXPLAIN at all (identity optimizer, optimizer/mod.rs:10-12)."""
        from sql_engine_spark.plans.audit import explain_str

        statements = split_statements(sql)
        return explain_str(self.sql(statements[-1]), mode)

    def execute(self, sql: str, max_rows: int | None = None) -> Result:
        """Execute; on multi-statement input runs only the last statement,
        matching the reference (/root/reference/src/planner/mod.rs:132-137)."""
        statements = split_statements(sql)
        if not statements:
            raise_parse = map_spark_exception(ValueError("empty query"))
            raise raise_parse
        df = self.sql(statements[-1])
        try:
            if max_rows is None:
                return Result.from_df(df)
            return Result.from_df(df, max_rows=max_rows)
        except EngineError:
            raise
        except BaseException as exc:  # noqa: BLE001
            raise map_spark_exception(exc) from exc
