"""Error taxonomy.

Mirrors the reference's 5-stage error enum `Error::{Parser, Planner,
Execution, Expression, Storage}` (/root/reference/src/types/error.rs:3-10),
rendered as "<Stage> Error: <msg>" (/root/reference/src/types/error.rs:24-34).
We map PySpark's exception hierarchy onto the same taxonomy so
sqllogictest-style `statement error` probes stay meaningful.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base engine error; `stage` matches the reference taxonomy."""

    stage = "Engine"

    def __init__(self, message: str):
        self.message = message
        super().__init__(message)

    def __str__(self) -> str:  # "<Stage> Error: <msg>" (types/error.rs:24-34)
        return f"{self.stage} Error: {self.message}"


class ParserError(EngineError):
    stage = "Parser"


class PlannerError(EngineError):
    stage = "Planner"


class ExecutionError(EngineError):
    stage = "Execution"


class ExpressionError(EngineError):
    stage = "Expression"


class StorageError(EngineError):
    stage = "Storage"


def map_spark_exception(exc: BaseException) -> EngineError:
    """Classify a PySpark exception into the 5-stage taxonomy.

    ParseException -> Parser, AnalysisException -> Planner (the reference
    raises planning errors for unknown fields/tables, e.g. "Planner Error:
    Field not found" pinned by tests/resources/sql/aggregates4.slt:13-14),
    path problems -> Storage, runtime -> Execution.
    """
    try:
        from pyspark.errors import (  # pyspark >= 3.4
            AnalysisException,
            ParseException,
            PySparkException,
        )
    except ImportError:  # pragma: no cover
        from pyspark.sql.utils import AnalysisException, ParseException  # type: ignore

        PySparkException = Exception  # type: ignore

    msg = str(exc)
    if isinstance(exc, ParseException):
        return ParserError(msg)
    if isinstance(exc, AnalysisException):
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return StorageError(msg)
        return PlannerError(msg)
    if isinstance(exc, PySparkException):
        return ExecutionError(msg)
    return ExecutionError(msg)
