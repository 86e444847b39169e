"""sql_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference Rust engine at /root/reference (dylan-p-wong/sql-engine), re-expressed
Spark-first: the reference's parser/planner/optimizer/executor pipeline
(/root/reference/src/database.rs:30-36) becomes Catalyst + Tungsten; our code is
a thin declarative layer (quoted-path table resolution, result surface, error
taxonomy) plus operator libraries the reference lacks (dedup, similarity
search, text analysis, streaming) designed for 100 TB scale.
"""

from sql_engine_spark.engine import Engine
from sql_engine_spark.errors import EngineError
from sql_engine_spark.result import Result
from sql_engine_spark.session import get_spark

__all__ = ["Engine", "EngineError", "Result", "get_spark"]
__version__ = "0.1.0"
