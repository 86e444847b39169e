from sql_engine_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from sql_engine_spark.functions.vectors import cosine_sim, dot, l2_norm

__all__ = ["davg", "dsum", "sql_davg", "sql_dsum", "cosine_sim", "dot", "l2_norm"]
