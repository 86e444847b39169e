"""Importing this package registers every query with the registry."""

import sql_engine_spark.queries.core  # noqa: F401
import sql_engine_spark.queries.relational  # noqa: F401
import sql_engine_spark.queries.windows  # noqa: F401
import sql_engine_spark.queries.dedup  # noqa: F401
import sql_engine_spark.queries.similarity  # noqa: F401
import sql_engine_spark.queries.text  # noqa: F401
import sql_engine_spark.queries.events  # noqa: F401
import sql_engine_spark.queries.multimodal  # noqa: F401
import sql_engine_spark.queries.streaming  # noqa: F401
import sql_engine_spark.queries.extras  # noqa: F401
import sql_engine_spark.queries.tpch_more  # noqa: F401
import sql_engine_spark.queries.extras2  # noqa: F401
import sql_engine_spark.queries.sampling  # noqa: F401
import sql_engine_spark.queries.pipeline  # noqa: F401
import sql_engine_spark.queries.curation  # noqa: F401
import sql_engine_spark.queries.retrieval  # noqa: F401
import sql_engine_spark.queries.round5_curation  # noqa: F401
import sql_engine_spark.queries.round5_events  # noqa: F401
import sql_engine_spark.queries.round5_text  # noqa: F401
import sql_engine_spark.queries.round5_graph  # noqa: F401
import sql_engine_spark.queries.round5_stream  # noqa: F401
import sql_engine_spark.queries.round6_stats  # noqa: F401
import sql_engine_spark.queries.round6_vectors  # noqa: F401
import sql_engine_spark.queries.round6_curation  # noqa: F401
import sql_engine_spark.queries.round6_audits  # noqa: F401
import sql_engine_spark.queries.round6_pipeline  # noqa: F401
