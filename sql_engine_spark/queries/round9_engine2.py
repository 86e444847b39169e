"""Round-9 late engine-surface batch: Spark 4 VARIANT JSON extraction,
UNION BY NAME, and explicit NULLS FIRST/LAST ordering parity.

These pin dialect corners where the engines' DEFAULTS genuinely
diverge (Spark sorts NULLs first ascending, DuckDB last — the pin
spells the placement explicitly in both), or where Spark's surface is
API-level (unionByName) with a plain-SQL oracle equivalent.

The reference engine parses none of this (single-SELECT planner,
/root/reference/src/planner/mod.rs:202-207; ORDER BY is a placeholder,
planner/mod.rs:193-195).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# scalar_variant_json — Spark 4 VARIANT extraction over events.props
# ---------------------------------------------------------------------------


@register(
    "scalar_variant_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decade,
               CAST(json_extract(props, '$.missing') AS BIGINT) IS NULL
                   AS missing_is_null
        FROM events
    """,
    doc="Spark 4 VARIANT ingestion of the semi-structured props column: "
    "parse_json -> VARIANT, typed variant_get extraction with an "
    "absent-path probe (returns NULL, not an error). VARIANT is "
    "Spark 4's answer to schema-on-read JSON at scale — a binary "
    "encoding that avoids per-query string re-parsing and pushes "
    "shredded field access down to the scan; the oracle is DuckDB's "
    "native JSON extraction over the identical path expressions. "
    "Complements events_json_extract (string get_json_object) with "
    "the typed-variant path. Pure per-row map, zero shuffles.",
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.expr("parse_json(props)").alias("__v")
    )
    k = F.expr("variant_get(__v, '$.k', 'long')")
    missing = F.expr("variant_get(__v, '$.missing', 'long')")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.expr("variant_get(__v, '$.k', 'long') DIV 10").alias("k_decade"),
        missing.isNull().alias("missing_is_null"),
    )


# ---------------------------------------------------------------------------
# setop_union_by_name — positional-mismatch-safe union
# ---------------------------------------------------------------------------


@register(
    "setop_union_by_name",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey = 0
        UNION ALL
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey = 1
    """,
    doc="UNION resolved BY COLUMN NAME instead of position "
    "(DataFrame.unionByName; DuckDB spells it UNION ALL BY NAME): the "
    "two branches project the same columns in DIFFERENT orders — a "
    "positional UNION would silently zip nationkey against regionkey "
    "(the classic schema-evolution landmine when shards were written "
    "by different pipeline versions); by-name resolution re-aligns "
    "them. The oracle is the plain aligned UNION ALL, proving the "
    "by-name result equals what a careful positional author would "
    "have written.",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    a = nat.where(F.col("n_regionkey") == 0).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    b = nat.where(F.col("n_regionkey") == 1).select(
        "n_regionkey", "n_name", "n_nationkey"  # deliberately reordered
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# order_nulls_placement — explicit NULLS FIRST/LAST parity
# ---------------------------------------------------------------------------

_NULLS_SQL = """
    WITH t(x, tag) AS (VALUES
        (CAST(3 AS BIGINT), 'a'), (CAST(NULL AS BIGINT), 'b'),
        (CAST(1 AS BIGINT), 'c'), (CAST(NULL AS BIGINT), 'd'),
        (CAST(2 AS BIGINT), 'e'))
    SELECT x, tag,
           CAST(row_number() OVER (ORDER BY x ASC NULLS LAST, tag)
                AS BIGINT) AS rn_asc_nulls_last,
           CAST(row_number() OVER (ORDER BY x ASC NULLS FIRST, tag)
                AS BIGINT) AS rn_asc_nulls_first,
           CAST(row_number() OVER (ORDER BY x DESC NULLS LAST, tag)
                AS BIGINT) AS rn_desc_nulls_last
    FROM t
"""


@register(
    "order_nulls_placement",
    oracle=_NULLS_SQL,
    doc="Explicit NULLS FIRST/LAST ordering parity: Spark's DEFAULT "
    "places NULLs first ascending, DuckDB's (Postgres convention) "
    "places them last — an ORDER BY that omits the placement silently "
    "returns different row orders on the two engines. This pin spells "
    "every placement explicitly (the house rule for any ordered "
    "output) and materializes the order as row_number columns so the "
    "driver's order-insensitive hash compare still checks placement. "
    "Identical SQL text runs on both engines.",
)
def order_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_NULLS_SQL)
