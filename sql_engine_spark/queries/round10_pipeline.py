"""Round-10 pipeline batch: SCD2 change application — the MERGE that
turns a change batch into type-2 history (close the current row, open
the new one), completing the SCD2 family (scd2_intervals builds
history from a log; scd2_as_of_snapshot reads it point-in-time; this
op WRITES it incrementally, the nightly-dim-load shape).

The reference engine has no DML at all (single-SELECT planner,
/root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

_SCD2_BASE_FROM = "1995-01-01"
_SCD2_EFF = "2000-01-01"
_SCD2_DELTA = 100.0


@register(
    "scd2_apply_changes",
    oracle=f"""
        WITH dim AS (
            SELECT s_suppkey AS key, s_acctbal AS acctbal,
                   CAST('{_SCD2_BASE_FROM}' AS DATE) AS valid_from,
                   CAST(NULL AS DATE) AS valid_to
            FROM supplier
        ),
        changes AS (
            SELECT s_suppkey AS key,
                   s_acctbal + {_SCD2_DELTA} AS new_acctbal
            FROM supplier WHERE s_suppkey % 10 = 0
        ),
        closed AS (
            SELECT d.key, d.acctbal, d.valid_from,
                   CASE WHEN c.key IS NOT NULL
                        THEN CAST('{_SCD2_EFF}' AS DATE)
                        ELSE d.valid_to END AS valid_to
            FROM dim d LEFT JOIN changes c USING (key)
        ),
        opened AS (
            SELECT key, new_acctbal AS acctbal,
                   CAST('{_SCD2_EFF}' AS DATE) AS valid_from,
                   CAST(NULL AS DATE) AS valid_to
            FROM changes
        ),
        merged AS (
            SELECT * FROM closed UNION ALL SELECT * FROM opened
        )
        SELECT key, acctbal, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM merged
    """,
    doc="SCD2 change application (the warehouse MERGE for type-2 "
    "dimensions; Kimball's SCD type 2): a change batch (derived "
    "deterministically — every 10th supplier's balance moves by "
    f"+{_SCD2_DELTA} effective {_SCD2_EFF}) applies to the current "
    "dimension by CLOSING each matched current row (valid_to = "
    "effective date) and OPENING a new current row — one left join "
    "to flag matches + one union, both keyed on the dimension's "
    "natural key (a single shuffle; at 100 TB the change batch is "
    "typically small and broadcasts). Completes the SCD2 family: "
    "scd2_intervals builds history from a log, scd2_as_of_snapshot "
    "reads it point-in-time, this writes it incrementally. Spark "
    "expresses it as the dataframe algebra a Delta MERGE compiles "
    "to; the oracle is the identical algebra.",
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    dim = sup.select(
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit(_SCD2_BASE_FROM).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changes = (
        sup.where(F.col("s_suppkey") % 10 == 0)
        .select(
            F.col("s_suppkey").alias("key"),
            (F.col("s_acctbal") + F.lit(_SCD2_DELTA)).alias("new_acctbal"),
        )
    )
    closed = dim.join(
        F.broadcast(changes.select("key", F.lit(1).alias("__m"))),
        "key",
        "left",
    ).select(
        "key",
        "acctbal",
        "valid_from",
        F.when(
            F.col("__m").isNotNull(), F.lit(_SCD2_EFF).cast("date")
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )
    opened = changes.select(
        "key",
        F.col("new_acctbal").alias("acctbal"),
        F.lit(_SCD2_EFF).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    merged = closed.unionAll(opened)
    return merged.select(
        "key",
        "acctbal",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
