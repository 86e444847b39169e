"""Deterministic sampling for training-data pipelines.

`df.sample()` / TABLESAMPLE use engine-seeded RNGs: not reproducible
across engines, and under Spark a recomputed partition (task retry, lost
executor) can resample DIFFERENT rows mid-job. At 100 TB both are
disqualifying for dataset curation — the sample must be a pure function
of the data. These operators sample by content hash instead:

- hash sampling: keep a row iff a hex prefix of md5(key) falls below a
  threshold — scan-side filter, no shuffle, no state, rate = threshold/16^k.
- stratified sampling: fixed quota per stratum, rows ranked by content
  hash — one shuffle on the stratum key; the hash ordering makes the
  quota a uniform draw within each stratum.

md5 keeps the oracle engine-portable (same trick as operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register


def _hash_key(*cols: str) -> F.Column:
    return F.md5(F.concat_ws("-", *[F.col(c).cast("string") for c in cols]))


@register(
    "sample_hash",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE substring(md5(concat_ws('-', CAST(l_orderkey AS VARCHAR),
                                           CAST(l_linenumber AS VARCHAR))), 1, 4)
              < '2000'
    """,
    doc="Deterministic ~12.5% sample (md5 prefix < '2000' = 2/16 of hex "
    "space) keyed on the row identity. Reproducible across engines, "
    "retries, and reruns; pure scan-side filter — no shuffle at any "
    "scale.",
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        F.substring(_hash_key("l_orderkey", "l_linenumber"), 1, 4) < "2000"
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "sample_stratified",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, rn
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY md5(concat_ws('-', CAST(l_orderkey AS VARCHAR),
                                                   CAST(l_linenumber AS VARCHAR))),
                                l_orderkey, l_linenumber) AS rn
            FROM lineitem
        )
        WHERE rn <= 200
    """,
    doc="Deterministic stratified sample: exactly 200 rows per "
    "l_returnflag stratum, chosen by content-hash rank (a uniform draw "
    "within each stratum, stable across engines and reruns). One shuffle "
    "on the stratum key; at scale prefer more strata or pre-filter by "
    "hash to keep per-stratum sorts bounded.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        _hash_key("l_orderkey", "l_linenumber"), "l_orderkey", "l_linenumber"
    )
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 200)
    )
