"""Test-data loading helpers for the driver's TPC-H-ish tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet") if name != "events" else _load_events(spark, sf_dir)
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to microsecond TIMESTAMP_NTZ — exactly what
    DuckDB's parquet scan yields — regardless of how the generator wrote
    it. Two layouts observed across driver testdata generations:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so
      read as raw int64 nanos (legacy conf, runtime-settable so it works
      under the driver's own SparkSession too) and floor-truncate to
      micros.
    - parquet timestamp[us]: read natively, just cast to TIMESTAMP_NTZ
      (a wall-clock reinterpretation, no arithmetic).

    Pure JVM column map either way; no Python, scales with the scan."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
