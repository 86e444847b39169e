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
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read it as raw int64 nanos (legacy conf, runtime-
    settable so it works under the driver's own SparkSession too) and
    floor-truncate to microsecond TIMESTAMP_NTZ — exactly what DuckDB does
    on read (its parquet scan yields TIMESTAMP, i.e. micros). Pure JVM
    column map; no Python, scales with the scan."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn(
        "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
    )
