"""Skew operators: salted aggregation/join must be transparent
(identical results to the unsalted plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.skew import salted_join, with_salt


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    dim = supp.withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(dim, "l_suppkey").groupBy("s_nationkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, dim, "l_suppkey", unique_col="l_orderkey", buckets=8)
    got = salted.groupBy("s_nationkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_is_deterministic_and_bounded(spark, sf_dir):
    ev = load(spark, sf_dir, "events").limit(1000)
    a = with_salt(ev, "event_id", 16).select("event_id", "__salt")
    b = with_salt(ev, "event_id", 16).select("event_id", "__salt")
    rows_a = dict(a.collect())
    rows_b = dict(b.collect())
    assert rows_a == rows_b
    assert all(0 <= s < 16 for s in rows_a.values())
