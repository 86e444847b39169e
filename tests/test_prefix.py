"""Two-level (bucketed) prefix sum: result identical to the single-window
spelling for any bucket count, and the plan's widest window must be
partitioned by (key, bucket) — never by the bare source key (VERDICT r2
scale-killer #1)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_engine_spark.operators.prefix import (
    bucketed_running_sum,
    hex_prefix_bucket,
    range_bucket,
)
from sql_engine_spark.registry import all_queries


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _source_window_partition_second_cols(plan: str) -> list[str]:
    """For every window spec whose FIRST partition column is `source`,
    capture the next column: a compliant plan has `__bkt` there (the
    offsets carry may legitimately partition by source ordered by __bkt —
    it runs over the tiny per-bucket totals)."""
    return re.findall(r"windowspecdefinition\(source#\d+L?, ([A-Za-z_]\w*)#", plan)


def test_bucketed_running_sum_matches_single_window(spark):
    rows = [(s, i, (i * 7 + s) % 13 + 1) for s in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, "src int, oid long, v long")
    w = (
        Window.partitionBy("src")
        .orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        (r.src, r.oid): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    for n_buckets in (1, 4, 32):
        got = bucketed_running_sum(
            df,
            part_cols=["src"],
            order_col="oid",
            value_col="v",
            bucket=range_bucket("oid", F.lit(0), F.lit(199), n_buckets),
            out_col="cum",
        )
        got_map = {(r.src, r.oid): r.cum for r in got.collect()}
        assert got_map == expected, f"mismatch at n_buckets={n_buckets}"


@pytest.mark.parametrize("n_buckets", [1, 2, 256, 1024])
def test_bucketed_running_sum_adversarial(spark, n_buckets):
    """Bit-equality with the single-window spelling at adversarial bucket
    counts (1 = degenerate single bucket; 1024 > the 180 distinct order
    values, so most buckets are empty and many hold one row) over a
    heavily SKEWED key distribution (one key holds ~90% of rows, two
    keys are singletons) and negative values (carry must subtract)."""
    rows = (
        [(0, i, (i * 13) % 7 - 3) for i in range(180)]  # hot key, negatives
        + [(1, i * 3 + 1, i + 1) for i in range(15)]     # sparse order values
        + [(2, 7, 100), (3, 0, -5)]                      # singleton keys
    )
    df = spark.createDataFrame(rows, "src int, oid long, v long")
    w = (
        Window.partitionBy("src")
        .orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        (r.src, r.oid): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    got = bucketed_running_sum(
        df,
        part_cols=["src"],
        order_col="oid",
        value_col="v",
        bucket=range_bucket("oid", F.lit(0), F.lit(179), n_buckets),
        out_col="cum",
    )
    got_map = {(r.src, r.oid): r.cum for r in got.collect()}
    assert got_map == expected, f"mismatch at n_buckets={n_buckets}"


@pytest.mark.parametrize("n_buckets", [1, 2, 37, 256])
def test_bucketed_running_sum_hex_order_adversarial(spark, n_buckets):
    """Same bit-equality sweep over an md5-hash ORDER column (the
    curation_token_budget shape) via hex_prefix_bucket, including a
    bucket count that doesn't divide 256."""
    df = (
        spark.createDataFrame(
            [(i % 4, i) for i in range(300)], "src int, i long"
        )
        .select("src", F.md5(F.col("i").cast("string")).alias("h"), F.lit(1).alias("v"))
    )
    w = (
        Window.partitionBy("src")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        (r.src, r.h): r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    got = bucketed_running_sum(
        df,
        part_cols=["src"],
        order_col="h",
        value_col="v",
        bucket=hex_prefix_bucket("h", n_buckets),
        out_col="cum",
    )
    got_map = {(r.src, r.h): r.cum for r in got.collect()}
    assert got_map == expected, f"mismatch at n_buckets={n_buckets}"


def test_hex_prefix_bucket_is_order_consistent(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "i long"
    ).select(F.md5(F.col("i").cast("string")).alias("h"))
    b = df.select("h", hex_prefix_bucket("h", 32).alias("b")).collect()
    by_hash = sorted(b, key=lambda r: r.h)
    buckets = [r.b for r in by_hash]
    assert buckets == sorted(buckets)  # monotone in the hash order
    assert 0 <= min(buckets) and max(buckets) < 32
    assert len(set(buckets)) > 16  # actually spreads


def test_token_budget_plan_has_no_per_source_window(spark, sf_dir):
    df = all_queries()["curation_token_budget"].build(spark, sf_dir)
    plan = _optimized_plan(df)
    seconds = _source_window_partition_second_cols(plan)
    assert seconds, "expected windows in the plan"
    assert all(c == "__bkt" for c in seconds), plan


def test_pack_sequences_plan_has_no_per_source_window(spark, sf_dir):
    df = all_queries()["text_pack_sequences"].build(spark, sf_dir)
    plan = _optimized_plan(df)
    seconds = _source_window_partition_second_cols(plan)
    assert seconds, "expected windows in the plan"
    assert all(c == "__bkt" for c in seconds), plan
