"""Window functions (absent in the reference — SURVEY.md §2.5).

Every ordering below is total (unique-key tiebreakers), so rank/lag/frames
are deterministic. Running/frame sums go through the exact decimal
reduction (functions/numeric.py) to stay bit-stable regardless of how the
engine maintains the frame (full recompute vs incremental add/subtract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import DEC
from sql_engine_spark.io import load
from sql_engine_spark.registry import register


@register(
    "window_rank",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               row_number() OVER w AS rn,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="row_number / rank / dense_rank per nation by balance.",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "window_running",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE)                                     AS running_spend,
               lag(o_totalprice)  OVER w                           AS prev_price,
               lead(o_totalprice) OVER w                           AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Running sum + lag/lead per customer in order-date order.",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_dec = F.col("o_totalprice").cast(DEC)
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(price_dec).over(run).cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_moving_frame",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)))
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_orderkey, l_linenumber, l_quantity
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE)                                     AS qty_3row_sum,
               MIN(l_quantity) OVER (PARTITION BY l_suppkey
                                     ORDER BY l_orderkey, l_linenumber, l_quantity
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                                                                   AS qty_3row_min
        FROM lineitem
    """,
    doc="Sliding 3-row frame aggregate per supplier.",
)
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l_quantity tiebreaker: the synthetic data has duplicate
    # (l_orderkey, l_linenumber) pairs per suppkey, so a ROWS frame is
    # tie-order dependent without it.
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-2, Window.currentRow)
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("qty_3row_sum"),
        F.min("l_quantity").over(w).alias("qty_3row_min"),
    )


@register(
    "window_topn_per_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 2
    """,
    doc="Top-N per group: the canonical window + filter pattern (at scale "
    "this is one shuffle on the partition key, no self-join).",
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 2)
    )


@register(
    "window_ntile_cume",
    oracle="""
        SELECT s_suppkey, s_acctbal,
               ntile(4)    OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile,
               cume_dist() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS cd,
               first_value(s_suppkey) OVER (ORDER BY s_acctbal DESC, s_suppkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS richest
        FROM supplier
    """,
    doc="ntile / cume_dist / first_value over a global ordering (small "
    "table; a global window is a deliberate single-partition case).",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.first("s_suppkey").over(run).alias("richest"),
    )


@register(
    "window_first_last",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               first_value(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS first_price,
               last_value(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_price,
               nth_value(o_totalprice, 2) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_price
        FROM orders
    """,
    doc="first_value / last_value / nth_value window functions; last/nth "
    "use the full-partition frame (the default running frame makes "
    "last_value just the current row).",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    )


@register(
    "window_time_range_frame",
    oracle="""
        WITH b AS (
            SELECT user_id, event_id, ts, value,
                   CAST(date_diff('second', TIMESTAMP '1995-01-01', ts) AS BIGINT)
                       AS sec
            FROM events
        )
        SELECT user_id, event_id, ts,
               COUNT(*) OVER w AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_1h
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-based RANGE window frame: trailing 1-hour count/sum per "
    "user. Ordering key is wall-clock seconds since a fixed epoch "
    "(timestampdiff, tz-independent), so the frame is value-bounded, "
    "not row-bounded; the frame SET is deterministic under ties and the "
    "decimal window sum is order-insensitive. One shuffle on user_id.",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "sec",
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1995-01-01', ts)").cast("long"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_1h"),
    )
