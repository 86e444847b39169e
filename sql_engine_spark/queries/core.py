"""Reference-parity operators (SURVEY.md §2.1-§2.4).

Covers the reference's whole executor tree — Scan
(/root/reference/src/executor/scan.rs:11-42), Filter (filter.rs:10-56),
Projection (projection.rs:10-83), NestedLoopJoin (nested_join.rs:10-93),
Aggregation with GROUP BY / HAVING (aggregation.rs:23-228), Limit
(limit.rs:8-62) — plus the full scalar-expression grammar
(expression.rs:25-260) and all five aggregate functions
(aggregation.rs:168-180: min/max/sum/count/avg).

Spark-first notes: scans get pushdown/pruning from DataSource V2; the
reference's only join strategy is an in-memory block nested loop — here
Catalyst picks broadcast-hash for the small dimension sides (we hint
`broadcast` where the dimension is known small) and sort-merge otherwise;
aggregation is partial+final hash agg with spill for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register


@register(
    "scan_project",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    doc="Scan + projection (reference executor/scan.rs + projection.rs). "
    "Column pruning reaches the parquet reader (ReadSchema shows 3 cols).",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "filter_where",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
    doc="WHERE with conjunctive predicate (reference executor/filter.rs); "
    "both predicates push down to the parquet scan.",
)
def filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.where((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "project_expressions",
    oracle="""
        SELECT p_partkey,
               p_size + 1                       AS size_plus,
               p_size * 2                       AS size_double,
               p_size % 5                       AS size_mod,
               -p_size                          AS size_neg,
               p_retailprice / 2.0              AS half_price,
               p_brand || '#' || p_type         AS brand_type,
               p_size > 25                      AS is_big,
               (p_size > 10 AND p_size < 40)    AS is_mid,
               NOT (p_size > 10 AND p_size < 40) AS not_mid
        FROM part
    """,
    doc="Scalar expression grammar: arithmetic, unary minus, modulo, string "
    "concat, comparison, AND/NOT (reference executor/expression.rs:25-260).",
)
def project_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    size, price = F.col("p_size"), F.col("p_retailprice")
    is_mid = (size > 10) & (size < 40)
    return p.select(
        "p_partkey",
        (size + 1).alias("size_plus"),
        (size * 2).alias("size_double"),
        (size % 5).alias("size_mod"),
        (-size).alias("size_neg"),
        (price / 2.0).alias("half_price"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        (size > 25).alias("is_big"),
        is_mid.alias("is_mid"),
        (~is_mid).alias("not_mid"),
    )


@register(
    "limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="LIMIT (reference executor/limit.rs) made deterministic with a total "
    "order; Spark plans TakeOrderedAndProject (no global sort).",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "cross_join",
    oracle="""
        SELECT r1.r_name AS name1, r2.r_name AS name2
        FROM region r1 CROSS JOIN region r2
    """,
    doc="Cartesian product (reference: comma-list FROM becomes predicate-less "
    "NestedLoopJoin, planner/mod.rs:448-475).",
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    return (
        r.alias("r1")
        .crossJoin(F.broadcast(r.alias("r2")))
        .select(F.col("r1.r_name").alias("name1"), F.col("r2.r_name").alias("name2"))
    )


@register(
    "theta_join",
    oracle="""
        SELECT n1.n_name AS name_a, n2.n_name AS name_b, n1.n_regionkey AS region_key
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
    doc="Inner join with arbitrary theta predicate (reference "
    "executor/nested_join.rs:57-89). The equi-part hashes; the inequality "
    "stays as a post-join residual — no nested loop at scale.",
)
def theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    n1, n2 = n.alias("n1"), n.alias("n2")
    cond = (F.col("n1.n_regionkey") == F.col("n2.n_regionkey")) & (
        F.col("n1.n_nationkey") < F.col("n2.n_nationkey")
    )
    return n1.join(n2, cond, "inner").select(
        F.col("n1.n_name").alias("name_a"),
        F.col("n2.n_name").alias("name_b"),
        F.col("n1.n_regionkey").alias("region_key"),
    )


@register(
    "join_inner_multi",
    oracle="""
        SELECT c_custkey, c_name, n_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    doc="Multi-way equi-join over the dimension chain; both dims broadcast "
    "(reference would run two in-memory nested loops).",
)
def join_inner_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


_AGG_GLOBAL_ORACLE = f"""
    SELECT COUNT(*)                         AS n_rows,
           COUNT(l_quantity)                AS n_qty,
           MIN(l_quantity)                  AS min_qty,
           MAX(l_quantity)                  AS max_qty,
           {sql_dsum('l_extendedprice')}    AS sum_price,
           {sql_davg('l_discount')}         AS avg_disc
    FROM lineitem
"""


@register(
    "agg_global",
    oracle=_AGG_GLOBAL_ORACLE,
    doc="Global aggregate, all five reference aggregate functions "
    "(reference executor/aggregation.rs:168-180). Double sums go through "
    "an exact decimal reduction (functions/numeric.py) so results are "
    "bit-stable across partitionings and engines.",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_discount").alias("avg_disc"),
    )


@register(
    "agg_empty_input",
    oracle="""
        SELECT COUNT(*) AS n_rows, COUNT(l_quantity) AS n_qty,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        FROM lineitem WHERE l_quantity < 0
    """,
    doc="Global aggregate over zero rows yields exactly one row: count 0, "
    "others NULL (reference aggregation.rs:134-146; aggregates2.slt:43-46).",
)
def agg_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 0)
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "agg_group_having",
    oracle=f"""
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS total_spend
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 5 AND {sql_dsum('o_totalprice')} > 100000
    """,
    doc="GROUP BY + HAVING on aggregate expressions (reference plans Filter "
    "above Aggregate, planner/mod.rs:339-348; having.slt:22-46).",
)
def agg_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .where((F.col("n_orders") >= 5) & (F.col("total_spend") > 100000))
    )


@register(
    "agg_passthrough",
    oracle="""
        SELECT c_nationkey, MIN(c_name) AS first_name, COUNT(*) AS n
        FROM customer GROUP BY c_nationkey
    """,
    doc="Reference allows bare non-aggregate projections in aggregate "
    "queries, taking the group's first row (aggregation.rs:78-118; "
    "aggregates2.slt:48-52). Deterministic standard-SQL equivalent: MIN.",
)
def agg_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min("c_name").alias("first_name"), F.count("*").alias("n")
    )


@register(
    "agg_expr_compose",
    oracle=f"""
        SELECT MAX(l_quantity) * 2                        AS max_qty_x2,
               MIN(l_quantity) + MAX(l_quantity)          AS qty_span,
               MAX(l_quantity * l_discount)               AS max_qty_disc,
               {sql_dsum('l_extendedprice * l_discount')} AS sum_disc_amount
        FROM lineitem
    """,
    doc="Expressions of aggregates and aggregates of expressions "
    "(reference planner rewrite to #aggN slots, planner/mod.rs:556-586; "
    "aggregates.slt:13-21).",
)
def agg_expr_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        (F.max("l_quantity") * 2).alias("max_qty_x2"),
        (F.min("l_quantity") + F.max("l_quantity")).alias("qty_span"),
        F.max(F.col("l_quantity") * F.col("l_discount")).alias("max_qty_disc"),
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("sum_disc_amount"),
    )


_TPCH_Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')}                                        AS sum_qty,
           {sql_dsum('l_extendedprice')}                                   AS sum_base_price,
           {sql_ssum('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
           {sql_ssum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
           {sql_davg('l_quantity')}                                        AS avg_qty,
           {sql_davg('l_extendedprice')}                                   AS avg_price,
           {sql_davg('l_discount')}                                        AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@register(
    "tpch_q1",
    oracle=_TPCH_Q1_ORACLE,
    doc="Flagship: TPC-H Q1 pricing summary. Partial+final hash aggregation, "
    "shipdate predicate pushed to the parquet scan. The reference's whole "
    "pipeline (scan->filter->hash agg) in one query at scale.",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.where(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            # Per-row double PRODUCTS go through ssum, not dsum: the
            # double->decimal CAST rounds differently per engine at .5
            # boundaries, and at sf1 row counts one term lands on one
            # (observed: sum_charge off by exactly 1 ulp in the r11 sf1
            # seal). ssum does the 6-decimal rounding in shared IEEE
            # double arithmetic first. Raw-column sums keep dsum.
            ssum(price * (1 - disc)).alias("sum_disc_price"),
            ssum(price * (1 - disc) * (1 + tax)).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_like",
    oracle=f"""
        SELECT l_orderkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-k. "
    "customer join strategy is left to size-based selection + AQE "
    "(customer grows with SF); top-k avoids a "
    "global sort via TakeOrderedAndProject.",
)
def tpch_q3_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q5_like",
    oracle=f"""
        SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-table join with a region filter; dimension chain "
    "broadcasts, fact tables sort-merge on their keys.",
)
def tpch_q5_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


@register(
    "select_no_from",
    oracle="SELECT 1 AS one, 'a' || 'b' AS s, CAST(2.5 * 4 AS DOUBLE) AS x",
    doc="FROM-less SELECT — the reference's Empty operator "
    "(/root/reference/src/executor/empty.rs:8-28, planned at "
    "planner/mod.rs:449-454): one synthetic row feeding the projection.",
)
def select_no_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("SELECT 1 AS one, 'a' || 'b' AS s, CAST(2.5 * 4 AS DOUBLE) AS x")


@register(
    "tpch_q4_like",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: date-windowed orders, EXISTS lineitem with a "
    "non-equi lateness predicate (shipped >90 days after order) -> "
    "LEFT SEMI join, priority rollup. The date filter is pushed to the "
    "orders scan; the semi join carries the extra theta condition.",
)
def tpch_q4_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q10_like",
    oracle=f"""
        SELECT c_custkey, c_name, n_name,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer over a date "
    "window, top 20. Nation broadcasts; top-k via TakeOrderedAndProject "
    "(no global sort).",
)
def tpch_q10_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
