"""Standard-SQL superset operators (SURVEY.md §2.5 absence matrix).

Everything here is absent from the reference — ORDER BY/OFFSET are literal
placeholder comments (/root/reference/src/planner/mod.rs:193-195), DISTINCT,
outer/semi/anti joins, set ops, subqueries, CASE/IN/BETWEEN/LIKE/CAST and
every scalar function are rejected (planner/mod.rs:418,501;
executor/expression.rs:48-52). All are first-class here.

Oracle-exactness notes: CAST(double AS INT) rounds in DuckDB but truncates
in Spark, so numeric narrowing uses explicit FLOOR/CEIL; math functions are
restricted to IEEE-exact ones (abs/sqrt/floor/ceil/sign) — ln/exp differ by
ulps between libm implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register


@register(
    "order_by_offset",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 15 OFFSET 5
    """,
    doc="ORDER BY + LIMIT + OFFSET (reference: placeholder comments only, "
    "planner/mod.rs:193-195).",
)
def order_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .offset(5)
        .limit(15)
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT (absent in reference). Plans as a hash aggregate with "
    "map-side partial dedup.",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "count_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey)  AS n_suppliers,
               COUNT(DISTINCT l_partkey)  AS n_parts
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multiple COUNT(DISTINCT) per group (absent in reference; Spark "
    "plans expand + two-phase aggregation).",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


@register(
    "setop_union_all",
    oracle="""
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    doc="UNION ALL (reference rejects set expressions, planner/mod.rs:202).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionAll(s)


@register(
    "setop_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
        SELECT n_nationkey AS nationkey FROM nation
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (distinct semantics): nations with no supplier.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.subtract(s)  # subtract == set-EXCEPT (distinct) semantics


@register(
    "setop_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct semantics): set union deduplicates across both "
    "sides — plans as union-all + hash aggregate.",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "unpivot_stack",
    oracle="""
        WITH agg AS (
            SELECT l_returnflag,
                   COUNT(*)                  AS n_rows,
                   COUNT(DISTINCT l_partkey) AS n_parts,
                   COUNT(DISTINCT l_suppkey) AS n_supp
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'n_parts', n_parts FROM agg
        UNION ALL
        SELECT l_returnflag, 'n_supp', n_supp FROM agg
    """,
    doc="UNPIVOT / melt: wide aggregate row -> long (metric, value) rows. "
    "Spark plans an Expand node (no shuffle beyond the aggregate); exact "
    "bigint measures keep it cross-engine hashable.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supp"),
        )
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["n_rows", "n_parts", "n_supp"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "merge_upsert_latest",
    oracle="""
        WITH snap AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version FROM orders
        ),
        upd AS (
            SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
                   1 AS version
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        ins AS (
            SELECT o_orderkey + 1000000000 AS o_orderkey, 'N' AS o_orderstatus,
                   100.0 AS o_totalprice, 1 AS version
            FROM orders WHERE o_orderkey % 97 = 0
        ),
        all_rows AS (
            SELECT * FROM snap UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(version AS BIGINT) AS version
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                           ORDER BY version DESC) AS rn
              FROM all_rows)
        WHERE rn = 1
    """,
    doc="MERGE/CDC upsert as a pure-relational plan: snapshot UNION ALL "
    "change-batch (updates + inserts), then per-key latest-version-wins "
    "via row_number — the standard Delta/Hudi merge shape, one shuffle "
    "on the merge key. The change batch is derived deterministically "
    "from orders so the oracle replays it exactly.",
)
def merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap = orders.withColumn("version", F.lit(0))
    upd = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
            F.lit(1).alias("version"),
        )
    )
    ins = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .select(
            (F.col("o_orderkey") + F.lit(1000000000)).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
            F.lit(1).alias("version"),
        )
    )
    merged = snap.unionByName(upd).unionByName(ins)
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", F.col("version").cast("long").alias("version"))
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT p_partkey, COUNT(l_orderkey) AS n_lineitems,
               COUNT(*) AS n_rows, MAX(l_quantity) AS max_qty
        FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
        GROUP BY p_partkey
    """,
    doc="LEFT OUTER join preserving unmatched parts (reference: 'Only INNER "
    "JOIN supported', planner/mod.rs:501); NULL-skipping COUNT(col) vs "
    "COUNT(*) distinguishes the null-extended rows.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left")
        .groupBy("p_partkey")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.count("*").alias("n_rows"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
               c.n_cust, s.n_supp
        FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
              FROM customer GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
                   FROM supplier GROUP BY s_nationkey) s
          ON c.nationkey = s.nationkey
    """,
    doc="FULL OUTER join of per-nation customer/supplier counts.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "nationkey", "full").select(
        "nationkey", "n_cust", "n_supp"
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="LEFT SEMI join / EXISTS: customers with at least one big order.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    doc="LEFT ANTI join / NOT EXISTS: parts never ordered.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


@register(
    "join_right_outer",
    oracle="""
        SELECT p_partkey, COUNT(l_orderkey) AS n_lineitems,
               COUNT(*) AS n_rows, MAX(l_quantity) AS max_qty
        FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey
    """,
    doc="RIGHT OUTER join preserving unmatched parts (mirror of "
    "join_left_outer; reference rejects all outer joins, "
    "planner/mod.rs:501).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.count("*").alias("n_rows"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


@register(
    "subquery_exists_agg",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS feeding an aggregate. Catalyst "
    "decorrelates to a left-semi join; the semi side is pre-filtered so "
    "only matching lineitem rows shuffle.",
)
def subquery_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "subquery_correlated_scalar",
    oracle="""
        SELECT l1.l_partkey, l1.l_orderkey, l1.l_linenumber, l1.l_extendedprice
        FROM lineitem l1
        WHERE l1.l_extendedprice =
              (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
               WHERE l2.l_partkey = l1.l_partkey)
    """,
    doc="TPC-H Q2/Q17 shape: correlated scalar subquery (cheapest lineitem "
    "per part). Planned as the standard decorrelation — a min-per-key "
    "aggregate joined back to the fact on the correlation key, which is "
    "exactly how Catalyst rewrites the SQL form. MIN is exact (no float "
    "reduction-order hazard).",
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    min_per_part = li.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("mp_min_price")
    )
    return (
        li.join(
            min_per_part,
            (li.l_partkey == F.col("mp_partkey"))
            & (li.l_extendedprice == F.col("mp_min_price")),
        )
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "approx_count_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts_exact,
               TRUE AS approx_within_15pct
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="HyperLogLog++ sketch (approx_count_distinct, rsd=0.05) checked "
    "against the exact distinct count: the oracle-hashed claim is that the "
    "sketch lands within 15% of truth. At 100 TB the sketch is the only "
    "option — single pass, fixed-size state, no expand/dedup shuffle.",
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts_exact"),
            F.approx_count_distinct("l_partkey", rsd=0.05).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "n_parts_exact",
            (
                F.abs(F.col("__approx") - F.col("n_parts_exact"))
                <= 0.15 * F.col("n_parts_exact")
            ).alias("approx_within_15pct"),
        )
    )


@register(
    "subquery_scalar",
    oracle=f"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 2 * (SELECT {sql_dsum('o_totalprice')} / COUNT(*) FROM orders)
    """,
    doc="Scalar subquery in WHERE (absent in reference). The subquery uses "
    "the exact decimal average so the predicate boundary is engine-stable.",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    avg_row = o.agg((dsum("o_totalprice") / F.count("*")).alias("a"))
    return o.join(F.broadcast(avg_row)).where(
        F.col("o_totalprice") > 2 * F.col("a")
    ).select("o_orderkey", "o_totalprice")


@register(
    "subquery_in",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
    """,
    doc="IN subquery (plans as left-semi join; customer grows with SF, so "
    "the strategy is left to size-based selection + AQE rather than an "
    "unconditional broadcast hint).",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    return o.join(
        c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderstatus")


@register(
    "cte_query",
    oracle=f"""
        WITH supplier_revenue AS (
            SELECT l_suppkey,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, revenue
        FROM supplier JOIN supplier_revenue ON s_suppkey = l_suppkey
        ORDER BY revenue DESC, s_suppkey
        LIMIT 5
    """,
    doc="CTE + join + top-k (TPC-H Q15 shape; reference has no subquery/CTE "
    "support at all).",
)
def cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .select("s_suppkey", "s_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("s_suppkey"))
        .limit(5)
    )


@register(
    "rollup_agg",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets with GROUPING() disambiguation (absent in "
    "reference; Spark plans a single Expand + hash agg).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")
            ).cast("long").alias("gid"),
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "cube_agg",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n, {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets.",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


@register(
    "case_in_between_like",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END                       AS price_band,
               o_orderstatus IN ('F', 'P')                 AS is_done_or_partial,
               o_totalprice BETWEEN 100000 AND 150000      AS in_band,
               o_orderpriority LIKE '1-%'                  AS is_urgent,
               o_custkey IS NULL                           AS cust_missing
        FROM orders
    """,
    doc="CASE / IN / BETWEEN / LIKE / IS NULL — all 'Unsupported expression' "
    "in the reference (executor/expression.rs:48-52).",
)
def case_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price < 50000, "small")
        .when(price < 200000, "medium")
        .otherwise("large")
        .alias("price_band"),
        F.col("o_orderstatus").isin("F", "P").alias("is_done_or_partial"),
        price.between(100000, 150000).alias("in_band"),
        F.col("o_orderpriority").like("1-%").alias("is_urgent"),
        F.col("o_custkey").isNull().alias("cust_missing"),
    )


@register(
    "scalar_string_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name)                       AS name_upper,
               lower(c_mktsegment)                 AS seg_lower,
               length(c_name)                      AS name_len,
               substr(c_name, 1, 8)                AS name_prefix,
               trim(c_mktsegment)                  AS seg_trim,
               replace(c_name, '#', '-')           AS name_dashed,
               reverse(c_mktsegment)               AS seg_rev,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
               concat_ws('|', c_name, c_mktsegment)     AS joined,
               strpos(c_name, '1')                 AS pos_one
        FROM customer
    """,
    doc="String function library (reference has zero scalar functions, "
    "planner/mod.rs:561-569).",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.instr(F.col("c_name"), "1").cast("long").alias("pos_one"),
    )


@register(
    "scalar_datetime_funcs",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                              AS y,
               month(o_orderdate)                             AS m,
               day(o_orderdate)                               AS d,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(o_orderdate AS DATE)                      AS order_date,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
        FROM orders
    """,
    doc="Datetime functions over timestamp_ntz (tz-independent on both "
    "engines; the reference reads timestamps but cannot touch them, "
    "SURVEY.md §1.2).",
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("long").alias("y"),
        F.month(od).cast("long").alias("m"),
        F.dayofmonth(od).cast("long").alias("d"),
        F.date_trunc("month", od).cast("timestamp_ntz").alias("month_start"),
        od.cast("date").alias("order_date"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05)          AS abs_disc,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
               CAST(ceil(l_quantity / 7) AS BIGINT)          AS qty_ceil,
               sqrt(l_extendedprice)                         AS price_sqrt,
               CAST(sign(l_discount - 0.05) AS DOUBLE)       AS disc_sign,
               greatest(l_quantity, 25.0)      AS qty_hi,
               least(l_tax, 0.04)              AS tax_lo,
               round(l_extendedprice, 1)       AS price_round
        FROM lineitem
    """,
    doc="Math functions, restricted to IEEE-exact operations so results are "
    "bit-identical across engines (ln/exp/pow differ by ulps across libm).",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_lo"),
        F.round(F.col("l_extendedprice"), 1).alias("price_round"),
    )


@register(
    "cast_types",
    oracle="""
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice) AS BIGINT)  AS price_floor_int,
               CAST(o_orderkey AS VARCHAR)          AS key_str,
               CAST(o_orderkey AS DOUBLE)           AS key_dbl,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
        FROM orders
    """,
    doc="CAST surface (reference: internal-only Caster used by avg, "
    "expression.rs:263-307). double->int goes through FLOOR because raw "
    "CAST rounds in DuckDB but truncates in Spark.",
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_floor_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@register(
    "collect_sorted_agg",
    oracle="""
        SELECT l_returnflag,
               array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
                   AS statuses,
               array_to_string(list_sort(list(DISTINCT CAST(l_linenumber AS BIGINT))), ',')
                   AS linenums
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Array-building aggregates: collect_set made deterministic by "
    "sort_array (collect order is partition-dependent; the sorted set is "
    "a pure function of the data). The sorted arrays are emitted as CSV "
    "strings: the driver harness canonicalizes results with a pandas sort, "
    "which cannot hash list-typed cells.",
)
def collect_sorted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_set(F.col("l_linenumber").cast("long"))),
                lambda x: x.cast("string"),
            ),
        ).alias("linenums"),
    )


@register(
    "scalar_conditional_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               COALESCE(NULLIF(l_returnflag, 'N'), 'none')   AS flag_or_none,
               NULLIF(l_quantity, 1.0)                       AS qty_or_null,
               IFNULL(NULLIF(l_linestatus, 'O'), 'open')     AS status_or_open,
               GREATEST(l_quantity, l_discount * 100)        AS g,
               LEAST(l_tax, l_discount)                      AS l
        FROM lineitem
    """,
    doc="Conditional scalar functions (COALESCE / NULLIF / IFNULL / "
    "GREATEST / LEAST) — NULLs synthesized via NULLIF since the data has "
    "none. Pure per-row map work, no shuffle.",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.nullif("l_quantity", F.lit(1.0)).alias("qty_or_null"),
        F.ifnull(F.nullif("l_linestatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest("l_quantity", F.col("l_discount") * 100).alias("g"),
        F.least("l_tax", "l_discount").alias("l"),
    )


@register(
    "join_null_aware_anti",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (
            SELECT nullif(o_custkey, -1) FROM orders
            WHERE o_orderstatus = 'F' AND o_totalprice > 200000
        )
    """,
    doc="NOT IN with a NULLABLE probe column — the null-aware anti join. "
    "Standard 3VL: one NULL in the IN-list empties the result, so the "
    "planner cannot use a plain hash anti join; Spark plans a "
    "null-aware anti join (broadcast) for exactly this shape. The "
    "nullability here comes from nullif (never fires on this data) — "
    "the point is the PLAN and the semantics contract, pinned against "
    "the identical standard-SQL oracle. Scale note: Spark requires the "
    "build side broadcastable for null-aware anti joins; for a "
    "corpus-sized probe set, rewrite to NOT EXISTS (join_anti) — the "
    "engine-recommended spelling, which plans as a shuffled anti join.",
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    c.createOrReplaceTempView("__naa_customer")
    o.createOrReplaceTempView("__naa_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM __naa_customer
        WHERE c_custkey NOT IN (
            SELECT nullif(o_custkey, -1) FROM __naa_orders
            WHERE o_orderstatus = 'F' AND o_totalprice > 200000
        )
        """
    )


@register(
    "scan_zonemap_prune",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice BETWEEN 100000 AND 200000
    """,
    doc="Zone-map file skipping (the Delta/Iceberg data-skipping "
    "posture, operators/zonemap.py): per-file min/max stats read from "
    "PARQUET FOOTERS driver-side (pyarrow metadata — zero row reads, "
    "no Spark job; round-4 review retired the scan-based stats build) "
    "prune whole files before the scan is planned; the row filter "
    "re-applies on the survivors, so the result is definitionally the "
    "plain filtered scan — which is what the oracle checks. The file "
    "list is metadata-bounded (file count), the same thing a table "
    "format's planner reads from its log. tests/test_r4b_ops.py drives "
    "the actual multi-file skip; tests/test_r5_fixes.py pins "
    "footer-stats == full-scan-stats and the no-scan stats build.",
)
def scan_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.zonemap import pruned_read

    df, _kept, _total = pruned_read(
        spark, f"{sf_dir}/orders.parquet", "o_totalprice", 100000, 200000
    )
    return df.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "approx_hll_mergeable_rollup",
    oracle="""
        SELECT lang,
               CAST(COUNT(DISTINCT text) AS BIGINT) AS n_texts_exact,
               CAST((SELECT COUNT(DISTINCT source) FROM documents) AS BIGINT)
                   AS n_sketches_merged,
               TRUE AS approx_within_10pct
        FROM documents GROUP BY lang
    """,
    doc="Mergeable-sketch rollup (DataSketches HLL): one fixed-size "
    "sketch of distinct texts per (source, lang) group, then "
    "hll_union_agg merges the per-source sketches into per-lang "
    "estimates WITHOUT re-reading rows — the pre-aggregated-rollup "
    "pattern that makes 100 TB distinct-count dashboards one sketch "
    "table instead of one corpus pass per question. HLL registers are "
    "per-bucket maxima, so the merged estimate is order- and "
    "partitioning-independent; the oracle-hashed claim is the exact "
    "NDV plus the estimate landing within 10%.",
)
def approx_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source", "lang").agg(
        F.hll_sketch_agg(F.xxhash64("text")).alias("__sk")
    )
    n_sketches = docs.select(F.countDistinct("source").cast("long").alias("__nsk"))
    merged = (
        per_source.groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__approx"))
    )
    exact = docs.groupBy("lang").agg(
        F.countDistinct("text").cast("long").alias("n_texts_exact")
    )
    return (
        exact.join(merged, "lang")
        .crossJoin(F.broadcast(n_sketches))
        .select(
            "lang",
            "n_texts_exact",
            F.col("__nsk").alias("n_sketches_merged"),
            (
                F.abs(F.col("__approx") - F.col("n_texts_exact"))
                <= 0.10 * F.col("n_texts_exact")
            ).alias("approx_within_10pct"),
        )
    )
