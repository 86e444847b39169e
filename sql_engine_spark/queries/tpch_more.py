"""Remaining TPC-H query shapes (Q7/8/9/11/13/16/17/19/20/21/22 adaptations).

The reference executes only scan/filter/project/BNL-join/hash-agg/limit
(/root/reference/src/planner/mod.rs:202-207 rejects everything else), so none
of these shapes run there; they are the standard-SQL superset (SURVEY.md §2.5)
exercised at full TPC-H complexity: multi-way joins with disjunctive
predicates, correlated and grouped-HAVING subqueries, EXISTS/NOT-EXISTS
decorrelation, and scalar-subquery thresholds.

The driver's synthetic schema lacks partsupp / l_commitdate / l_receiptdate /
c_phone (TESTDATA.md), so those queries are adapted: lineitem stands in as the
part-supplier link, shipped-more-than-60-days-after-order stands in for
receipt-after-commit lateness, and the customer-name digits stand in for the
phone country code. The join/subquery/aggregation *shape* — what Catalyst has
to plan — is preserved.

All double reductions go through DECIMAL(27,6) (functions/numeric.py) so the
results are bit-identical to the DuckDB oracle regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import DEC, dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register


@register(
    "tpch_q7_like",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {sql_dsum('volume')} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping): bidirectional nation-pair trade volume "
    "by ship year. The nation dimension appears twice (supplier side and "
    "customer side) — both broadcast; the disjunctive pair predicate is "
    "applied after the dim joins, and only the two named nations survive "
    "the broadcast-join filters, so the fact shuffle carries a tiny slice.",
)
def tpch_q7_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"))
    )


@register(
    "tpch_q8_like",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                             THEN CAST(volume AS DECIMAL(27,6))
                             ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
               / {sql_dsum('volume')} AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        ) all_nations
        GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share): one nation's share of PROMO-part "
    "revenue sold into ASIA, by order year. Conditional aggregation "
    "(SUM(CASE ...)/SUM(...)) over an 8-table join; numerator and "
    "denominator both reduce in exact decimal, the final ratio is one "
    "double divide so it is bit-stable across partitionings.",
)
def tpch_q8_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("volume").cast(DEC)).otherwise(
            F.lit(0).cast(DEC)
        )
    ).cast("double")
    return base.groupBy("o_year").agg(
        (nation_vol / dsum("volume")).alias("mkt_share")
    )


@register(
    "tpch_q9_like",
    oracle=f"""
        SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
        ) profit
        GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 (product-type profit): per supplier-nation, per order-year "
    "profit on parts matching a name pattern. The synthetic schema has no "
    "partsupp, so p_retailprice * l_quantity stands in for "
    "ps_supplycost * l_quantity as the cost term (same expression shape). "
    "The LIKE-filtered part join is left to size-based selection + AQE "
    "(part grows with SF, so no unconditional broadcast hint); profit is "
    "a per-row double expression reduced in decimal.",
)
def tpch_q9_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
    )


@register(
    "tpch_q11_like",
    oracle=f"""
        WITH nation_lines AS (
            SELECT l_partkey, l_extendedprice
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
        )
        SELECT l_partkey, {sql_dsum('l_extendedprice')} AS part_value
        FROM nation_lines
        GROUP BY l_partkey
        HAVING {sql_dsum('l_extendedprice')} >
               0.001 * (SELECT {sql_dsum('l_extendedprice')} FROM nation_lines)
    """,
    doc="TPC-H Q11 (important stock): per-part value from one nation's "
    "suppliers, kept only when above a fraction of that nation's total — a "
    "scalar subquery threshold in HAVING. lineitem extendedprice stands in "
    "for partsupp supplycost*availqty (no partsupp table). Spark plan: one "
    "shuffle for the per-part aggregate, a broadcast of the single-row "
    "total, and a filter — the base relation is computed once per side "
    "with identical decimal reductions so the 0.001*total boundary is "
    "engine-exact.",
)
def tpch_q11_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", "l_extendedprice")
    )
    per_part = base.groupBy("l_partkey").agg(dsum("l_extendedprice").alias("part_value"))
    total = base.agg(dsum("l_extendedprice").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q13_like",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer distribution): orders-per-customer histogram "
    "including zero-order customers — LEFT OUTER join with an extra "
    "non-join predicate in the ON clause (kept out of WHERE so unmatched "
    "customers survive), then two stacked aggregations. The priority "
    "filter stands in for the original comment NOT LIKE.",
)
def tpch_q13_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q16_like",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship): distinct suppliers per "
    "(brand, type, size) with negated predicates (<>, NOT LIKE, IN-list) "
    "and a NOT IN subquery excluding flagged suppliers (negative balance "
    "stands in for complaint comments; lineitem stands in for partsupp). "
    "NOT IN over a provably non-null key column plans as a broadcast "
    "anti join, not the null-aware variant.",
)
def tpch_q16_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_like",
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND p_type = 'SMALL'
          AND l_quantity < 0.2 * (
              SELECT {sql_dsum('l2.l_quantity')} / COUNT(*)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lines below 20% of their "
    "part's average quantity, for one brand/type. The correlated scalar "
    "AVG decorrelates to a per-part aggregate joined back on partkey "
    "(computed over ALL lineitems, not just the brand slice — the "
    "correlation is on partkey alone). The avg goes through the decimal "
    "reduction so the 0.2*avg comparison boundary is engine-exact.",
)
def tpch_q17_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (dsum("l_quantity") / F.count("*")).alias("aq_avg")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("aq_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("aq_avg"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q19_like",
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (discounted revenue): three disjunctive branches mixing "
    "part-side (brand, size) and lineitem-side (quantity) predicates. "
    "Catalyst extracts the common part-side disjunction "
    "(brand+size ranges) below the join and keeps the cross-table OR as "
    "the join filter; the part join strategy is left to size-based "
    "selection + AQE (part grows with SF).",
)
def tpch_q19_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & qty.between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & qty.between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & qty.between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(branch)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q20_like",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem
              JOIN part ON p_partkey = l_partkey
              WHERE p_name LIKE '%widget%'
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1997-01-01'
              GROUP BY l_suppkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 100)
    """,
    doc="TPC-H Q20 (potential part promotion): suppliers in a region who "
    "shipped more than a threshold quantity of pattern-matched parts in a "
    "year — an IN subquery whose body is itself a join + grouped HAVING "
    "aggregate (lineitem stands in for partsupp availability). Plans as "
    "dim-filtered supplier LEFT SEMI the aggregated shipper list; the "
    "quantity threshold compares in exact decimal.",
)
def tpch_q20_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    shippers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(shippers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "tpch_q21_like",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting): late lines on "
    "finished multi-supplier orders where theirs was the ONLY late "
    "supplier — EXISTS plus NOT EXISTS over self-joined lineitem "
    "(shipped >60 days after order stands in for receipt-after-commit; "
    "no l_receiptdate/l_commitdate in the synthetic schema). The Spark "
    "plan replaces both correlated quantifiers with ONE pass: reduce "
    "lineitem to a (order, supplier, late-line count) aggregate, then "
    "read the per-order supplier/late-supplier counts off an order-"
    "keyed window over that aggregated relation (groups are bounded "
    "by suppliers-per-order). lineitem is scanned ONCE and shuffles "
    "ONCE — the earlier spelling joined the late lines back to a "
    "separately-aggregated per-order relation, scanning and shuffling "
    "the corpus-sized side twice. numwait folds up from the late-line "
    "counts instead of re-counting rows.",
)
def tpch_q21_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "is_late"
        ),
    )
    # Pre-partition by the order key alone: HashPartitioning(l_orderkey)
    # satisfies the clustering of BOTH the (order, supplier) aggregate
    # and the order window, so the corpus crosses the wire exactly once.
    per_supp = (
        lines.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("is_late"), 1).otherwise(0))
            .cast("long")
            .alias("n_late_lines")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_late_supp",
        F.sum(F.when(F.col("n_late_lines") > 0, 1).otherwise(0)).over(w),
    )
    return (
        flagged.where(
            (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
            & (F.col("n_late_lines") > 0)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )


@register(
    "tpch_q22_like",
    oracle=f"""
        SELECT cntrycode, COUNT(*) AS numcust,
               {sql_dsum('c_acctbal')} AS totacctbal
        FROM (
            SELECT substr(c_name, 17, 2) AS cntrycode, c_acctbal
            FROM customer
            WHERE substr(c_name, 17, 2) IN ('00', '17', '25', '31', '42')
              AND c_acctbal > (SELECT {sql_dsum('c_acctbal')} / COUNT(*)
                               FROM customer WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '1999-01-01')
        ) custsale
        GROUP BY cntrycode
    """,
    doc="TPC-H Q22 (global sales opportunity): well-funded customers with "
    "no recent orders, grouped by country code — an uncorrelated scalar "
    "subquery (average positive balance, broadcast single row) plus a "
    "NOT EXISTS anti join against date-filtered orders. The last "
    "customer-name digits stand in for the phone country code and "
    "'no orders since 1999' for 'never ordered' (every synthetic "
    "customer has at least one order); the average goes through the "
    "decimal reduction so the balance cutoff is engine-exact.",
)
def tpch_q22_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    avg_bal = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal") / F.count("*")).alias("avg_bal"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        c.where(F.col("cntrycode").isin("00", "17", "25", "31", "42"))
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_like",
    oracle="""
        WITH ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   MIN(l_extendedprice) AS ps_cost
            FROM lineitem GROUP BY 1, 2
        ),
        eu AS (
            SELECT ps_partkey, ps_cost, s_name, s_acctbal, n_name
            FROM ps
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_cost
        FROM eu JOIN part ON p_partkey = ps_partkey
        WHERE p_size <= 15 AND p_type IN ('STANDARD', 'ECONOMY')
        QUALIFY ps_cost = MIN(ps_cost) OVER (PARTITION BY p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 (min-cost supplier): for each qualifying part, the "
    "EUROPE supplier quoting the minimum cost — the correlated-min "
    "subquery expressed as a window min over the part key (same shuffle "
    "as the decorrelated aggregate+rejoin, one fewer join). lineitem's "
    "per-(part,supplier) MIN(extendedprice) stands in for partsupp "
    "supplycost (no partsupp table); MIN is order-independent so the "
    "equality filter is engine-exact with no decimal detour. nation and "
    "region broadcast (bounded); part and the ps aggregate shuffle on "
    "their join keys and survive any scale-up.",
)
def tpch_q2_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_cost"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & F.col("p_type").isin("STANDARD", "ECONOMY")
    )
    eu = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .withColumn("__min_cost", F.min("ps_cost").over(w))
        .where(F.col("ps_cost") == F.col("__min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q15_like",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): quarterly revenue per supplier (the "
    "view), then the supplier(s) hitting the maximum — a scalar-subquery "
    "equality against an aggregate of the same view. The revenue "
    "aggregate is computed once and reused for both sides (Spark plans "
    "the 1-row max as a broadcast); revenue sums go through exact "
    "DECIMAL(27,6) so the max-equality boundary is engine-exact.",
)
def tpch_q15_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum("volume").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
