"""Coverage extras: grouping sets, pivot, explode/unnest, statistical
aggregates, and an Arrow-batched pandas-UDF stage — all oracle-checked.
Everything here is absent from the reference (SURVEY.md §2.5)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register


@register(
    "grouping_sets_agg",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS with grouping() markers (cube/rollup's "
    "general form; one pass, expanded map-side).",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "pivot_agg",
    oracle=f"""
        SELECT o_orderpriority,
               {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
               {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
               {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
        FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot on order status (explicit value list -> single-pass "
    "conditional aggregation, no extra shuffle vs plain groupBy).",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
    )


@register(
    "explode_word_count",
    oracle=f"""
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest({sql_tokens('text')}) AS word FROM documents)
        GROUP BY word
    """,
    doc="Explode/unnest surface: token explosion + word-count aggregate "
    "(the map side pre-aggregates, so the shuffle carries distinct words).",
)
def explode_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


# Moment-based stats from exact decimal sums, with the SAME double
# arithmetic on both engines. Spark's built-in stddev/corr/covar reduce
# doubles in partition order, so their low bits vary by partitioning and
# can't hash-match an oracle; decimal partial sums are associative, and
# the finishing expression is a fixed IEEE sequence.
# Product moments must multiply in DECIMAL, not double: casting a
# double *product* to decimal rounds its 6th fractional digit, and Spark
# (shortest-string cast) and DuckDB (exact binary expansion) can round a
# borderline product differently. Inputs have ~2 stored decimals, so
# casting THEM to decimal is unambiguous, and the decimal multiply/sum
# is exact in both engines.
# Asymmetric widths: a >18-digit side forces DuckDB onto its int128
# multiply (it overflows int64 otherwise regardless of result width), and
# 19+13+1 = 33 keeps Spark's result precision under 38 so the scale-12
# product is exact in both engines.
_DW = "DECIMAL(19,6)"
_DN = "DECIMAL(13,6)"


# Converting a scale-12 decimal sum (~27 significant digits) straight to
# double is engine-dependent in the last ulp (DuckDB divides
# (double)unscaled by 10^scale — two roundings; Spark rounds once), and
# decimal->decimal(_,0) rounding modes differ too. Split instead: the
# integer part is integral so its scale-0 cast is unambiguous and exact in
# double (< 2^53 here); the fractional part is < 1 and converts with a
# single correctly-rounded division in both engines; one final double add
# is identical IEEE everywhere.
def _exact_double(e: str) -> str:
    return (
        f"CAST(CAST(({e}) - (({e}) % 1) AS DECIMAL(27,0)) AS DOUBLE)"
        f" + CAST(({e}) % 1 AS DOUBLE)"
    )


def _dprod(x: str, y: str) -> str:
    return f"SUM(CAST({x} AS {_DW}) * CAST({y} AS {_DN}))"


# Fully parenthesized: `a * b / c` associates left in Spark but DuckDB
# can evaluate it as a * (b / c), which rounds differently in the last ulp.
_STATS_EXPRS = [
    "sqrt((s2 - ((s * s) / n)) / (n - 1)) AS sd_qty",
    "(s2 - ((s * s) / n)) / (n - 1) AS var_qty",
    "(sxy - ((s * sy) / n)) / sqrt((s2 - ((s * s) / n)) * (sy2 - ((sy * sy) / n)))"
    " AS corr_qty_price",
    "(sxy - ((s * sy) / n)) / (n - 1) AS covar_qty_price",
]
_STATS_FINISH = ",\n               ".join(_STATS_EXPRS)


@register(
    "stats_agg",
    oracle=f"""
        WITH m0 AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {sql_dsum('l_quantity')} AS s,
                   {_dprod('l_quantity', 'l_quantity')} AS s2d,
                   {sql_dsum('l_extendedprice')} AS sy,
                   {_dprod('l_extendedprice', 'l_extendedprice')} AS sy2d,
                   {_dprod('l_quantity', 'l_extendedprice')} AS sxyd
            FROM lineitem GROUP BY l_returnflag
        ),
        m AS (
            SELECT l_returnflag, n, s, sy,
                   {_exact_double('s2d')} AS s2,
                   {_exact_double('sy2d')} AS sy2,
                   {_exact_double('sxyd')} AS sxy
            FROM m0
        )
        SELECT l_returnflag, {_STATS_FINISH} FROM m
    """,
    doc="Statistical aggregates (stddev/variance/correlation/covariance) "
    "as single-pass decimal moments + deterministic double finishing (at "
    "production scale swap in F.stddev_samp/F.corr if bit-stability "
    "across partitionings isn't required).",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qw, qn = F.col("l_quantity").cast(_DW), F.col("l_quantity").cast(_DN)
    pw, pn = F.col("l_extendedprice").cast(_DW), F.col("l_extendedprice").cast(_DN)
    m0 = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum("l_quantity").alias("s"),
        F.sum(qw * qn).alias("s2d"),
        dsum("l_extendedprice").alias("sy"),
        F.sum(pw * pn).alias("sy2d"),
        F.sum(qw * pn).alias("sxyd"),
    )
    m = m0.selectExpr(
        "l_returnflag",
        "n",
        "s",
        "sy",
        f"{_exact_double('s2d')} AS s2",
        f"{_exact_double('sy2d')} AS sy2",
        f"{_exact_double('sxyd')} AS sxy",
    )
    return m.selectExpr("l_returnflag", *_STATS_EXPRS)


def _make_text_udfs():
    """Built lazily: decorating at import time needs a live SparkSession
    (the return type is parsed by the JVM), which callers may not have yet."""

    @pandas_udf("long")
    def digit_count(texts: pd.Series) -> pd.Series:
        return texts.str.count(r"[0-9]").astype("int64")

    @pandas_udf("long")
    def char_count(texts: pd.Series) -> pd.Series:
        return texts.str.len().astype("int64")

    return char_count, digit_count


@register(
    "udf_pandas_textstats",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
        FROM documents
    """,
    doc="Arrow-batched scalar pandas UDFs (char/digit counts) — the "
    "sanctioned Python escape hatch (vectorized, not row-at-a-time), "
    "oracle-checked against pure SQL.",
)
def udf_pandas_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    char_count, digit_count = _make_text_udfs()
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        char_count("text").alias("n_chars"),
        digit_count("text").alias("n_digits"),
    )


@register(
    "udaf_pandas_normalize",
    oracle="""
        WITH g AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
                   MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS mx,
                   COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
            FROM orders
        )
        SELECT o_orderkey, o_custkey,
               (o_totalprice - mn) / (mx - mn) AS norm_price
        FROM g WHERE cnt >= 2 AND mx > mn
    """,
    doc="Grouped-map pandas UDF (applyInPandas): per-customer min-max "
    "normalization. Elementwise IEEE ops, so the Python path is "
    "bit-identical to the SQL window formulation. Degenerate groups "
    "(single order / constant price) are filtered on both sides.",
)
def udaf_pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        if len(pdf) < 2 or mx <= mn:
            return pdf.iloc[0:0][["o_orderkey", "o_custkey"]].assign(norm_price=[])
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "norm_price": (pdf["o_totalprice"] - mn) / (mx - mn),
            }
        )

    return orders.groupBy("o_custkey").applyInPandas(
        normalize, "o_orderkey bigint, o_custkey bigint, norm_price double"
    )


@register(
    "skew_salted_agg",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sum_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type
    """,
    doc="Skew-resistant aggregation: events carry only a handful of "
    "event_type keys (each a hot key at scale), so the first stage "
    "shuffles on (key, salt-of-event_id) across 16 buckets and a second "
    "stage merges ~16 partials per key. Decimal partial sums keep the "
    "two-stage result bit-identical to the single-stage oracle.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.skew import salted_sum_count

    ev = load(spark, sf_dir, "events")
    return salted_sum_count(
        ev, ["event_type"], "value", unique_col="event_id", buckets=16
    )


@register(
    "tpch_q6_like",
    oracle=f"""
        SELECT {_exact_double(_dprod('l_extendedprice', 'l_discount'))} AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure filter + global product-sum. Every predicate "
    "reaches the parquet scan (PushedFilters) and only 4 of 11 columns are "
    "read — the canonical pushdown/pruning showcase.",
)
def tpch_q6_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    filtered = li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = filtered.agg(
        F.sum(F.col("l_extendedprice").cast(_DW) * F.col("l_discount").cast(_DN)).alias(
            "__revd"
        ),
        F.count("*").alias("n"),
    )
    return rev.selectExpr(f"{_exact_double('__revd')} AS revenue", "n")


@register(
    "skew_salted_join",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    doc="Skew-resistant shuffle join: the fact (lineitem) salts on "
    "hash(l_orderkey, l_linenumber) so a hot order spreads over 8 "
    "reducers; the dim (orders) is broadcast-replicated x8 so every "
    "(key, salt) pair finds its match. For when AQE's runtime skew "
    "split isn't enough and the dim is too big to broadcast whole.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    return salted_join(
        li,
        o.select("l_orderkey", "o_orderpriority"),
        "l_orderkey",
        unique_col=["l_orderkey", "l_linenumber"],
        buckets=8,
    ).select("l_orderkey", "l_linenumber", "l_quantity", "o_orderpriority")


@register(
    "array_higher_order",
    oracle="""
        SELECT vec_id,
               len(embedding)                                   AS dim,
               embedding[1]                                     AS first_elem,
               list_max(embedding)                              AS max_elem,
               list_min(embedding)                              AS min_elem,
               len(list_filter(embedding, x -> x > 0))          AS n_positive,
               list_max(list_transform(embedding, x -> -x))     AS neg_min
        FROM embeddings
    """,
    doc="Array / higher-order functions over array<float> embeddings: "
    "size, element_at, array_min/max, filter-count, transform-then-max. "
    "All comparisons and negation are IEEE-exact so float32 results are "
    "bit-identical cross-engine. Everything runs JVM-side inside "
    "whole-stage codegen — no UDFs for per-element array work.",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).cast("long").alias("dim"),
        F.element_at(e, 1).alias("first_elem"),
        F.array_max(e).alias("max_elem"),
        F.array_min(e).alias("min_elem"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.array_max(F.transform(e, lambda x: -x)).alias("neg_min"),
    )


@register(
    "percentile_agg",
    oracle="""
        SELECT l_returnflag,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity)      AS median_qty,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS price_p25,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS price_p75
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (median / quartiles) per group. "
    "Spark's percentile() and DuckDB's percentile_cont use the same "
    "linear-interpolation formula, bit-identical on this data. At 100 TB "
    "swap to approx_percentile (t-digest sketch, single pass, bounded "
    "state) — exact percentile needs the full sorted group.",
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("price_p25"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("price_p75"),
    )


@register(
    "tpch_q18_like",
    oracle=f"""
        SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        FROM (SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING {sql_dsum('l_quantity')} > 250) big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): HAVING on a grouped "
    "sum, then join the surviving keys back through orders to customer. "
    "The aggregate runs FIRST so only ~0.2% of orderkeys enter the joins; "
    "customer is broadcast.",
)
def tpch_q18_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "map_functions",
    oracle="""
        SELECT l_returnflag,
               COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END)     AS n_O,
               COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END)     AS n_F,
               2 * COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_O_doubled,
               COUNT(DISTINCT l_linestatus)                       AS n_statuses
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="MapType surface: per-flag status->count map built with "
    "map_from_entries(collect_list(struct)), read back via element_at / "
    "transform_values / map_keys. The oracle states the same facts as "
    "conditional counts (DuckDB MAPs don't hash-compare cross-engine).",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))
    m = counts.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linestatus", "cnt")))
        ).alias("m")
    )
    doubled = F.transform_values("m", lambda _, v: v * 2)
    return m.select(
        "l_returnflag",
        F.coalesce(F.element_at("m", F.lit("O")), F.lit(0)).alias("n_O"),
        F.coalesce(F.element_at("m", F.lit("F")), F.lit(0)).alias("n_F"),
        F.coalesce(F.element_at(doubled, F.lit("O")), F.lit(0)).alias("n_O_doubled"),
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_statuses"),
    )


@register(
    "udtf_split_words",
    oracle="""
        WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        SELECT doc_id, unnest(ws) AS word,
               CAST(generate_subscripts(ws, 1) - 1 AS INT) AS pos
        FROM s
    """,
    doc="Python UDTF (table function): one output row per word with its "
    "position, invoked via LATERAL. Completes the UDF/UDAF/UDTF surface "
    "(reference has none). Row-at-a-time Python — fine for a surface "
    "demo; the hot-path equivalent is posexplode(split(...)), pure JVM.",
)
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.word, s.pos FROM __udtf_docs d, LATERAL split_words(d.text) s"
    )


@register(
    "tpch_q12_like",
    oracle="""
        SELECT l_linestatus,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
        GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: join + conditional (CASE-gated) counts per "
    "group. The lineitem date filter is pushed to the scan before the "
    "join.",
)
def tpch_q12_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_like",
    oracle=f"""
        SELECT 100.00 * promo / total AS promo_revenue_pct,
               promo AS promo_revenue, total AS total_revenue
        FROM (
            SELECT {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo,
                   {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-07-01'
        )
    """,
    doc="TPC-H Q14 shape (promotion revenue share): broadcast join to "
    "part, conditional revenue sums through the exact decimal reduction, "
    "final ratio in double (single IEEE division, engine-stable).",
)
def tpch_q14_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias("promo"),
            dsum(rev).alias("total"),
        )
    )
    return agg.select(
        (100.0 * F.col("promo") / F.col("total")).alias("promo_revenue_pct"),
        F.col("promo").alias("promo_revenue"),
        F.col("total").alias("total_revenue"),
    )


@register(
    "approx_quantile_check",
    oracle="""
        SELECT l_returnflag,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS exact_median,
               TRUE AS approx_within_1pct
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile sketch (single pass, bounded memory — the "
    "100 TB path; exact percentile needs a per-group sort) validated "
    "against the exact interpolated percentile. Sketch output itself "
    "is partitioning-dependent, so the oracle-hashed claim is the "
    "deterministic boolean 'within 1% of exact' (same pattern as "
    "approx_count_distinct).",
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    exact = F.expr("percentile(l_extendedprice, 0.5D)")
    approx = F.expr("approx_percentile(l_extendedprice, 0.5D, 10000)")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_median"),
        (F.abs(approx - exact) <= 0.01 * F.abs(exact)).alias("approx_within_1pct"),
    )


@register(
    "array_set_funcs",
    oracle="""
        WITH sets AS (
            SELECT l_orderkey,
                   COALESCE(list_sort(array_agg(DISTINCT l_linenumber)
                            FILTER (WHERE l_quantity > 25)), []) AS hi,
                   COALESCE(list_sort(array_agg(DISTINCT l_linenumber)
                            FILTER (WHERE l_discount > 0.05)), []) AS disc
            FROM lineitem GROUP BY l_orderkey
        )
        -- COALESCE: duckdb array_to_string([]) is NULL, Spark concat_ws is ''
        SELECT l_orderkey,
               COALESCE(array_to_string(hi, ','), '')   AS hi,
               COALESCE(array_to_string(disc, ','), '') AS disc,
               COALESCE(array_to_string(list_sort(list_intersect(hi, disc)), ','), '')
                                          AS both_sets,
               COALESCE(array_to_string(list_sort(list_distinct(list_concat(hi, disc))), ','), '')
                                          AS either_set,
               COALESCE(array_to_string(
                   list_sort(list_filter(hi, x -> NOT list_contains(disc, x))), ','), '')
                                          AS hi_only
        FROM sets
    """,
    doc="Array set algebra (intersect / union / except) over per-group "
    "collected sets; results sorted so they are order-canonical, then "
    "emitted as CSV strings (the driver harness canonicalizes results "
    "with a pandas sort, which cannot hash list cells). One shuffle "
    "(the collect_set aggregate); the set ops are per-row map work.",
)
def array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def csv(col) -> F.Column:
        return F.concat_ws(",", F.transform(col, lambda x: x.cast("string")))

    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_set(F.when(F.col("l_quantity") > 25, F.col("l_linenumber")))
        ).alias("hi"),
        F.sort_array(
            F.collect_set(F.when(F.col("l_discount") > 0.05, F.col("l_linenumber")))
        ).alias("disc"),
    )
    return sets.select(
        "l_orderkey",
        csv(F.col("hi")).alias("hi"),
        csv(F.col("disc")).alias("disc"),
        csv(F.sort_array(F.array_intersect("hi", "disc"))).alias("both_sets"),
        csv(F.sort_array(F.array_union("hi", "disc"))).alias("either_set"),
        csv(F.sort_array(F.array_except("hi", "disc"))).alias("hi_only"),
    )


def _profile_branch(df, col, kind):
    num = F.col(col).cast("double") if kind == "num" else F.lit(None).cast("double")
    return df.agg(
        F.lit(col).alias("col_name"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
        F.countDistinct(col).cast("long").alias("ndv"),
        F.min(num).alias("min_num"),
        F.max(num).alias("max_num"),
    )


@register(
    "stats_column_profile",
    oracle="""
        SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_num
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*), SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
               COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS DOUBLE),
               CAST(MAX(o_custkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(*), SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
               COUNT(DISTINCT o_totalprice), CAST(MIN(o_totalprice) AS DOUBLE),
               CAST(MAX(o_totalprice) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
               COUNT(DISTINCT o_orderstatus), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM orders
    """,
    doc="ANALYZE-style column statistics (n_rows / null count / exact "
    "NDV / numeric min-max) — the optimizer-stats builder behind CBO "
    "join ordering and broadcast decisions. One aggregate branch per "
    "column, each pruned to a single parquet column read (no "
    "multi-distinct Expand blowup of a combined pass); at production "
    "scale swap exact COUNT(DISTINCT) for approx_count_distinct — "
    "exact here so the oracle hash-matches.",
)
def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    branches = [
        _profile_branch(o, "o_orderkey", "num"),
        _profile_branch(o, "o_custkey", "num"),
        _profile_branch(o, "o_totalprice", "num"),
        _profile_branch(o, "o_orderstatus", "str"),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
