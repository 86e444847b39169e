"""Second round of standard-SQL-superset surface: LATERAL correlated
subqueries, inline VALUES relations, struct construction/access, and
sequence packing for training-data pipelines.

None of this parses in the reference (single SELECT over parquet paths only,
/root/reference/src/planner/mod.rs:202-207); all of it is first-class in
Spark SQL / DataFrame and in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register


@register(
    "join_lateral_topn",
    oracle="""
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM nation
        JOIN LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t ON TRUE
    """,
    doc="LATERAL correlated subquery with ORDER BY + LIMIT: the two "
    "richest customers per nation, written as a per-row dependent "
    "subquery rather than a window. Spark decorrelates the lateral "
    "into a ranked window join under the hood — same single shuffle "
    "as the explicit row_number() formulation, so the convenient "
    "surface costs nothing at scale.",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("__lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    return spark.sql(
        """
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM __lat_nation
        JOIN LATERAL (
            SELECT c_custkey, c_acctbal FROM __lat_customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
        """
    )


@register(
    "values_inline_dim",
    oracle="""
        SELECT urgency, COUNT(*) AS n_orders
        FROM orders
        JOIN (VALUES ('1-URGENT',        'rush'),
                     ('2-HIGH',          'rush'),
                     ('3-MEDIUM',        'normal'),
                     ('4-NOT SPECIFIED', 'normal'),
                     ('5-LOW',           'lax')) AS m(prio, urgency)
          ON o_orderpriority = m.prio
        GROUP BY urgency
    """,
    doc="Inline VALUES relation as a join dimension: a literal "
    "priority -> urgency mapping broadcast against the fact table — the "
    "zero-I/O version of a lookup-table join (the reference can only "
    "address parquet files as relations, planner/mod.rs:508-535).",
)
def values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    m = spark.sql(
        """
        SELECT * FROM VALUES ('1-URGENT',        'rush'),
                             ('2-HIGH',          'rush'),
                             ('3-MEDIUM',        'normal'),
                             ('4-NOT SPECIFIED', 'normal'),
                             ('5-LOW',           'lax') AS m(prio, urgency)
        """
    )
    return (
        o.join(F.broadcast(m), o.o_orderpriority == m.prio)
        .groupBy("urgency")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "nested_struct_funcs",
    oracle="""
        SELECT o_orderkey,
               (struct_pack(status := o_orderstatus,
                            price  := o_totalprice)).status       AS s_status,
               (struct_pack(status := o_orderstatus,
                            price  := o_totalprice)).price * 2    AS s_price_x2,
               struct_pack(a := o_orderstatus)
                 = struct_pack(a := o_orderpriority)              AS structs_equal,
               (struct_pack(lo := least(o_totalprice, 100000.0),
                            hi := greatest(o_totalprice, 100000.0))).hi
                 - (struct_pack(lo := least(o_totalprice, 100000.0),
                                hi := greatest(o_totalprice, 100000.0))).lo
                                                                  AS band_width
        FROM orders
    """,
    doc="Struct (nested row) construction, field access, and whole-struct "
    "equality — per-row JVM expressions; the struct never widens the "
    "shuffle because Catalyst prunes unaccessed fields "
    "(the reference's type system has no nested values at all, "
    "SURVEY.md §1.2).",
)
def nested_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    sp = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    band = F.struct(
        F.least("o_totalprice", F.lit(100000.0)).alias("lo"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("hi"),
    )
    return o.select(
        "o_orderkey",
        sp.getField("status").alias("s_status"),
        (sp.getField("price") * 2).alias("s_price_x2"),
        (
            F.struct(F.col("o_orderstatus").alias("a"))
            == F.struct(F.col("o_orderpriority").alias("a"))
        ).alias("structs_equal"),
        (band.getField("hi") - band.getField("lo")).alias("band_width"),
    )


_PACK_BUDGET = 512


@register(
    "text_pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tok
            FROM documents
        ),
        cum AS (
            SELECT *,
                   SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum_tok
            FROM toks
        )
        SELECT source,
               CAST(FLOOR((cum_tok - n_tok) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
               COUNT(*)       AS n_docs,
               SUM(n_tok)     AS pack_tokens,
               MIN(doc_id)    AS first_doc,
               MAX(doc_id)    AS last_doc
        FROM cum
        GROUP BY source, pack_id
    """,
    doc="Sequence packing (concat-and-chunk): documents are concatenated "
    "per source in doc_id order and split into fixed token-budget "
    "contexts; each doc lands in the pack where its first token falls — "
    "the standard pretraining batch-packing layout. The running token "
    "total is a two-level (bucketed) prefix scan: per-source doc_id "
    "bounds (a tiny broadcast aggregate) range-bucket the ids, the "
    "widest window is partitioned by (source, bucket) — width sources x "
    "buckets, never one task per source — and the cross-bucket carry is "
    "prefix-summed over per-bucket totals and broadcast back. The "
    "result is bucket-count-independent (integer sums); the token count "
    "is the same whitespace tokenizer as the text_* queries.",
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.prefix import bucketed_running_sum, range_bucket

    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    # Per-source id bounds for the range bucketing: a tiny aggregate over
    # a two-column scan (no tokenize on this branch), broadcast back.
    bounds = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
    )
    n_buckets = max(spark.sparkContext.defaultParallelism, 16)
    docs = docs.join(F.broadcast(bounds), "source")
    out = bucketed_running_sum(
        docs,
        part_cols=["source"],
        order_col="doc_id",
        value_col="n_tok",
        bucket=range_bucket("doc_id", F.col("__mn"), F.col("__mx"), n_buckets),
        out_col="cum_tok",
    ).drop("__mn", "__mx")
    return (
        out.withColumn(
            "pack_id",
            F.floor((F.col("cum_tok") - F.col("n_tok")) / F.lit(float(_PACK_BUDGET))),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "scd2_intervals",
    oracle="""
        SELECT o_custkey, o_orderkey,
               o_totalprice AS attr_price,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS valid_to,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) IS NULL
                   AS is_current
        FROM orders
    """,
    doc="Slowly-changing-dimension type-2 history build: each customer's "
    "orders become validity intervals ([valid_from, valid_to), NULL-open "
    "and flagged current for the latest) via lead() over a TOTAL "
    "per-customer order — the standard warehouse pattern for turning a "
    "change log into point-in-time joinable history. One shuffle keyed "
    "by the dimension's natural key; window width is one customer's "
    "history, never a global sort.",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").alias("attr_price"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "asof_point_in_time",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
               prev.k AS prev_orderkey, prev.p AS prev_price,
               prev.k IS NOT NULL AS has_history
        FROM orders o LEFT JOIN LATERAL (
            SELECT i.o_orderkey AS k, i.o_totalprice AS p
            FROM orders i
            WHERE i.o_custkey = o.o_custkey AND i.o_orderdate < o.o_orderdate
            ORDER BY i.o_orderdate DESC, i.o_orderkey DESC
            LIMIT 1
        ) prev ON TRUE
    """,
    doc="Point-in-time feature join (the feature-store correctness "
    "primitive): every order labeled with the same customer's latest "
    "STRICTLY-EARLIER order's attributes — no same-day leakage, exactly "
    "the 'features as known before the label event' contract a training "
    "pipeline must honor. Spelled as the union+ordered-window as-of "
    "join (operators/asof.py: one shuffle on the entity key, per-key "
    "window) with the strict inequality encoded by shifting the label "
    "date one day back; ties inside a day break to the greatest "
    "(orderkey) deterministically. The oracle is the naive LATERAL "
    "top-1 — quadratic per key, which is exactly why the engine side "
    "doesn't plan it that way.",
)
def asof_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    orders = load(spark, sf_dir, "orders")
    labels = orders.select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).withColumn("__asof", F.date_sub("o_orderdate", 1))
    hist = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("h_date"),
        F.col("o_orderkey").alias("h_orderkey"),
        F.col("o_totalprice").alias("h_price"),
    )
    res = asof_join(
        labels,
        hist,
        key="o_custkey",
        left_ts="__asof",
        right_ts="h_date",
        right_payload=["h_orderkey", "h_price"],
    )
    return res.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_h_orderkey").alias("prev_orderkey"),
        F.col("asof_h_price").alias("prev_price"),
        F.col("asof_h_orderkey").isNotNull().alias("has_history"),
    )
