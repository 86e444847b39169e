"""Round-7 feature-engineering operators for model-training pipelines:
smoothed target encoding (Micci-Barreca, SIGKDD Explorations 2001 —
the m-estimate shrinkage of per-category target means toward the
global mean), its leakage-free out-of-fold variant (cross-fitting:
each fold's encoding is computed from the OTHER folds only, the
standard defense against target leakage in stacked models), and a
token-vocabulary index build with an OOV bucket (the distributed
StringIndexer primitive behind any fixed-vocabulary featurizer).

Determinism: per-category target sums go through DECIMAL(27,6)
(functions/numeric conventions) and stay decimal across the
fold-subtraction so the out-of-fold numerator is exact; folds are
md5-nibble derived (shared spelling, no RNG); the encodings are then
single double divisions of deterministic operands. Vocabulary top-k
uses the total (count DESC, token ASC) order so the cut is unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import DEC
from sql_engine_spark.io import load
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

_M = "100.0"  # m-estimate smoothing strength (pseudo-observations)

_SQL_GMEAN = (
    "SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)"
    " / COUNT(*) AS gmean FROM orders"
)


@register(
    "feature_target_encode_smoothed",
    oracle=f"""
        WITH gstats AS ({_SQL_GMEAN}),
        c AS (
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                       AS s
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, n,
               s / CAST(n AS DOUBLE) AS mean_raw,
               (s + {_M} * gmean) / (CAST(n AS DOUBLE) + {_M})
                   AS enc_smoothed
        FROM c CROSS JOIN gstats
    """,
    doc="m-estimate target encoding of o_orderpriority against "
    "o_totalprice (Micci-Barreca 2001): per-category mean shrunk "
    "toward the global mean by m=100 pseudo-observations, so rare "
    "categories don't memorize their few targets. ONE grouped "
    "decimal-sum aggregate + a broadcast 1-row global mean — the "
    "encoder table is O(categories) and becomes a broadcast-join "
    "lookup at apply time; no per-row state anywhere.",
)
def feature_target_encode_smoothed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    gstats = orders.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*"))
        .alias("gmean")
    )
    c = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("s"),
    )
    m = F.expr(_M)
    return c.crossJoin(F.broadcast(gstats)).select(
        "o_orderpriority",
        "n",
        (F.col("s") / F.col("n").cast("double")).alias("mean_raw"),
        (
            (F.col("s") + m * F.col("gmean"))
            / (F.col("n").cast("double") + m)
        ).alias("enc_smoothed"),
    )


_N_FOLDS = 4


def _fold_sql(str_type: str) -> str:
    return (
        "(instr('0123456789abcdef', "
        f"substring(md5(CAST(o_orderkey AS {str_type})), 1, 1)) - 1) "
        f"% {_N_FOLDS}"
    )


@register(
    "feature_target_encode_oof",
    oracle=f"""
        WITH gstats AS ({_SQL_GMEAN}),
        pf AS (
            SELECT o_orderpriority, {_fold_sql('VARCHAR')} AS fold,
                   CAST(COUNT(*) AS BIGINT) AS n_f,
                   SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS s_f
            FROM orders GROUP BY 1, 2
        ),
        pc AS (
            SELECT o_orderpriority, CAST(SUM(n_f) AS BIGINT) AS n_c,
                   SUM(s_f) AS s_c
            FROM pf GROUP BY 1
        )
        SELECT pf.o_orderpriority, CAST(pf.fold AS BIGINT) AS fold,
               pf.n_f AS n_fold, CAST(pc.n_c - pf.n_f AS BIGINT) AS n_rest,
               (CAST(pc.s_c - pf.s_f AS DOUBLE) + {_M} * gmean)
                   / (CAST(pc.n_c - pf.n_f AS DOUBLE) + {_M}) AS enc_oof
        FROM pf JOIN pc USING (o_orderpriority) CROSS JOIN gstats
    """,
    doc="Out-of-fold (cross-fitted) target encoding: rows are split "
    "into 4 md5-derived folds, and fold f's encoding for a category "
    "uses only the OTHER folds' rows — (category_sum - fold_sum + "
    "m*global) / (category_n - fold_n + m) — the standard leakage "
    "defense (a row never sees its own target; see also "
    "curation_leakage_safe_split for the document-level analogue). "
    "Fold sums stay DECIMAL through the subtraction so the OOF "
    "numerator is exact. Two stacked aggregates (category×fold, then "
    "category — the second runs on the O(categories×4) relation) + a "
    "broadcast global mean; encoder output is O(categories × folds). "
    "The smoothing mean is the full-data mean (documented shortcut; "
    "strict OOF would also cross-fit it — same machinery, one more "
    "broadcast).",
)
def feature_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    gstats = orders.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*"))
        .alias("gmean")
    )
    pf = (
        orders.withColumn("fold", F.expr(_fold_sql("STRING")))
        .groupBy("o_orderpriority", "fold")
        .agg(
            F.count("*").cast("long").alias("n_f"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("s_f"),
        )
    )
    pc = pf.groupBy("o_orderpriority").agg(
        F.sum("n_f").cast("long").alias("n_c"),
        F.sum("s_f").alias("s_c"),
    )
    m = F.expr(_M)
    return (
        pf.join(pc, "o_orderpriority")
        .crossJoin(F.broadcast(gstats))
        .select(
            "o_orderpriority",
            F.col("fold").cast("long").alias("fold"),
            F.col("n_f").alias("n_fold"),
            (F.col("n_c") - F.col("n_f")).cast("long").alias("n_rest"),
            (
                ((F.col("s_c") - F.col("s_f")).cast("double") + m * F.col("gmean"))
                / ((F.col("n_c") - F.col("n_f")).cast("double") + m)
            ).alias("enc_oof"),
        )
    )


_VOCAB_K = 32


@register(
    "feature_vocab_index_topk",
    oracle=f"""
        WITH tok AS (
            SELECT unnest({sql_tokens('text')}) AS token FROM documents
        ),
        cnt AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY token
        ),
        top AS (
            SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT {_VOCAB_K}
        ),
        slotted AS (
            SELECT token, n,
                   CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
                       AS slot
            FROM top
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnt),
        tops AS (SELECT CAST(SUM(n) AS BIGINT) AS s FROM top)
        SELECT token, n, slot FROM slotted
        UNION ALL
        SELECT '__oov__' AS token, CAST(t - s AS BIGINT) AS n,
               CAST(0 AS BIGINT) AS slot
        FROM tot CROSS JOIN tops
    """,
    doc="Token-vocabulary index build: the 32 most frequent tokens get "
    "slots 1..32 ((count DESC, token ASC) total order, so the cut and "
    "slots are unique), every remaining occurrence is rolled into the "
    "'__oov__' slot-0 row — the distributed StringIndexer / "
    "fixed-vocab featurizer primitive (HashingTF's collision-free "
    "sibling). One token-count aggregate (map-side combinable) + a "
    "distributed top-k (TakeOrdered, no global sort materialization); "
    "the slot window runs on the 32-row cut. At 100 TB the count "
    "relation is vocabulary-sized (Heaps' law, millions not "
    "trillions) and the index itself is broadcast-sized by "
    "construction.",
)
def feature_vocab_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents")
    cnt = _persist(
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    top = _persist(cnt.orderBy(F.desc("n"), F.asc("token")).limit(_VOCAB_K))
    slotted = top.select(
        "token",
        "n",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("token")))
        .cast("long")
        .alias("slot"),
    )
    tot = cnt.agg(F.sum("n").cast("long").alias("t"))
    tops = top.agg(F.sum("n").cast("long").alias("s"))
    oov = tot.crossJoin(tops).select(
        F.lit("__oov__").alias("token"),
        (F.col("t") - F.col("s")).cast("long").alias("n"),
        F.lit(0).cast("long").alias("slot"),
    )
    return slotted.unionByName(oov)
