"""Round-6 audit operators, second set: IVF recall, the dedup
threshold-tuning sweep, and the cross-source near-dup overlap matrix.

Same composition discipline as round6_audits: ground truths and
candidate sets come from the documented bucketed pipelines; the audits
add only pair-keyed joins and bounded aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators import dedup as D
from sql_engine_spark.queries.dedup import (
    _MINHASH_PARAMS,
    _shared_pairs,
    _sql_minhash_lsh,
)
from sql_engine_spark.queries.similarity import _BRUTE_ORACLE, _ivf_oracle
from sql_engine_spark.registry import register


@register(
    "ann_ivf_recall_report",
    oracle=f"""
        WITH brute AS ({_BRUTE_ORACLE}),
        ivf AS ({_ivf_oracle(4, 2, 5)}),
        hits AS (
            SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM brute b JOIN ivf i
              ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
            GROUP BY b.query_id
        ),
        qs AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM brute GROUP BY query_id
        )
        SELECT qs.query_id, qs.n_true,
               COALESCE(n_hits, 0) AS n_hits,
               CAST(COALESCE(n_hits, 0) AS DOUBLE)
                   / CAST(qs.n_true AS DOUBLE) AS recall
        FROM qs LEFT JOIN hits USING (query_id)
    """,
    doc="IVF recall audit: per query, how many of the exact cosine "
    "top-5 the 4-cell/2-probe IVF index returned — the second leg of "
    "the ANN evaluation family (ann_lsh_recall_report audits the LSH "
    "leg; together they are the recall-vs-probe-budget table an index "
    "owner tunes against). Queries whose probed cells miss a true "
    "neighbor surface as recall < 1, not missing rows; the denominator "
    "is the per-query brute-force count, not a fixed k, so a query "
    "with < k true neighbors is not under-reported. Only id-sized "
    "joins on top of the documented index paths.",
)
def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    brute = brute_force_topk(q, c, id_col="vec_id", vec_col="embedding", k=5)
    ivf = ivf_topk(
        q, c, id_col="vec_id", vec_col="embedding", k=5, num_centroids=4, nprobe=2
    )
    hits = (
        brute.select("query_id", "neighbor_id")
        .join(ivf.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    qs = brute.groupBy("query_id").agg(F.count("*").cast("long").alias("n_true"))
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        "n_true",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        (
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_true").cast("double")
        ).alias("recall"),
    )


_SWEEP_STEPS = (20, 30, 40, 50, 60, 70, 80, 90)  # thresholds x100


@register(
    "dedup_threshold_sweep",
    oracle=f"""
        WITH pairs AS ({_sql_minhash_lsh(3, 8, 4, 0.2)}),
        th(t) AS (VALUES {", ".join(f"({t})" for t in _SWEEP_STEPS)})
        SELECT CAST(t AS BIGINT) AS threshold_pct,
               CAST(SUM(CASE WHEN jaccard * 100 >= t THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT CASE WHEN jaccard * 100 >= t
                                        THEN id_b END) AS BIGINT)
                   AS n_docs_dropped
        FROM pairs CROSS JOIN th
        GROUP BY t
    """,
    doc="Dedup threshold-tuning sweep: from ONE verified MinHash pair "
    "relation (J >= 0.2), the pair count and keep-first drop count at "
    "every candidate threshold 0.2..0.9 — the curve a dedup owner "
    "reads to pick the operating point (how much of the corpus each "
    "threshold would remove) WITHOUT re-running the pipeline per "
    "threshold. The sweep is a constant-size conditional aggregate "
    "over the pair relation; thresholds compare on jaccard*100 "
    "against integers so no fraction literal crosses the engines.",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_pairs(spark, sf_dir)
    th = F.explode(F.array(*[F.lit(t) for t in _SWEEP_STEPS])).alias("t")
    base = pairs.select("id_b", (F.col("jaccard") * 100).alias("j100"), th)
    return base.groupBy(F.col("t").cast("long").alias("threshold_pct")).agg(
        F.sum(F.when(F.col("j100") >= F.col("t"), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.countDistinct(
            F.when(F.col("j100") >= F.col("t"), F.col("id_b"))
        )
        .cast("long")
        .alias("n_docs_dropped"),
    )


@register(
    "curation_source_overlap_matrix",
    oracle=f"""
        WITH pairs AS ({_sql_minhash_lsh(3, 8, 4, 0.2)}),
        m AS (
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM pairs p
            JOIN documents da ON p.id_a = da.doc_id
            JOIN documents db ON p.id_b = db.doc_id
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, n_pairs,
               source_a = source_b AS within_source
        FROM m
    """,
    doc="Cross-source near-dup overlap matrix: verified MinHash pairs "
    "rolled up by (source, source) — the syndication/mirror detector "
    "(high off-diagonal mass means two sources republish each other's "
    "content, so per-source dedup alone under-removes; the per-source "
    "diagonal is curation_dedup_rate_report's view). Two id-keyed "
    "joins to attach sources, one bounded (source x source) "
    "aggregate.",
)
def curation_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = _shared_pairs(spark, sf_dir)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
    )
    return (
        j.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .withColumn("within_source", F.col("source_a") == F.col("source_b"))
    )
