"""End-to-end training-data curation pipeline: quality-filter -> exact
dedup -> deterministic sample, composed from the individual operators.
This is the shape a 100 TB pretraining ingest actually runs; every stage
is a narrow DataFrame transform (filter / one dedup shuffle / scan-side
sample filter), so the composition adds no cost beyond its parts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators import text as T
from sql_engine_spark.operators.textprep import sql_tokens
from sql_engine_spark.registry import register

_TOKS = sql_tokens("text")


@register(
    "pipeline_curate",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, text, lang, n_chars,
                   CASE WHEN n_tokens < 5 OR avg_token_len > 20 THEN 'low'
                        WHEN stopword_ratio > 0.05 AND n_tokens >= 20 THEN 'high'
                        ELSE 'medium' END AS quality
            FROM (
                SELECT doc_id, text, lang, n_chars,
                       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                       {T.sql_count_in(_TOKS, T.STOPWORDS)} / len({_TOKS}) AS stopword_ratio,
                       list_reduce(list_transform({_TOKS}, t -> length(t)), (a, b) -> a + b)
                           / len({_TOKS}) AS avg_token_len
                FROM documents
            )
        ),
        kept AS (SELECT * FROM feats WHERE quality <> 'low'),
        deduped AS (
            SELECT * FROM kept
            QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        )
        SELECT doc_id, lang, n_chars, quality FROM deduped
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
    """,
    doc="Curation pipeline: drop low-quality docs (token-shape heuristics), "
    "keep one representative per exact-duplicate group (min doc_id), then "
    "a deterministic ~50% hash sample. Filter + one dedup shuffle + "
    "scan-side sample — the stages compose without extra cost.",
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = T.quality_features(docs, "text", "doc_id").select("doc_id", "quality")
    kept = docs.join(feats, "doc_id").where(F.col("quality") != "low")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    )
    sampled = deduped.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    )
    return sampled.select("doc_id", "lang", "n_chars", "quality")


def curate_with_metrics(spark: SparkSession, sf_dir: str):
    """`pipeline_curate` instrumented with Spark Observations: per-stage
    row counts and token totals collected DURING the single pipeline run
    (metrics piggyback on the action — no second pass over the data,
    which is the only acceptable way to count rows at 100 TB).

    Returns (result_df_already_materialized, metrics dict). Library/test
    surface, not a registered query: the driver gate compares DataFrames,
    and the metrics are side-band.
    """
    from pyspark.sql import Observation

    from sql_engine_spark.operators import text as T
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents")
    obs_in = Observation("curate_input")
    obs_kept = Observation("curate_kept")
    docs = docs.observe(
        obs_in,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.size(tokens("text"))).alias("tokens"),
    )
    feats = T.quality_features(docs, "text", "doc_id").select("doc_id", "quality")
    kept = (
        docs.join(feats, "doc_id")
        .where(F.col("quality") != "low")
        .observe(obs_kept, F.count(F.lit(1)).alias("rows"))
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = kept.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    sampled = deduped.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    ).select("doc_id", "lang", "n_chars", "quality")
    out = sampled.cache()
    n_out = out.count()  # the single action that also populates the observations
    metrics = {
        "input_rows": obs_in.get["rows"],
        "input_tokens": obs_in.get["tokens"],
        "kept_rows": obs_kept.get["rows"],
        "output_rows": n_out,
    }
    return out, metrics
