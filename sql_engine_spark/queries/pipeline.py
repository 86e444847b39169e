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
from sql_engine_spark.operators.textprep import sql_tokens, tokens
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


_FP_CHUNK = 32
_FP_STRIDE = 24


def _full_pipeline_oracle() -> str:
    from sql_engine_spark.operators.text import EMAIL_RE, IPV4_RE
    from sql_engine_spark.queries.dedup import _sql_cc_iter, _sql_minhash_lsh

    gopher = f"""
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   CAST(len(tt) AS BIGINT) AS n_tokens,
                   list_reduce(list_transform(tt, t -> length(t)), (a, b) -> a + b)
                       / len(tt) AS avg_len,
                   {T.sql_count_in('tt', T.STOPWORDS)} AS stop_n,
                   len(list_distinct(tt)) / len(tt) AS uniq_ratio
            FROM (SELECT doc_id, text, {_TOKS} AS tt FROM documents)
        )
        WHERE n_tokens >= 30 AND n_tokens <= 80
          AND avg_len >= 3.0 AND avg_len <= 10.0
          AND stop_n >= 2 AND uniq_ratio > 0.3
    """
    return f"""
        WITH gop AS ({gopher}),
        cc_pairs AS (
            SELECT id_a, id_b FROM ({_sql_minhash_lsh(3, 8, 4, 0.2, source='gop')})
        ),
        cc_edges AS (
            SELECT id_a AS src, id_b AS dst FROM cc_pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM cc_pairs
        ),
        l0 AS (
            SELECT DISTINCT src AS node, src AS label FROM cc_edges
        ),
        {_sql_cc_iter('l0', 'l1')},
        {_sql_cc_iter('l1', 'l2')},
        {_sql_cc_iter('l2', 'l3')},
        labeled AS (
            SELECT g.doc_id, g.text, COALESCE(l.label, g.doc_id) AS cluster_id,
                   CAST(len({_TOKS}) AS BIGINT) AS n_toks
            FROM gop g LEFT JOIN l3 l ON l.node = g.doc_id
        ),
        kept AS (
            SELECT doc_id, text FROM labeled
            QUALIFY row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY n_toks DESC, doc_id) = 1
        ),
        clean AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{IPV4_RE}', '<IP>', 'g') AS ct
            FROM kept
        ),
        t AS (SELECT doc_id, {sql_tokens('ct')} AS tt FROM clean)
        SELECT doc_id, k AS chunk_id,
               array_to_string(tt[k * {_FP_STRIDE} + 1 : k * {_FP_STRIDE} + {_FP_CHUNK}], ' ')
                   AS chunk_text,
               CAST(len(tt[k * {_FP_STRIDE} + 1 : k * {_FP_STRIDE} + {_FP_CHUNK}]) AS BIGINT)
                   AS n_tokens
        FROM t CROSS JOIN LATERAL (
            SELECT unnest(range(0, CAST(floor((len(tt) - 1) / {_FP_STRIDE}) AS BIGINT) + 1)) AS k
        ) u
    """


@register(
    "pipeline_curate_full",
    oracle=_full_pipeline_oracle(),
    doc="The full modern pretraining ingest, composed end-to-end: Gopher "
    "rule filter -> MinHash-LSH near-dup clustering with keep-longest "
    "canonical selection -> PII redaction -> overlapping context-window "
    "chunking. Every stage is the independently oracle-checked operator; "
    "the composition stays one pipeline (scan-side filters, the LSH "
    "band-join, the CC loop on the tiny edge set, a cluster-keyed rank "
    "window, then pure map-side redact+chunk) with no extra passes over "
    "the corpus.",
)
def pipeline_curate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.operators.text import EMAIL_RE, IPV4_RE, gopher_quality
    from sql_engine_spark.operators.textprep import tokens
    from sql_engine_spark.queries.dedup import _MINHASH_PARAMS

    docs = load(spark, sf_dir, "documents")
    # The gopher-surviving working set is read three times downstream
    # (shingle pipeline, n_toks labeling, final redact+chunk) — persist
    # it so the quality-stat filter runs once, not once per consumer
    # (r12, guide §5; at cluster scale this is the standard
    # materialize-the-filtered-working-set checkpoint of an ingest
    # pipeline).
    gop = D._persist(
        docs.join(
            gopher_quality(docs, "text", "doc_id")
            .where(F.col("pass_gopher"))
            .select("doc_id"),
            "doc_id",
        ).select("doc_id", "text")
    )

    pairs = D.minhash_lsh_pairs(gop, "doc_id", "text", **_MINHASH_PARAMS)
    cc = D.connected_components_fixed(pairs, "id_a", "id_b", iterations=3)
    labeled = gop.join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce("label", "doc_id").alias("cluster_id"),
        F.size(tokens("text")).cast("long").alias("n_toks"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_toks"), F.asc("doc_id"))
    kept = (
        labeled.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc_id", "text")
    )
    clean = kept.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ).alias("__ct"),
    )
    t = clean.select("doc_id", tokens("__ct").alias("__t"))
    return (
        t.select(
            "doc_id",
            "__t",
            F.explode(
                F.sequence(
                    F.lit(0), F.floor((F.size("__t") - 1) / _FP_STRIDE).cast("int")
                )
            ).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("__t", F.col("k") * _FP_STRIDE + 1, _FP_CHUNK), " "
            ).alias("chunk_text"),
            F.size(F.slice("__t", F.col("k") * _FP_STRIDE + 1, _FP_CHUNK))
            .cast("long")
            .alias("n_tokens"),
        )
    )


@register(
    "pipeline_feature_matrix",
    oracle=f"""
        WITH scores AS ({T.sql_hashed_linear_score()}),
        dups AS (
            SELECT doc_id, COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS is_exact_dup
            FROM documents
        ),
        diversity AS (
            SELECT doc_id,
                   len(list_distinct({sql_tokens('text')}))
                       / len({sql_tokens('text')}) AS type_token_ratio
            FROM documents
        )
        SELECT d.doc_id, d.lang, d.source,
               s.n_tokens, s.score, s.label,
               p.is_exact_dup,
               v.type_token_ratio
        FROM documents d
        JOIN scores s USING (doc_id)
        JOIN dups p USING (doc_id)
        JOIN diversity v USING (doc_id)
    """,
    doc="Training-feature matrix assembly: the capstone join that turns "
    "independent per-document signals (linear quality score, exact-dup "
    "flag, lexical diversity) into ONE wide table keyed by doc_id — "
    "what a data-selection model actually consumes. Each feature "
    "branch is map/agg work; the assembly is equi-joins on the "
    "high-cardinality doc key (co-partitioned by AQE), never a "
    "broadcast of anything corpus-sized.",
)
def pipeline_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.text import hashed_linear_score

    docs = load(spark, sf_dir, "documents")
    scores = hashed_linear_score(docs, id_col="doc_id", text_col="text")
    dup_w = Window.partitionBy(F.md5("text"))
    dups = docs.select(
        "doc_id", (F.count("*").over(dup_w) > 1).alias("is_exact_dup")
    )
    toks = tokens("text")
    diversity = docs.select(
        "doc_id",
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
        ).alias("type_token_ratio"),
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(scores.select("doc_id", "n_tokens", "score", "label"), "doc_id")
        .join(dups, "doc_id")
        .join(diversity, "doc_id")
    )
