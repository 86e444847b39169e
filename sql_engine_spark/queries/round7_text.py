"""Round-7 text & curation operators: a log-free Zipf profile, per-lang
character-class profiles, DSIR-inspired target-affinity weights over
hashed features, and exact largest-remainder stratified quotas.

House rules upheld: corpus-sized ranks go through the bucketed
two-level scan; no libm transcendentals in hashed outputs (the Zipf
check reads decade RATIOS — exact divisions — instead of a log-log
slope; the DSIR-style score is a linear-space likelihood contrast, one
shared-order division, with the deviation from the published log-ratio
documented); reductions through DECIMAL.

Reference parity note: the reference engine (dylan-p-wong/sql-engine)
has no string functions at all (SURVEY.md §2.5); this file extends the
LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_davg
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

_HEXVAL = "(instr('0123456789abcdef', {ch}) - 1)"


@register(
    "text_zipf_decade_ratio",
    oracle=f"""
        WITH toks AS (
            SELECT w FROM (
                SELECT unnest({sql_tokens('text')}) AS w FROM documents
            ) WHERE w <> ''
        ),
        vocab AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY w
        ),
        r AS (
            SELECT cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT)
                       AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_vocab
            FROM vocab
        ),
        p AS (
            SELECT n_vocab,
                   MAX(CASE WHEN rk = 1 THEN cnt END) AS f1,
                   MAX(CASE WHEN rk = 10 THEN cnt END) AS f10,
                   MAX(CASE WHEN rk = 100 THEN cnt END) AS f100
            FROM r GROUP BY n_vocab
        )
        SELECT n_vocab, f1, f10, f100,
               CAST(f10 AS DOUBLE) / CAST(f1 AS DOUBLE) AS ratio_10_1,
               CAST(f100 AS DOUBLE) / CAST(f10 AS DOUBLE) AS ratio_100_10
        FROM p
    """,
    doc="Log-free Zipf profile of the corpus vocabulary: the frequency "
    "at ranks 1/10/100 and the two decade ratios f(10)/f(1), "
    "f(100)/f(10). Under Zipf's law f(r) ~ r^-s both ratios sit near "
    "10^-s, so the pair IS the slope estimate — read as exact integer "
    "divisions instead of a log-log OLS fit (libm log is not "
    "cross-engine bit-stable; a ratio of counts is). The corpus-sized "
    "work is one tokenize + one count; the rank runs over the "
    "VOCABULARY through the bucketed two-level scan (value = -count, "
    "ties to the lexicographically smallest word), so no vocab-sized "
    "single-task sort exists either.",
)
def text_zipf_decade_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    vocab = _persist(
        docs.select(F.explode(tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("__neg", -F.col("cnt"))
    )
    n_vocab = vocab.count()
    ranked = bucketed_value_rank(
        vocab,
        part_cols=[],
        value_col="__neg",
        tie_col="w",
        n_rows=n_vocab,
        out_col="__rk",
    )
    p = ranked.where(F.col("__rk").isin(1, 10, 100)).agg(
        F.max(F.when(F.col("__rk") == 1, F.col("cnt"))).alias("f1"),
        F.max(F.when(F.col("__rk") == 10, F.col("cnt"))).alias("f10"),
        F.max(F.when(F.col("__rk") == 100, F.col("cnt"))).alias("f100"),
    )
    return p.select(
        F.lit(n_vocab).cast("long").alias("n_vocab"),
        "f1",
        "f10",
        "f100",
        (F.col("f10").cast("double") / F.col("f1").cast("double")).alias(
            "ratio_10_1"
        ),
        (F.col("f100").cast("double") / F.col("f10").cast("double")).alias(
            "ratio_100_10"
        ),
    )


@register(
    "text_char_class_profile",
    oracle=f"""
        WITH d AS (
            SELECT lang,
                   CAST(length(text) AS BIGINT) AS n,
                   CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
                        AS BIGINT) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
                        AS BIGINT) AS n_space
            FROM documents
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_chars,
               CAST(SUM(n_alpha) AS BIGINT) AS n_alpha,
               CAST(SUM(n_space) AS BIGINT) AS n_space,
               CAST(SUM(n - n_alpha - n_space) AS BIGINT) AS n_other,
               {sql_davg('CAST(n_alpha AS DOUBLE) / CAST(n AS DOUBLE)')}
                   AS avg_alpha_ratio
        FROM d GROUP BY lang
    """,
    doc="Per-language character-class profile: letter / space / other "
    "counts and the mean per-doc letter ratio — the cheap script-mix "
    "and mojibake screen a multilingual curation run applies before "
    "language ID (a 'de' shard full of non-letter bytes is an encoding "
    "bug, not German). Pure map pass (two class-stripping "
    "regexp_replace lengths per row — DuckDB needs the 'g' flag to "
    "match Spark's replace-all) + one map-side-combinable aggregate; "
    "the per-doc ratio mean goes through the DECIMAL reduction.",
)
def text_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.numeric import davg

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length("text").cast("long").alias("n"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias(
            "n_alpha"
        ),
        F.length(F.regexp_replace("text", "[^ ]", "")).cast("long").alias(
            "n_space"
        ),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_chars"),
        F.sum("n_alpha").cast("long").alias("n_alpha"),
        F.sum("n_space").cast("long").alias("n_space"),
        F.sum(F.col("n") - F.col("n_alpha") - F.col("n_space"))
        .cast("long")
        .alias("n_other"),
        davg(F.col("n_alpha").cast("double") / F.col("n").cast("double")).alias(
            "avg_alpha_ratio"
        ),
    )


_DSIR_BUCKETS = 64
_DSIR_TARGET_LANG = "en"


def _dsir_bucket_sql(w: str) -> str:
    h0 = _HEXVAL.format(ch=f"substring(md5({w}), 1, 1)")
    h1 = _HEXVAL.format(ch=f"substring(md5({w}), 2, 1)")
    return f"((({h0}) * 16 + ({h1})) % {_DSIR_BUCKETS})"


@register(
    "curation_dsir_contrast",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, w FROM (
                SELECT doc_id, lang, unnest({sql_tokens('text')}) AS w
                FROM documents
            ) WHERE w <> ''
        ),
        hashed AS (
            SELECT doc_id, lang, {_dsir_bucket_sql('w')} AS b FROM toks
        ),
        dist AS (
            SELECT b,
                   CAST(1 + SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                                     THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                   CAST(1 + COUNT(*) AS BIGINT) AS cr
            FROM hashed GROUP BY b
        ),
        tot AS (
            SELECT CAST(SUM(ct) AS BIGINT) AS t_tot,
                   CAST(SUM(cr) AS BIGINT) AS r_tot
            FROM dist
        ),
        per_doc AS (
            SELECT h.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(CAST(d.ct AS DECIMAL(38,0))) AS BIGINT) AS s_t,
                   CAST(SUM(CAST(d.cr AS DECIMAL(38,0))) AS BIGINT) AS s_r
            FROM hashed h JOIN dist d ON h.b = d.b
            GROUP BY h.doc_id
        )
        SELECT doc_id, n_toks,
               (CAST(s_t AS DOUBLE) * CAST(r_tot AS DOUBLE))
               / (CAST(s_r AS DOUBLE) * CAST(t_tot AS DOUBLE)) AS affinity
        FROM per_doc CROSS JOIN tot
    """,
    doc="Target-affinity importance weights over hashed n-gram features "
    "— the DSIR recipe (Xie et al. 2023: hashed features, target-vs-raw "
    "distribution ratio, per-doc importance) with ONE deliberate "
    "deviation, documented here: the published score sums per-token "
    "LOG likelihood ratios, but libm log is not cross-engine "
    "bit-stable, so this spelling contrasts in LINEAR space — per doc, "
    "the average target-bucket mass over the average raw-bucket mass, "
    "normalized by the global totals (affinity > 1 = looks more like "
    "the target than the average document; smoothing +1 per bucket). "
    "Target = lang 'en'. Shapes: one tokenize+hash pass, a "
    "64-row bucket distribution broadcast back, per-doc integer sums "
    "through DECIMAL(38,0) (bucket counts are corpus-scale at 100 TB), "
    "one shared-order division. No vocabulary state anywhere — the "
    "hashing trick keeps the model O(buckets).",
)
def curation_dsir_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hashed = _persist(
        docs.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .select("doc_id", "lang", F.expr(_dsir_bucket_sql("w")).alias("b"))
    )
    dist = hashed.groupBy("b").agg(
        (
            1
            + F.sum(
                F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
            )
        )
        .cast("long")
        .alias("ct"),
        (1 + F.count("*")).cast("long").alias("cr"),
    )
    tot = dist.agg(
        F.sum("ct").cast("long").alias("t_tot"),
        F.sum("cr").cast("long").alias("r_tot"),
    )
    per_doc = (
        hashed.join(F.broadcast(dist), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum(F.col("ct").cast("decimal(38,0)")).cast("long").alias("s_t"),
            F.sum(F.col("cr").cast("decimal(38,0)")).cast("long").alias("s_r"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_toks",
        (
            (F.col("s_t").cast("double") * F.col("r_tot").cast("double"))
            / (F.col("s_r").cast("double") * F.col("t_tot").cast("double"))
        ).alias("affinity"),
    )


_QUOTA_BUDGET = 100


def _hash16_sql(idc: str, str_type: str = "VARCHAR") -> str:
    """16-bit integer from the first 4 hex chars of md5(id) — the shared
    numeric sampling key (string conv() differs across engines; nibble
    arithmetic over instr() does not). `str_type` is the engine's
    string-cast spelling (VARCHAR in DuckDB, STRING in Spark)."""
    parts = [
        f"({_HEXVAL.format(ch=f'substring(md5(CAST({idc} AS {str_type})), {i}, 1)')})"
        for i in (1, 2, 3, 4)
    ]
    return (
        f"((({parts[0]}) * 4096) + (({parts[1]}) * 256) "
        f"+ (({parts[2]}) * 16) + ({parts[3]}))"
    )


@register(
    "curation_stratified_quota",
    oracle=f"""
        WITH strata AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM strata),
        base AS (
            SELECT lang, n_docs,
                   ({_QUOTA_BUDGET} * n_docs) // total AS floor_q,
                   ({_QUOTA_BUDGET} * n_docs) % total AS rem
            FROM strata CROSS JOIN tot
        ),
        ranked AS (
            SELECT lang, n_docs, floor_q,
                   CAST(row_number() OVER (ORDER BY rem DESC, lang)
                        AS BIGINT) AS rrk,
                   CAST({_QUOTA_BUDGET} - SUM(floor_q) OVER () AS BIGINT)
                       AS leftover
            FROM base
        ),
        quota AS (
            SELECT lang, n_docs,
                   CAST(floor_q + CASE WHEN rrk <= leftover THEN 1 ELSE 0 END
                        AS BIGINT) AS quota
            FROM ranked
        ),
        keyed AS (
            SELECT d.doc_id, d.lang,
                   CAST(row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY {_hash16_sql('d.doc_id')}, d.doc_id
                   ) AS BIGINT) AS rk
            FROM documents d
        )
        SELECT k.lang, k.doc_id, k.rk, q.quota
        FROM keyed k JOIN quota q ON k.lang = q.lang
        WHERE k.rk <= q.quota
    """,
    doc="Exact stratified sampling with largest-remainder (Hamilton) "
    "quota allocation: a budget of 100 docs split across language "
    "strata so every quota is an integer, quotas sum EXACTLY to the "
    "budget, and each stratum's quota differs from its exact "
    "proportional share by < 1 — the apportionment-theory answer to "
    "'multiply by a fraction and round' drift (floor quotas from "
    "integer division, the leftover seats to the largest remainders, "
    "ties to the smallest lang). Allocation runs on the BOUNDED strata "
    "relation; the per-stratum selection ranks docs by a 16-bit md5 "
    "sampling key through the bucketed two-level scan, so no "
    "per-stratum corpus-wide single-task sort. Deterministic "
    "end-to-end: same corpus, same sample.",
)
def curation_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _persist(
        load(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            F.expr(_hash16_sql("doc_id", "STRING")).alias("__hv"),
        )
    )
    strata = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    tot = strata.agg(F.sum("n_docs").cast("long").alias("total"))
    base = strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"({_QUOTA_BUDGET} * n_docs) div total").alias("floor_q"),
        F.expr(f"({_QUOTA_BUDGET} * n_docs) % total").alias("rem"),
    )
    from pyspark.sql import Window

    # Strata-relation windows (bounded by the language count).
    w = Window.orderBy(F.desc("rem"), F.asc("lang"))
    ranked = base.select(
        "lang",
        "n_docs",
        "floor_q",
        F.row_number().over(w).cast("long").alias("rrk"),
        (
            F.lit(_QUOTA_BUDGET)
            - F.sum("floor_q").over(Window.partitionBy())
        )
        .cast("long")
        .alias("leftover"),
    )
    quota = ranked.select(
        "lang",
        "n_docs",
        (
            F.col("floor_q")
            + F.when(F.col("rrk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
    keyed = bucketed_value_rank(
        docs,
        part_cols=["lang"],
        value_col="__hv",
        tie_col="doc_id",
        n_rows=docs.count(),
        out_col="rk",
    )
    return (
        keyed.join(F.broadcast(quota), "lang")
        .where(F.col("rk") <= F.col("quota"))
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"), "quota")
    )
