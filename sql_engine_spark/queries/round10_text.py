"""Round-10 text batch: Heaps'-law vocabulary-growth doubling curve
(log-free — the doubling ratio V(2n)/V(n) IS 2^beta, the same
libm-avoidance device as text_zipf_decade_ratio), per-language
vocabulary tail profile (hapax/dis legomena — the Zipf-tail health
check every tokenizer-training run reads), and per-source chi-square
unigram drift (the frequentist sibling of text_source_drift_tv's
total-variation distance).

Scale posture: the Heaps curve costs ONE (token -> first-occurrence
rank) aggregate — V(cut) is then a count of tokens with first_rank <=
cut, so five prefix evaluations share one corpus pass instead of five;
the tail profile and chi-square are single grouped aggregates over the
exploded (lang/source, token) relation.

The reference engine has min/max/sum/count/avg only
(/root/reference/src/executor/aggregation.rs:168-427); no string
surface beyond concat (expression.rs:119-260).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# text_heaps_doubling — vocabulary growth at doubling corpus prefixes
# ---------------------------------------------------------------------------


@register(
    "text_heaps_doubling",
    oracle=f"""
        WITH ranked AS (
            SELECT text,
                   CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
            FROM documents
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM ranked),
        first_seen AS (
            SELECT token, MIN(rn) AS first_rn
            FROM (SELECT rn, unnest({sql_tokens('text')}) AS token
                  FROM ranked)
            GROUP BY token
        ),
        cuts AS (
            SELECT k,
                   CAST(CEIL(CAST(n_docs AS DOUBLE)
                        / CAST(POW(2, 4 - k) AS DOUBLE)) AS BIGINT) AS cut
            FROM (SELECT unnest(range(0, 5)) AS k) CROSS JOIN n
        ),
        curve AS (
            SELECT c.k, c.cut,
                   CAST(SUM(CASE WHEN f.first_rn <= c.cut
                            THEN 1 ELSE 0 END) AS BIGINT) AS vocab
            FROM cuts c CROSS JOIN first_seen f
            GROUP BY c.k, c.cut
        )
        SELECT k, cut AS n_docs_prefix, vocab,
               CAST(vocab AS DOUBLE)
               / CAST(lag(vocab) OVER (ORDER BY k) AS DOUBLE)
                   AS doubling_ratio
        FROM curve
    """,
    doc="Heaps'-law vocabulary growth V(n) = K n^beta at five doubling "
    "corpus prefixes (n/16, n/8, n/4, n/2, n in doc_id order): the "
    "doubling ratio V(2n)/V(n) equals 2^beta, so the exponent is "
    "read off WITHOUT logs (the text_zipf_decade_ratio device) — a "
    "flat ratio near 1 means the vocabulary has saturated (dup-heavy "
    "or template corpus), near 2 means open vocabulary (noisy/OCR "
    "text). Costs ONE corpus pass: each token reduces to its "
    "first-occurrence rank, then every prefix evaluation is a "
    "bounded count over the token->first_rn relation — adding cuts "
    "is free, unlike the naive per-prefix COUNT(DISTINCT). The "
    "tokenizer-budget planning curve (vocab growth dictates BPE "
    "vocab size) at 100 TB.",
)
def text_heaps_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Global doc rank from the SLIM (doc_id) projection only — and via
    # the two-level bucketed rank, not a single-partition row_number:
    # even 8-byte rows are corpus-count rows, and at 100x they funnel
    # through one task under a bare global window (r11 window sweep).
    # Ranks are identical (doc_id is unique, weights are 1). rn is
    # monotone in doc_id, so MIN(rn) per token == rn of the token's
    # MIN(doc_id): first occurrences aggregate on doc_id (map-side
    # combinable) and one slim join resolves ranks.
    from sql_engine_spark.operators.prefix import bucketed_value_rank

    ids = docs.select("doc_id")
    rn = bucketed_value_rank(
        ids,
        part_cols=[],
        value_col="doc_id",
        tie_col="doc_id",
        n_rows=ids.count(),
        out_col="rn",
    ).select("doc_id", F.col("rn").cast("long").alias("rn"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    first_doc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    first_seen = first_doc.join(rn, "doc_id").select(
        "token", F.col("rn").alias("first_rn")
    )
    cuts = (
        spark.range(0, 5)
        .select(F.col("id").cast("long").alias("k"))
        .crossJoin(F.broadcast(n))
        .select(
            "k",
            F.ceil(
                F.col("n_docs").cast("double")
                / F.pow(F.lit(2.0), (F.lit(4) - F.col("k")).cast("double"))
            )
            .cast("long")
            .alias("cut"),
        )
    )
    curve = (
        first_seen.crossJoin(F.broadcast(cuts))
        .groupBy("k", "cut")
        .agg(
            F.sum(F.when(F.col("first_rn") <= F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("vocab")
        )
    )
    return curve.select(
        "k",
        F.col("cut").alias("n_docs_prefix"),
        "vocab",
        (
            F.col("vocab").cast("double")
            / F.lag("vocab").over(Window.orderBy("k")).cast("double")
        ).alias("doubling_ratio"),
    )


# ---------------------------------------------------------------------------
# text_vocab_tail_profile — hapax / dis legomena per language
# ---------------------------------------------------------------------------


@register(
    "text_vocab_tail_profile",
    oracle=f"""
        WITH tfreq AS (
            SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT lang, unnest({sql_tokens('text')}) AS token
                  FROM documents)
            GROUP BY lang, token
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax,
               CAST(SUM(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dis_legomena,
               CAST(SUM(freq) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS hapax_frac
        FROM tfreq GROUP BY lang
    """,
    doc="Per-language vocabulary tail profile: vocabulary size, hapax "
    "legomena (frequency-1 types), dis legomena (frequency-2), total "
    "token mass, hapax fraction. Zipf-tail health in one table: a "
    "high hapax fraction signals OCR noise / mojibake / open-ended "
    "entities (tokenizer vocab will be dominated by junk singletons); "
    "a collapsed tail signals template or duplicated text. Good-"
    "Turing smoothing and BPE-vocab sizing both start from exactly "
    "these counts (hapax count IS the Good-Turing N1). One exploded "
    "(lang, token) aggregate, all-integer until the final fraction.",
)
def text_vocab_tail_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tfreq = (
        docs.select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return tfreq.groupBy("lang").agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0))
        .cast("long")
        .alias("dis_legomena"),
        F.sum("freq").cast("long").alias("total_tokens"),
        (
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("hapax_frac"),
    )


# ---------------------------------------------------------------------------
# text_source_chi2_drift — per-source unigram chi-square vs rest of corpus
# ---------------------------------------------------------------------------


@register(
    "text_source_chi2_drift",
    oracle=f"""
        WITH tok AS (
            SELECT source, token
            FROM (SELECT source, unnest({sql_tokens('text')}) AS token
                  FROM documents)
        ),
        st AS (
            SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY source, token
        ),
        tot_t AS (
            SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM st GROUP BY token
        ),
        tot_s AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM st GROUP BY source
        ),
        grand AS (SELECT CAST(SUM(c) AS BIGINT) AS g FROM st),
        grid AS (
            SELECT s.source, t.token,
                   COALESCE(st.c, 0) AS o,
                   CAST(s.cs AS DOUBLE) * CAST(t.ct AS DOUBLE)
                       / CAST(g.g AS DOUBLE) AS e
            FROM tot_s s
            CROSS JOIN tot_t t
            CROSS JOIN grand g
            LEFT JOIN st ON st.source = s.source AND st.token = t.token
        ),
        cells AS (
            SELECT source, token,
                   (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
                       AS cell
            FROM grid
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens_vocab,
               CAST(SUM(CAST(round(cell * 1e9) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1e9 AS chi2_contrib
        FROM cells GROUP BY source
    """,
    doc="Per-source unigram chi-square drift: the source x token "
    "contingency grid's chi-square contribution per source, with "
    "expected counts cs*ct/g from the margins — the frequentist "
    "complement to text_source_drift_tv's total-variation distance "
    "(TV weights all tokens equally; chi-square weights by inverse "
    "expectation, surfacing rare-token divergence). The grid is "
    "(sources x corpus vocab) — source count is small and FIXED, so "
    "the grid is vocab-bounded, not corpus-bounded (same posture as "
    "stats_kendall_tau_binned's 100x100 cells). Cell terms are "
    "fixed-order double arithmetic; the per-source reduction goes "
    "through the ssum integer detour (scale 1e9) so partial-sum "
    "order can't move the last ulp. The 'which crawl snapshot "
    "drifted' triage before mixing sources into a training run.",
)
def text_source_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot_t = st.groupBy("token").agg(F.sum("c").cast("long").alias("ct"))
    tot_s = st.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    grand = st.agg(F.sum("c").cast("long").alias("g"))
    grid = (
        tot_s.crossJoin(F.broadcast(grand))
        .crossJoin(tot_t)
        .join(st, ["source", "token"], "left")
        .select(
            "source",
            "token",
            F.coalesce("c", F.lit(0)).alias("o"),
            (
                F.col("cs").cast("double")
                * F.col("ct").cast("double")
                / F.col("g").cast("double")
            ).alias("e"),
        )
    )
    cells = grid.select(
        "source",
        (
            (F.col("o").cast("double") - F.col("e"))
            * (F.col("o").cast("double") - F.col("e"))
            / F.col("e")
        ).alias("cell"),
    )
    return cells.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens_vocab"),
        (
            F.sum(F.round(F.col("cell") * F.lit(1e9)).cast("decimal(38,0)"))
            .cast("double")
            / F.lit(1e9)
        ).alias("chi2_contrib"),
    )
