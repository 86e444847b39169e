"""Text-analysis queries over the `documents` table: language ID, quality
scoring, token counting, fingerprinting. All pure map stages."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators import text as T
from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens, tokens
from sql_engine_spark.registry import register

_TOKS = sql_tokens("text")


@register(
    "text_lang_id",
    oracle=f"""
        SELECT doc_id, lang AS labeled_lang,
               {T.sql_lang_id(_TOKS)} AS predicted_lang,
               lang = {T.sql_lang_id(_TOKS)} AS lang_match
        FROM documents
    """,
    doc="Stopword-vote language identification vs the labeled lang column.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("__tokens", tokens("text"))
    pred = T.lang_id("__tokens")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        (F.col("lang") == pred).alias("lang_match"),
    )


@register(
    "text_quality",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_obs,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(lower(text), '{T.WORD_RE}')) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS BIGINT) AS n_punct,
                   {T.sql_count_in(_TOKS, T.STOPWORDS)} / len({_TOKS}) AS stopword_ratio,
                   list_reduce(list_transform({_TOKS}, t -> length(t)), (a, b) -> a + b)
                       / len({_TOKS}) AS avg_token_len
            FROM documents
        )
        SELECT *,
               CASE WHEN n_tokens < 5 OR avg_token_len > 20 THEN 'low'
                    WHEN stopword_ratio > 0.05 AND n_tokens >= 20 THEN 'high'
                    ELSE 'medium' END AS quality
        FROM feats
    """,
    doc="Quality features (length, punct, stopword ratio, token shape) + "
    "CASE-based quality band — the heuristic filter stage of a data "
    "pipeline.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(load(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_token_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT)                         AS n_ws_tokens,
               CAST(len(regexp_extract_all(lower(text), '{T.WORD_RE}')) AS BIGINT)
                                                                    AS n_re_tokens,
               CAST(len(list_distinct({_TOKS})) AS BIGINT)          AS n_unique,
               len(list_distinct({_TOKS})) / len({_TOKS})           AS type_token_ratio
        FROM documents
    """,
    doc="Token counting: whitespace tokens, BPE-ish regex tokens, unique "
    "count, type-token ratio.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("__tokens", tokens("text"))
    n = F.size("__tokens").cast("long")
    uniq = F.size(F.array_distinct("__tokens")).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{T.WORD_RE}', 0)"))
        .cast("long")
        .alias("n_re_tokens"),
        uniq.alias("n_unique"),
        (uniq / n).alias("type_token_ratio"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, {T.sql_fingerprint(_TOKS)} AS fingerprint
            FROM documents
        )
        SELECT fingerprint, MIN(doc_id) AS rep_id, COUNT(*) AS n_docs
        FROM fp GROUP BY fingerprint
    """,
    doc="Sorted-distinct-token fingerprint (word-order/duplication "
    "invariant) grouped into dedup clusters.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("__tokens", tokens("text"))
    return (
        docs.select("doc_id", T.fingerprint("__tokens").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("n_docs"))
    )


@register(
    "text_regexp_funcs",
    oracle="""
        SELECT doc_id,
               regexp_extract(text, '([A-Za-z]+)', 1)        AS first_word,
               regexp_replace(text, '[0-9]+', '#', 'g')      AS digits_masked,
               regexp_matches(text, '[0-9]')                 AS has_digit,
               length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels
        FROM documents
    """,
    doc="Regexp scalar functions (extract / replace-all / match / "
    "strip-count). Patterns are plain character classes so Java regex "
    "(Spark) and RE2 (DuckDB) agree; DuckDB needs the 'g' flag to match "
    "Spark's replace-ALL semantics.",
)
def text_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "[0-9]+", "#").alias("digits_masked"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.length(F.regexp_replace("text", "[^aeiou]", "")).cast("long").alias("n_vowels"),
    )


# Deterministic synthetic PII: the corpus text is word-soup with no real
# emails/IPs, so the redaction queries graft reproducible PII derived from
# doc_id onto each doc (every 3rd doc gets a second email) — both engines
# build the identical string, so the redaction logic is exercised on real
# matches.
_PII_SYNTH_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.' || CAST(doc_id % 250 AS VARCHAR)"
    " || '.' || CAST(doc_id % 97 AS VARCHAR)"
    " || CASE WHEN doc_id % 3 = 0 THEN ' admin@corp.example.net' ELSE '' END"
)


def _pii_synth_col() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 97).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" admin@corp.example.net")).otherwise(
            F.lit("")
        ),
    )


def _pii_oracle() -> str:
    exprs = T.sql_pii_redact_exprs("synth")
    return f"""
        WITH s AS (SELECT doc_id, {_PII_SYNTH_SQL} AS synth FROM documents)
        SELECT doc_id,
               {exprs['n_emails']} AS n_emails,
               {exprs['n_ips']} AS n_ips,
               {exprs['clean_text']} AS clean_text
        FROM s
    """


@register(
    "text_pii_redact",
    oracle=_pii_oracle(),
    doc="PII redaction: emails and IPv4 literals replaced with placeholder "
    "tags, occurrences counted per doc — the compliance pass before "
    "training. JVM regex map work, zero shuffles; regex subset chosen "
    "for identical Java/RE2 semantics.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _pii_synth_col().alias("__synth")
    )
    return T.pii_redact(docs, "__synth", "doc_id")


@register(
    "text_gopher_quality",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS tt FROM documents),
        f AS (SELECT doc_id,
                     CAST(len(tt) AS BIGINT) AS n_tokens,
                     list_reduce(list_transform(tt, t -> length(t)), (a, b) -> a + b)
                         / len(tt) AS avg_len,
                     {T.sql_count_in('tt', T.STOPWORDS)} AS stop_n,
                     len(list_distinct(tt)) / len(tt) AS uniq_ratio
              FROM t)
        SELECT doc_id, n_tokens,
               n_tokens >= 30 AND n_tokens <= 80 AS wc_ok,
               avg_len >= 3.0 AND avg_len <= 10.0 AS wl_ok,
               stop_n >= 2 AS stop_ok,
               uniq_ratio > 0.3 AS uniq_ok,
               n_tokens >= 30 AND n_tokens <= 80
                   AND avg_len >= 3.0 AND avg_len <= 10.0
                   AND stop_n >= 2 AND uniq_ratio > 0.3 AS pass_gopher
        FROM f
    """,
    doc="Gopher-style rule-based quality flags (word-count bounds, mean "
    "word length bounds, stopword presence, distinct-token floor) plus "
    "their conjunction — per-rule booleans so mixing can weight rules. "
    "Pure per-row map work, zero shuffles.",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.gopher_quality(load(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_tfidf_keywords",
    oracle=f"""
        WITH terms AS (
            SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        ),
        t2 AS (SELECT doc_id, token FROM terms WHERE token <> ''),
        tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
               FROM t2 GROUP BY doc_id, token),
        dfq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token),
        nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents)
        SELECT doc_id, token, tf,
               (CAST(tf AS DOUBLE) * (n_docs / df)) AS score,
               CAST(row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY (CAST(tf AS DOUBLE) * (n_docs / df)) DESC, token
               ) AS BIGINT) AS rank
        FROM tf JOIN dfq USING (token) CROSS JOIN nd
        QUALIFY rank <= 3
    """,
    doc="Per-document top-3 keywords by tf-idf with a LINEAR idf (N/df — "
    "monotone-equivalent to ln(N/df) per token, and exactly rounded in "
    "both engines where ln() is not). One explode, two map-side-combined "
    "hash aggregates, a broadcast 1-row N, and a per-doc top-k window.",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.tfidf_keywords(
        load(spark, sf_dir, "documents"), id_col="doc_id", text_col="text", k=3
    )


_WINNOW_K = 3
_WINNOW_W = 4


@register(
    "text_winnow_fingerprints",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_transform({sql_shingles(_TOKS, _WINNOW_K)}, g -> md5(g)) AS hs
            FROM documents
        ),
        fps AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(hs) - {_WINNOW_W - 1}, 1) + 1),
                       i -> list_aggregate(hs[i : i + {_WINNOW_W - 1}], 'min'))) AS f
            FROM t
        )
        SELECT doc_id, unnest(f) AS fp FROM fps
    """,
    doc=f"Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the "
    f"MOSS scheme): md5 every ordered {_WINNOW_K}-gram, keep each "
    f"{_WINNOW_W}-window's minimum hash, dedupe — any shared run of >= "
    f"{_WINNOW_W + _WINNOW_K - 1} tokens between two docs is guaranteed "
    "to share a fingerprint, the rolling-hash substring-dedup primitive "
    "set-based fingerprints can't give. Hex-string ordering makes the "
    "min portable across engines. Pure per-row map + explode, zero "
    "shuffles.",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.winnow_fingerprints(
        load(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        k=_WINNOW_K,
        w=_WINNOW_W,
    )


# Deterministic synthetic card numbers (the corpus has no real PANs):
# a 15-digit base from doc_id plus a doc_id-derived final digit, so
# ~10% of docs carry a Luhn-VALID card and the rest carry near-miss
# digit runs — the validator is exercised on both outcomes. Both
# engines build the identical string.
_CARD_SYNTH_SQL = (
    "text || ' card ' || lpad(CAST((doc_id * 7919 + 123456789) % 1000000000000000 "
    "AS VARCHAR), 15, '0') || CAST(doc_id % 10 AS VARCHAR)"
)


def _card_synth_col() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" card "),
        F.lpad(
            ((F.col("doc_id") * 7919 + 123456789) % 1000000000000000).cast("string"),
            15,
            "0",
        ),
        (F.col("doc_id") % 10).cast("string"),
    )


@register(
    "text_pii_luhn",
    oracle=f"""
        WITH s AS (SELECT doc_id, {_CARD_SYNTH_SQL} AS synth FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(synth, '{T.CARD_RE}')) AS BIGINT)
                   AS n_candidates,
               CAST(len(list_filter(regexp_extract_all(synth, '{T.CARD_RE}'),
                                    c -> {T.sql_luhn_valid('c')})) AS BIGINT)
                   AS n_valid_cards,
               list_reduce(
                   list_prepend(synth,
                       list_filter(regexp_extract_all(synth, '{T.CARD_RE}'),
                                   c -> {T.sql_luhn_valid('c')})),
                   (acc, c) -> replace(acc, c, '<CARD>')) AS clean_text
        FROM s
    """,
    doc="Payment-card PII with Luhn checksum validation: 13-19 digit "
    "runs are candidates, only checksum-valid runs are counted and "
    "redacted — precision a bare length regex can't give (order ids "
    "and timestamps survive). Per-row JVM regex + one fold per "
    "candidate, zero shuffles.",
)
def text_pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _card_synth_col().alias("__synth")
    )
    return T.pii_luhn_redact(docs, "__synth", "doc_id")


@register(
    "text_bytes_per_token",
    oracle=f"""
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
                   / CAST(SUM(len({_TOKS})) AS BIGINT) AS bytes_per_token
        FROM documents
        GROUP BY source, lang
    """,
    doc="Tokenizer fertility audit per (source, lang): bytes per "
    "whitespace token — the budget planner's conversion factor between "
    "storage size and token count, and the drift signal when a new "
    "source's ratio deviates. One map-side-combinable aggregate to a "
    "bounded (sources x langs) result.",
)
def text_bytes_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.size(tokens("text")).cast("long")
    return docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.octet_length("text")).cast("long").alias("total_bytes"),
        F.sum(toks).cast("long").alias("total_tokens"),
        (
            F.sum(F.octet_length("text")).cast("long")
            / F.sum(toks).cast("long")
        ).alias("bytes_per_token"),
    )


@register(
    "text_quality_classifier",
    oracle=T.sql_hashed_linear_score(),
    doc="fastText-style hashed-feature linear quality scorer (Joulin et "
    "al. 2017; the CCNet/GPT-3 filter posture): tokens hash into 256 "
    "buckets, a linear model scores the bag, threshold at 0. Inference "
    "is a pure per-row map — zero shuffles at any corpus size — which "
    "is why production pipelines score 100 TB with a linear model. "
    "Weights here are a deterministic Knuth-hash function of the bucket "
    "(a trained vector would drop in as a literal array, like the LSH "
    "hyperplanes in operators/similarity.py).",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.hashed_linear_score(
        load(spark, sf_dir, "documents"), id_col="doc_id", text_col="text"
    )


@register(
    "text_bigram_lm_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('text')} AS t FROM documents
        ),
        bg AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w1, t[i + 1] AS w2
            FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
        ),
        c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY w1),
        p AS (
            SELECT doc_id, pos, CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p
            FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(list_sort(list(struct_pack(pos := pos, p := p))),
                                      s -> s.p)),
                   (a, x) -> a + x) / COUNT(*) AS mean_prob
        FROM p GROUP BY doc_id
    """,
    doc="Corpus-trained bigram LM plausibility score — the KenLM-style "
    "fluency filter posture with the model trained and applied in one "
    "pipeline: P(w2|w1) = count(w1 w2)/count(w1 ·) from the corpus "
    "itself, per-doc mean conditional probability (arithmetic mean, "
    "not log-geometric: libm log differs JVM-vs-glibc by an ulp — see "
    "operators/retrieval.py — while count ratios and the sorted "
    "position-order fold are bit-exact). Shape: one explode, two "
    "bounded-vocab count aggregates joined back by equi-join, one "
    "per-doc fold; no corpus-quadratic stage.",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1), "
                "i -> struct(CAST(i AS BIGINT) AS pos, "
                "element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2))"
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.w1", "s.w2")
    # The bigram explode feeds the two count aggregates AND the scoring
    # probe — persist it or the corpus tokenizes three times (lifecycle:
    # caller-owned, released by the oracle gate / bench clearCache).
    bg = _persist(bg)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("n1"))
    p = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select(
            "doc_id",
            "pos",
            (F.col("n2").cast("double") / F.col("n1").cast("double")).alias("p"),
        )
    )
    return p.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, p))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.p)"
            )
            / F.count("*")
        ).alias("mean_prob"),
    )
