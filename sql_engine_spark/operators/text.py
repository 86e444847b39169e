"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure map stages over the text column — built-in string/array/regex
functions only, so they stay in whole-stage codegen and scale linearly.
Regexes are restricted to constructs with identical semantics in Java
regex (Spark) and RE2 (DuckDB oracle): literal char classes, +, |.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_spark.operators.textprep import tokens

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "los", "de", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}

WORD_RE = "[a-z]+|[0-9]+"  # BPE-ish: letter runs and digit runs
PUNCT_RE = "[.,;:!?]"
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is"]


def _count_in(tokens_col: str, words: list[str]) -> "F.Column":
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({tokens_col}, t -> t IN ({lst})))")


def sql_count_in(tokens_expr: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens_expr}, t -> t IN ({lst})))"


def lang_id(tokens_col: str) -> "F.Column":
    """Stopword-vote language guess. Portable argmax: encode each
    candidate as lpad(score) ++ lang-code, take the greatest string —
    highest score wins, ties break to the greatest language code."""
    encoded = [
        F.concat(
            F.lpad(_count_in(tokens_col, words).cast("string"), 6, "0"), F.lit(lang)
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    return F.substring(F.greatest(*encoded), 7, 2)


def sql_lang_id(tokens_expr: str) -> str:
    encoded = ", ".join(
        f"concat(lpad(CAST({sql_count_in(tokens_expr, words)} AS VARCHAR), 6, '0'), '{lang}')"
        for lang, words in sorted(LANG_MARKERS.items())
    )
    return f"substring(greatest({encoded}), 7, 2)"


def quality_features(df, text_col: str, id_col: str):
    """Length/punct/stopword features + a CASE-based quality score."""
    out = (
        df.select(F.col(id_col), F.col(text_col).alias("__text"))
        .withColumn("__tokens", tokens("__text"))
        .withColumn("n_chars_obs", F.length("__text").cast("long"))
        .withColumn("n_tokens", F.size("__tokens").cast("long"))
        .withColumn(
            "n_words",
            F.size(F.expr(f"regexp_extract_all(lower(__text), '{WORD_RE}', 0)")).cast("long"),
        )
        .withColumn(
            "n_punct",
            F.size(F.expr(f"regexp_extract_all(__text, '{PUNCT_RE}', 0)")).cast("long"),
        )
        .withColumn("stopword_ratio", _count_in("__tokens", STOPWORDS) / F.col("n_tokens"))
        .withColumn(
            "avg_token_len",
            F.expr("aggregate(__tokens, 0L, (acc, t) -> acc + length(t))")
            / F.col("n_tokens"),
        )
    )
    score = (
        F.when((F.col("n_tokens") < 5) | (F.col("avg_token_len") > 20), "low")
        .when((F.col("stopword_ratio") > 0.05) & (F.col("n_tokens") >= 20), "high")
        .otherwise("medium")
    )
    return out.withColumn("quality", score).drop("__text", "__tokens")


def decontaminate_ngrams(
    corpus,
    probes,
    *,
    id_col: str,
    text_col: str,
    ngram_k: int,
):
    """Benchmark decontamination: flag corpus docs sharing any word
    `ngram_k`-gram with the probe (benchmark/eval) set.

    Returns (doc_id, n_shared_ngrams) for flagged docs only — the rows a
    curation pipeline would quarantine before training.

    Scale shape: the probe set is the eval suite — tiny and bounded — so
    its distinct n-gram set is BROADCAST; the corpus is one pure map
    stage (tokenize/shingle/explode) into a broadcast semi-join, then a
    single hash-aggregate by doc. No shuffle touches the full n-gram
    stream except the final per-doc count, which is partial+final.
    """
    from sql_engine_spark.operators.textprep import shingles, tokens as _tokens

    def ngram_rows(df, keep_id: bool):
        out = (
            df.select(
                F.col(id_col).alias("__doc"),
                _tokens(text_col).alias("__t"),
            )
            .withColumn("__ngs", F.array_distinct(shingles("__t", ngram_k)))
            .select("__doc", F.explode("__ngs").alias("__ng"))
        )
        return out if keep_id else out.select("__ng").distinct()

    probe_ngrams = F.broadcast(ngram_rows(probes, keep_id=False))
    return (
        ngram_rows(corpus, keep_id=True)
        .join(probe_ngrams, "__ng")
        .groupBy(F.col("__doc").alias("doc_id"))
        .agg(F.count("*").cast("long").alias("n_shared_ngrams"))
    )


def vocab_topk(df, *, text_col: str, k: int):
    """Corpus vocabulary: top-k tokens by frequency (ties -> lexicographic).

    One explode + one hash-aggregate (map-side combined) + TakeOrdered —
    the canonical distributed word count; at 100 TB the only shuffle is
    the partial-count exchange keyed by token.
    """
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def repetition_features(df, *, id_col: str, text_col: str):
    """Per-doc repetition signals: distinct-token ratio and the share of
    the single most frequent token. High top-token share / low distinct
    ratio marks boilerplate and degenerate generations — a standard
    pretraining quality filter. Pure per-row map work (no shuffle); the
    inner distinct×filter scan is quadratic in DOC length only, bounded
    by the tokenizer, never by corpus size."""
    top_cnt = F.expr(
        "array_max(transform(array_distinct(__t), x -> size(filter(__t, y -> y = x))))"
    )
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .withColumn("n_tokens", F.size("__t").cast("long"))
        .withColumn(
            "distinct_ratio", F.size(F.array_distinct("__t")) / F.col("n_tokens")
        )
        .withColumn("top_token_share", top_cnt / F.col("n_tokens"))
        .drop("__t")
    )


def fingerprint(tokens_col: str) -> "F.Column":
    """OpenRefine-style fingerprint: md5 of the sorted distinct token set.
    Robust to word order and duplication — the canonical cheap near-dup key."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.col(tokens_col))), " ")
    )


def sql_fingerprint(tokens_expr: str) -> str:
    return f"md5(array_to_string(list_sort(list_distinct({tokens_expr})), ' '))"


# PII patterns, restricted (like WORD_RE above) to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): literal
# char classes, +, explicit [.] instead of escapes.
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
IPV4_RE = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"


def pii_redact(df, text_col: str, id_col: str):
    """PII redaction: replace email addresses and IPv4 literals with
    placeholder tags and count the occurrences per document — the
    compliance pass every pretraining pipeline runs before training.

    Pure per-row regex map work (JVM regexp_replace/regexp_extract_all,
    no Python), so it scales linearly with zero shuffles. Emails are
    redacted before IPs so a numeric mail host can't be double-counted.
    Returns (id, n_emails, n_ips, clean_text).
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    n_emails = F.size(
        F.regexp_extract_all("__text", F.lit(EMAIL_RE), F.lit(0))
    ).cast("long")
    n_ips = F.size(F.regexp_extract_all("__text", F.lit(IPV4_RE), F.lit(0))).cast(
        "long"
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("__text"), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return out.select(
        id_col,
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        clean.alias("clean_text"),
    )


#: Payment-card candidate: a bare 13-19 digit run (separator-free form;
#: identical Java/RE2 semantics).
CARD_RE = "[0-9]{13,19}"


def _luhn_term_spark(cand: str) -> str:
    # i-th digit from the RIGHT (Luhn positions are right-anchored);
    # doubled on even positions with the 9-subtraction.
    d = f"(ascii(substring(reverse({cand}), i, 1)) - 48)"
    return (
        f"CASE WHEN i % 2 = 1 THEN {d} "
        f"ELSE CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END END"
    )


def luhn_valid_sparksql(cand: str) -> str:
    """Spark-SQL boolean: `cand` (a digit string) passes the Luhn
    checksum. One fold over the digit positions — pure expression."""
    return (
        f"aggregate(sequence(1, length({cand})), 0, "
        f"(acc, i) -> acc + ({_luhn_term_spark(cand)})) % 10 = 0"
    )


def sql_luhn_valid(cand: str) -> str:
    """DuckDB spelling of `luhn_valid_sparksql` (range is end-exclusive;
    list_reduce is seedless — the first element is the seed, which is
    correct for a plain sum)."""
    d = f"(ascii(substring(reverse({cand}), i, 1)) - 48)"
    term = (
        f"CASE WHEN i % 2 = 1 THEN {d} "
        f"ELSE CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END END"
    )
    return (
        f"list_reduce(list_transform(range(1, length({cand}) + 1), i -> {term}), "
        f"(a, b) -> a + b) % 10 = 0"
    )


def pii_luhn_redact(df, text_col: str, id_col: str):
    """Payment-card detection with Luhn validation: digit runs of
    plausible card length are candidates; only runs passing the Luhn
    checksum are counted and redacted (a bare length-regex redactor
    destroys order ids, timestamps, and phone numbers — checksum
    validation is what makes card redaction precise).

    All per-row JVM expression work (regexp_extract_all + a fold per
    candidate), zero shuffles at any scale. Returns
    (id, n_candidates, n_valid_cards, clean_text) with valid cards
    replaced by '<CARD>'.
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    cands = F.regexp_extract_all("__text", F.lit(CARD_RE), F.lit(0))
    valid = F.expr(f"filter(regexp_extract_all(__text, '{CARD_RE}', 0), "
                   f"c -> {luhn_valid_sparksql('c')})")
    clean = F.expr(
        f"aggregate(filter(regexp_extract_all(__text, '{CARD_RE}', 0), "
        f"c -> {luhn_valid_sparksql('c')}), __text, "
        f"(acc, c) -> replace(acc, c, '<CARD>'))"
    )
    return out.select(
        id_col,
        F.size(cands).cast("long").alias("n_candidates"),
        F.size(valid).cast("long").alias("n_valid_cards"),
        clean.alias("clean_text"),
    )


def sql_pii_redact_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB spellings of the pii_redact output columns (DuckDB's
    regexp_replace needs the 'g' flag to replace ALL matches; Spark
    always does)."""
    return {
        "n_emails": f"CAST(len(regexp_extract_all({text_expr}, '{EMAIL_RE}')) AS BIGINT)",
        "n_ips": f"CAST(len(regexp_extract_all({text_expr}, '{IPV4_RE}')) AS BIGINT)",
        "clean_text": (
            f"regexp_replace(regexp_replace({text_expr}, '{EMAIL_RE}', '<EMAIL>', 'g'),"
            f" '{IPV4_RE}', '<IP>', 'g')"
        ),
    }


def gopher_quality(df, text_col: str, id_col: str):
    """Gopher-style rule-based quality flags (Rae et al., "Scaling
    Language Models: ... Gopher", 2021, §A1.1): word-count bounds, mean
    word length bounds, a minimum stopword presence, and a distinct-token
    floor — each as its own boolean so downstream mixing can weight rules
    differently, plus the conjunction. Thresholds here are tuned to the
    synthetic corpus's ~56-token docs; production values are the paper's.
    Pure per-row map work, zero shuffles."""
    out = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .withColumn("n_tokens", F.size("__t").cast("long"))
        .withColumn(
            "__sumlen", F.expr("aggregate(__t, 0L, (acc, t) -> acc + length(t))")
        )
    )
    avg_len = F.col("__sumlen") / F.col("n_tokens")
    wc_ok = (F.col("n_tokens") >= 30) & (F.col("n_tokens") <= 80)
    wl_ok = (avg_len >= 3.0) & (avg_len <= 10.0)
    stop_ok = _count_in("__t", STOPWORDS) >= 2
    uniq_ok = (F.size(F.array_distinct("__t")) / F.col("n_tokens")) > 0.3
    return out.select(
        id_col,
        "n_tokens",
        wc_ok.alias("wc_ok"),
        wl_ok.alias("wl_ok"),
        stop_ok.alias("stop_ok"),
        uniq_ok.alias("uniq_ok"),
        (wc_ok & wl_ok & stop_ok & uniq_ok).alias("pass_gopher"),
    )


def tfidf_keywords(df, *, id_col: str, text_col: str, k: int):
    """Per-document top-k keywords by tf-idf with a LINEAR idf (N/df
    instead of ln(N/df)): the ranking is monotone-equivalent per token
    and every operation (integer counts, one double division, one
    multiply) is exactly rounded and engine-portable — ln() is only
    faithfully rounded, so a log idf could flip a near-tie between
    engines. Ties break lexicographically.

    Scale shape: one explode + per-(doc, token) hash count (map-side
    combined), document frequencies from a second hash aggregate over
    the distinct (doc, token) pairs (same exchange), N broadcast as a
    1-row literal join, and a per-doc top-k window over the doc's own
    (small) keyword candidates — no corpus-sized sort.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    tf = terms.groupBy("__doc", "token").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    w = Window.partitionBy("__doc").orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf").cast("double") * (F.col("n_docs") / F.col("df")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__doc").alias("doc_id"), "token", "tf", "score", "rank")
    )


def winnow_pairs(
    df,
    *,
    id_col: str,
    text_col: str,
    k: int,
    w: int,
    min_shared: int = 2,
    max_fp_docs: int | None = None,
):
    """Copied-run candidate pairs from winnowing fingerprints: two docs
    sharing >= `min_shared` fingerprints share (with the winnowing
    guarantee) runs of >= w+k-1 identical tokens — the MOSS pairing
    step on top of `winnow_fingerprints`.

    `max_fp_docs` drops fingerprints carried by more than that many
    docs before pairing (same rationale as the LSH hot-bucket cap,
    operators/dedup.py: a fingerprint in thousands of docs is
    boilerplate carrying no discriminating signal, and its pair block
    is quadratic). Shape: fingerprint explode (map), hot-fp count +
    broadcast anti-join, equi-self-join on fp, pair-count aggregate —
    the quadratic cost stays confined to per-fingerprint blocks of at
    most `max_fp_docs`. Returns (id_a, id_b, n_shared_fps).
    """
    from sql_engine_spark.operators.dedup import _persist

    fps = _persist(
        winnow_fingerprints(df, id_col=id_col, text_col=text_col, k=k, w=w).select(
            F.col(id_col).alias("__id"), "fp"
        )
    )
    if max_fp_docs is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > max_fp_docs)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
        .where(F.col("n_shared_fps") >= min_shared)
    )


def block_dedup(df, *, id_col: str, text_col: str, block_tokens: int = 10):
    """Span-level corpus dedup with document RECONSTRUCTION (the C4
    posture, Raffel et al. 2020, which drops repeated three-sentence
    spans; here the span unit is a fixed `block_tokens`-token block —
    the corpus has no sentence boundaries): every block whose content
    occurs more than once ANYWHERE in the corpus (any doc, including
    its own) is removed, and each document's surviving blocks are
    re-joined in order. Stricter than keep-one-occurrence C4 — boiler-
    plate is removed from every document, not left in one survivor —
    which is the variant that composes with doc-level keep-best dedup.

    Shape: block explode (map), one count-by-block-hash aggregate
    (map-side combinable), a same-key join back, and one per-doc
    ordered re-assembly aggregate. The block projection is persisted
    (counts + join probe); caller owns the lifetime via
    release_cached(). Returns (id, n_blocks, n_kept_blocks,
    clean_text) — docs whose every block was duplicated come back with
    an empty clean_text, ready for a length filter.
    """
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.textprep import tokens as _tokens

    B = block_tokens
    base = df.select(F.col(id_col).alias("__id"), _tokens(text_col).alias("__t")).select(
        "__id", "__t", F.expr(f"(size(__t) + {B - 1}) div {B}").alias("__nb")
    )
    # posexplode over a transform() re-evaluates the lambda per emitted
    # row (no CSE through generators) — O(blocks^2) slices per doc, fine
    # for per-doc block counts; the heavy work (count + join) is on the
    # exploded rows.
    blk = _persist(
        base.select(
            "__id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(__nb AS INT) - 1), "
                    f"j -> array_join(slice(__t, j * {B} + 1, {B}), ' '))"
                )
            ).alias("__pos", "__blk"),
        ).withColumn("__h", F.md5("__blk"))
    )
    counts = blk.groupBy("__h").agg(F.count("*").alias("__n"))
    rebuilt = (
        blk.join(counts, "__h")
        .where(F.col("__n") == 1)
        .groupBy("__id")
        .agg(
            F.count("*").cast("long").alias("n_kept_blocks"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(__pos, __blk))), s -> s.__blk), ' ')"
            ).alias("clean_text"),
        )
    )
    return base.join(rebuilt, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.col("__nb").cast("long").alias("n_blocks"),
        F.coalesce("n_kept_blocks", F.lit(0)).alias("n_kept_blocks"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def winnow_fingerprints(df, *, id_col: str, text_col: str, k: int, w: int):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS scheme): hash every ORDERED k-gram, slide a window
    of `w` consecutive gram hashes, keep each window's minimum, dedupe.
    Guarantees any shared run of >= w+k-1 tokens between two docs shares
    at least one fingerprint — the rolling-hash substring-dedup primitive
    that set-based fingerprints (see `fingerprint`) can't provide.

    Hashes are md5 hex strings: lexicographic min is a total order
    available identically in Spark and DuckDB, so no integer rolling-hash
    portability games are needed. Pure per-row map work + explode; zero
    shuffles at any corpus size.

    Returns (id, fp) — one row per distinct fingerprint per doc.
    """
    from sql_engine_spark.operators.textprep import shingles_expr, tokens as _tokens

    fps = F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(size(__hs) - {w - 1}, 1)),"
        f"  i -> array_min(slice(__hs, i, {w}))))"
    )
    return (
        df.select(F.col(id_col), _tokens(text_col).alias("__t"))
        .withColumn(
            "__hs", F.expr(f"transform({shingles_expr('__t', k)}, g -> md5(g))")
        )
        .select(id_col, F.explode(fps).alias("fp"))
    )


# --- Hashed-feature linear quality classifier -------------------------
#
# The fastText-style quality filter (Joulin et al. 2017, "Bag of Tricks
# for Efficient Text Classification") as used by CCNet/GPT-3-era data
# pipelines: hash each token into a fixed feature space, score with a
# linear model, threshold. Inference is a pure per-row map — ZERO
# shuffles at any corpus size — which is exactly why production
# pipelines run a linear scorer over 100 TB rather than a transformer.
#
# The weight vector here is a deterministic function of the bucket id (a
# Knuth multiplicative hash folded into [-0.5, 0.5)) standing in for
# trained weights: the Spark plan, feature hashing, and fold order are
# the real article, and a trained model would drop in as a literal
# array the same way `plane_pattern_expr` bakes LSH hyperplanes.

CLS_BUCKETS = 256  # 2 hex chars of md5
CLS_MULT = 2654435761  # Knuth's 2^32 / phi
CLS_MOD = 997


def _weight_expr(tok: str) -> str:
    """Spark-SQL weight of one token: bucket -> pseudo-weight in
    [-0.5, 0.5). Integer arithmetic end-to-end until the final
    division, so the value is bit-identical in any engine."""
    b = f"CAST(conv(substring(md5({tok}), 1, 2), 16, 10) AS BIGINT)"
    return (
        f"(CAST(({b} * {CLS_MULT}) % {CLS_MOD} AS DOUBLE) "
        f"/ CAST({CLS_MOD} AS DOUBLE) - 0.5D)"
    )


def hashed_linear_score(df, *, id_col: str, text_col: str, carry_cols: list[str] = ()):
    """Per-document linear score over hashed token features.

    score = left-to-right fold of per-token weights (deterministic
    order, so the double sum is bit-identical to the oracle's
    list_reduce); label thresholds at 0. Returns
    (id, *carry_cols, n_tokens, score, label) — carry_cols ride along
    so consumers don't re-scan the corpus to rejoin attributes.
    """
    from sql_engine_spark.operators.textprep import tokens as _tokens

    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        _tokens(text_col).alias("__t"),
    ).select(
        id_col,
        *carry_cols,
        F.size("__t").cast("long").alias("n_tokens"),
        F.expr(
            f"aggregate(transform(__t, t -> {_weight_expr('t')}), "
            f"CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("score"),
    ).withColumn(
        "label", F.when(F.col("score") > 0, "keep").otherwise("drop")
    )


def sql_hashed_linear_score(source: str = "documents") -> str:
    """DuckDB oracle: identical hashing, weights, and fold order."""
    from sql_engine_spark.operators.textprep import sql_tokens

    hex_to_int = (
        "list_reduce(list_transform(range(1, 3), "
        "i -> CAST(instr('0123456789abcdef', substring(md5(t), i, 1)) - 1 "
        "AS BIGINT)), (a, b) -> a * 16 + b)"
    )
    w = (
        f"(CAST(({hex_to_int} * {CLS_MULT}) % {CLS_MOD} AS DOUBLE) "
        f"/ CAST({CLS_MOD} AS DOUBLE) - CAST(0.5 AS DOUBLE))"
    )
    toks = sql_tokens("text")
    return f"""
        SELECT doc_id,
               CAST(len({toks}) AS BIGINT) AS n_tokens,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list_transform({toks}, t -> {w})),
                   (a, x) -> a + x) AS score,
               CASE WHEN list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list_transform({toks}, t -> {w})),
                   (a, x) -> a + x) > 0 THEN 'keep' ELSE 'drop' END AS label
        FROM {source}
    """
