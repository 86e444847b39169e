"""Training-data curation queries: benchmark decontamination, corpus
vocabulary, repetition-based quality signals.

These extend the reference's surface (which stops at single-table SELECT,
/root/reference/src/planner/mod.rs:202-207) with the operations an LLM
pretraining pipeline runs over a 100 TB documents table. Each query is
exact-checked against a DuckDB oracle computing the identical pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.text import (
    decontaminate_ngrams,
    repetition_features,
    sql_hashed_linear_score,
    vocab_topk,
)
from sql_engine_spark.operators.similarity import sql_lsh_bucket
from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens
from sql_engine_spark.registry import register

# The "benchmark" (eval) slice is carved deterministically from documents
# so the oracle can reproduce it: every 97th doc plays the eval suite.
_PROBE_MOD = 97
_DECON_K = 3


@register(
    "text_decontaminate",
    oracle=f"""
        WITH ngs AS (
            SELECT doc_id,
                   list_distinct({sql_shingles(sql_tokens('text'), _DECON_K)}) AS g
            FROM documents
        ),
        probe AS (
            SELECT DISTINCT unnest(g) AS ng FROM ngs WHERE doc_id % {_PROBE_MOD} = 0
        ),
        corp AS (
            SELECT doc_id, unnest(g) AS ng FROM ngs WHERE doc_id % {_PROBE_MOD} <> 0
        )
        SELECT corp.doc_id AS doc_id, COUNT(*) AS n_shared_ngrams
        FROM corp JOIN probe USING (ng)
        GROUP BY corp.doc_id
    """,
    doc="Benchmark decontamination: corpus docs sharing any word "
    f"{_DECON_K}-gram with the (deterministic) eval slice, with the "
    "shared-gram count. Probe n-grams broadcast; corpus side is one map "
    "stage + one per-doc hash-aggregate — no corpus-sized shuffle.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    probes = docs.where(F.col("doc_id") % _PROBE_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _PROBE_MOD != 0)
    return decontaminate_ngrams(
        corpus, probes, id_col="doc_id", text_col="text", ngram_k=_DECON_K
    )


@register(
    "text_vocab_topk",
    oracle=f"""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest({sql_tokens('text')}) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 100
    """,
    doc="Corpus vocabulary head: top-100 tokens by frequency (ties break "
    "lexicographically). Distributed word count: explode -> map-side "
    "partial counts -> one exchange keyed by token -> TakeOrdered.",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load(spark, sf_dir, "documents"), text_col="text", k=100)


_BUDGET_TOKENS = 800


@register(
    "curation_token_budget",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        )
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY h
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM t
        QUALIFY cum_tokens <= {_BUDGET_TOKENS}
    """,
    doc="Data mixing under a per-source token budget: docs are taken in "
    "deterministic hash order (md5 of the id — a reproducible shuffle) "
    "until each source's cumulative token count hits the budget. The "
    "running sum is a two-level (bucketed) prefix scan: the widest "
    "window is partitioned by (source, range-bucket-of-hash) — parallel "
    "width sources x buckets, never one task per source — with the "
    "cross-bucket carry prefix-summed over the tiny per-bucket totals "
    "and broadcast back. Integer token sums, so the cutoff is "
    "engine-exact and bucket-count-independent. At scale this is the "
    "standard way to hit a target mixture (e.g. 30% web / 30% code) "
    "without a second pass.",
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.prefix import bucketed_running_sum, hex_prefix_bucket
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("__h"),
    )
    n_buckets = max(spark.sparkContext.defaultParallelism, 16)
    out = bucketed_running_sum(
        docs,
        part_cols=["source"],
        order_col="__h",
        value_col="n_tokens",
        bucket=hex_prefix_bucket("__h", n_buckets),
        out_col="cum_tokens",
    )
    return (
        out.where(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


_SEM_PLANES = 6


@register(
    "dedup_semantic_lsh",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        )
        SELECT {sql_lsh_bucket('e', _SEM_PLANES, 64)} AS bucket,
               MIN(vec_id) AS rep_id,
               COUNT(*) AS n_members
        FROM v
        GROUP BY 1
    """,
    doc="Semantic dedup (SemDeDup-style): embeddings hashed into random-"
    f"hyperplane LSH buckets ({_SEM_PLANES} planes -> 64 cells); each "
    "bucket keeps one representative (min id) and records its member "
    "count. ONE hash-aggregate shuffle over the corpus — the cheap first "
    "pass before exact cosine verification within buckets.",
)
def dedup_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import lsh_bucket

    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id", lsh_bucket("embedding", _SEM_PLANES, 64).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.min("vec_id").alias("rep_id"),
            F.count("*").cast("long").alias("n_members"),
        )
    )


_PAIR_COS = """
    list_reduce(list_transform(list_zip(a.e, c.e), p -> p[1] * p[2]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
"""


@register(
    "dedup_semantic_verified",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        b AS (
            SELECT vec_id, e, {sql_lsh_bucket('e', _SEM_PLANES, 64)} AS bucket
            FROM v
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               {_PAIR_COS} AS cosine
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        WHERE {_PAIR_COS} >= 0.25
    """,
    doc="Semantic dedup stage 2: exact cosine verification WITHIN each "
    "LSH bucket — pairs above the similarity threshold (0.25 on this synthetic corpus; ~0.9 for real embeddings) are the actual "
    "near-duplicates to drop. The all-pairs work is confined to bucket "
    "blocks (corpus/2^planes each), so the join is an equi-join on the "
    "bucket key with per-block quadratic cost only — the two-stage "
    "SemDeDup shape: cheap bucketing, then exact math on candidates.",
)
def dedup_semantic_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import (
        embedding_cosine_pairs,
        lsh_bucket,
    )

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "__bucket", lsh_bucket("embedding", _SEM_PLANES, 64)
    )
    return embedding_cosine_pairs(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        block_col="__bucket",
        threshold=0.25,
    ).select(
        F.col("id_a"), F.col("id_b"), F.col("cosine")
    )


_SEM_TABLES = 8
_SEM_TPLANES = 4


def _sem_multitable_oracle() -> str:
    bucket_rows = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{sql_lsh_bucket('e', _SEM_TPLANES, 64, offset=t * _SEM_TPLANES)} AS bk FROM v"
        for t in range(_SEM_TABLES)
    )
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        b AS ({bucket_rows}),
        cands AS (
            SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
            FROM b x JOIN b y ON x.t = y.t AND x.bk = y.bk AND x.vec_id < y.vec_id
        )
        SELECT id_a, id_b, {_PAIR_COS} AS cosine
        FROM cands
        JOIN v a ON a.vec_id = id_a
        JOIN v c ON c.vec_id = id_b
        WHERE {_PAIR_COS} >= 0.25
    """


@register(
    "dedup_semantic_multitable",
    oracle=_sem_multitable_oracle(),
    doc="Semantic dedup with OR-amplification: "
    f"{_SEM_TABLES} independent LSH tables of {_SEM_TPLANES} hyperplanes "
    "each — a pair is a candidate on ANY shared bucket, then exact "
    "cosine verifies. Pair recall 1-(1-p)^tables vs p for the "
    "single-table variant (~0.6 even at cosine 0.25, ~0.99 at 0.9, vs "
    "~0.04 for one 6-plane table — floors pinned in tests); precision "
    "exact. The production SemDeDup shape when recall matters: bucket "
    "rows replicate tables-x, quadratic cost stays confined to bucket "
    "blocks.",
)
def dedup_semantic_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import semantic_dup_pairs_multitable

    return semantic_dup_pairs_multitable(
        load(spark, sf_dir, "embeddings"),
        id_col="vec_id",
        vec_col="embedding",
        planes=_SEM_TPLANES,
        tables=_SEM_TABLES,
        dim=64,
        threshold=0.25,
    )


@register(
    "text_repetition",
    oracle=f"""
        WITH t AS (SELECT doc_id, {sql_tokens('text')} AS tt FROM documents)
        SELECT doc_id,
               CAST(len(tt) AS BIGINT) AS n_tokens,
               len(list_distinct(tt)) / len(tt) AS distinct_ratio,
               list_max(list_transform(list_distinct(tt),
                   x -> len(list_filter(tt, y -> y = x)))) / len(tt)
                 AS top_token_share
        FROM t
    """,
    doc="Repetition quality signals per doc: distinct-token ratio and the "
    "most-frequent token's share. Pure per-row map work; the inner scan "
    "is quadratic in document length only, never corpus size.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_features(
        load(spark, sf_dir, "documents"), id_col="doc_id", text_col="text"
    )


_CHUNK = 32
_STRIDE = 24


@register(
    "text_chunk_windows",
    oracle=f"""
        WITH t AS (SELECT doc_id, {sql_tokens('text')} AS tt FROM documents)
        SELECT doc_id, k AS chunk_id,
               array_to_string(tt[k * {_STRIDE} + 1 : k * {_STRIDE} + {_CHUNK}], ' ')
                   AS chunk_text,
               CAST(len(tt[k * {_STRIDE} + 1 : k * {_STRIDE} + {_CHUNK}]) AS BIGINT)
                   AS n_tokens
        FROM t CROSS JOIN LATERAL (
            SELECT unnest(range(0, CAST(floor((len(tt) - 1) / {_STRIDE}) AS BIGINT) + 1)) AS k
        ) u
    """,
    doc=f"Context-window chunking for training: each doc is split into "
    f"{_CHUNK}-token windows with stride {_STRIDE} ({_CHUNK - _STRIDE}-token "
    "overlap so no boundary context is lost). The chunk index explodes "
    "from a tiny integer sequence and each chunk is a slice of the "
    "already-tokenized array — per-row map work, chunk count linear in "
    "document length, no shuffle.",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("__t"))
    return (
        docs.select(
            "doc_id",
            "__t",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("__t") - 1) / _STRIDE).cast("int"),
                )
            ).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("__t", F.col("k") * _STRIDE + 1, _CHUNK), " "
            ).alias("chunk_text"),
            F.size(F.slice("__t", F.col("k") * _STRIDE + 1, _CHUNK))
            .cast("long")
            .alias("n_tokens"),
        )
    )


@register(
    "curation_quality_sample",
    oracle="""
        WITH feats AS (
            SELECT doc_id,
                   CASE WHEN n_tokens < 5 OR avg_token_len > 20 THEN 'low'
                        WHEN stopword_ratio > 0.05 AND n_tokens >= 20 THEN 'high'
                        ELSE 'medium' END AS quality,
                   substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
            FROM (
                SELECT doc_id,
                       CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
                           AS n_tokens,
                       len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is')))
                           / len(string_split_regex(lower(trim(text)), '\\s+'))
                           AS stopword_ratio,
                       list_reduce(list_transform(
                           string_split_regex(lower(trim(text)), '\\s+'),
                           t -> length(t)), (a, b) -> a + b)
                           / len(string_split_regex(lower(trim(text)), '\\s+'))
                           AS avg_token_len
                FROM documents
            )
        )
        SELECT doc_id, quality FROM feats
        WHERE CASE quality WHEN 'high' THEN TRUE
                           WHEN 'medium' THEN h < '8'
                           ELSE h < '2' END
    """,
    doc="Quality-weighted sampling: keep all high-quality docs, a "
    "deterministic ~50% hash sample of medium, ~12.5% of low — the "
    "standard way to upweight quality in a pretraining mixture while "
    "keeping some tail diversity. Pure scan-side filter (quality "
    "features + md5 threshold), zero shuffles.",
)
def curation_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.text import quality_features

    feats = quality_features(
        load(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("doc_id", "quality")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = (
        F.when(F.col("quality") == "high", F.lit(True))
        .when(F.col("quality") == "medium", h < "8")
        .otherwise(h < "2")
    )
    return feats.where(keep).select("doc_id", "quality")


@register(
    "curation_dataset_card",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, source, md5(text) AS h,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               SUM(n_tokens) AS total_tokens,
               CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
               CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS en_share,
               CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
               1.0 - (CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*)) AS exact_dup_rate
        FROM t
    """,
    doc="Dataset-card summary in ONE pass over the corpus: doc/source/"
    "lang counts, token totals and shape, English share, and the exact-"
    "duplicate rate via distinct content digests — the topline numbers a "
    "dataset card or ingest health check reports. All aggregates are "
    "map-side combinable (distincts are Spark's standard expand-rewrite) "
    "and token sums are integers, so the card is engine-exact.",
)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.textprep import tokens

    t = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    return t.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("en_share"),
        F.countDistinct("h").cast("long").alias("n_unique_texts"),
        (
            F.lit(1.0) - (F.countDistinct("h").cast("double") / F.count("*"))
        ).alias("exact_dup_rate"),
    )


# DuckDB spelling of Spark's conv(hex, 16, 10): a left fold over the hex
# chars (seedless list_reduce — the first digit seeds the accumulator).
def _sql_hex_to_int(hex_expr: str, n_chars: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {n_chars + 1}), "
        f"i -> CAST(instr('0123456789abcdef', substring({hex_expr}, i, 1)) - 1 "
        f"AS BIGINT)), (a, b) -> a * 16 + b)"
    )


@register(
    "curation_importance_weights",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang = 'en' AS is_t,
                   {_sql_hex_to_int("md5(tok)", 2)} AS b
            FROM (SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok
                  FROM documents)
        ),
        s AS (
            SELECT b, COUNT(*) AS cn,
                   SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tn
            FROM t GROUP BY b
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(s.tn + 1) AS BIGINT) AS target_mass,
               CAST(SUM(s.cn + 1) AS BIGINT) AS corpus_mass,
               CAST(SUM(s.tn + 1) AS BIGINT) / CAST(SUM(s.cn + 1) AS BIGINT)
                   AS weight
        FROM t JOIN s USING (b)
        GROUP BY doc_id
    """,
    doc="Hashed-feature importance weights for domain-targeted data "
    "selection (the DSIR posture, Xie et al. 2023, with exact integer "
    "masses instead of log-products so the score is bit-reproducible "
    "across engines): tokens hash into 256 buckets; per-doc weight is "
    "the ratio of add-one-smoothed target-distribution mass (lang='en' "
    "here) to corpus mass over the doc's tokens. Shape: one bounded "
    "256-row stats aggregate, then explode -> broadcast-join stats -> "
    "per-doc aggregate; no corpus-sized shuffle beyond the doc agg.",
)
def curation_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("__is_t"),
        F.explode(tokens("text")).alias("__t"),
    ).withColumn(
        "__b", F.conv(F.substring(F.md5("__t"), 1, 2), 16, 10).cast("long")
    )
    stats = toks.groupBy("__b").agg(
        F.count("*").alias("__cn"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__tn"),
    )
    return (
        toks.join(F.broadcast(stats), "__b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("__tn") + 1).cast("long").alias("target_mass"),
            F.sum(F.col("__cn") + 1).cast("long").alias("corpus_mass"),
        )
        .withColumn(
            "weight", F.col("target_mass") / F.col("corpus_mass")
        )
    )


# Shared with streaming_mixture_sample (queries/streaming.py): the
# stream must converge to exactly this batch semantics.
MIXTURE_SAMPLE_ORACLE = f"""
        WITH c AS (SELECT source, lang, COUNT(*) AS n
                   FROM documents GROUP BY source, lang),
        r AS (
            SELECT source, lang,
                   CAST(floor(sqrt(CAST((SELECT MIN(n) FROM c) AS DOUBLE) / n)
                              * 4294967296.0) AS BIGINT) AS thr
            FROM c
        )
        SELECT d.doc_id, d.source, d.lang
        FROM documents d
        JOIN r ON d.source = r.source AND d.lang = r.lang
        WHERE {_sql_hex_to_int("md5(CAST(d.doc_id AS VARCHAR))", 8)} < r.thr
    """


def mixture_rates(docs: DataFrame) -> DataFrame:
    """(source, lang, __thr): the temperature-flattened keep-threshold
    per stratum — the bounded 'trained' side shared by the batch and
    streaming mixture samplers."""
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("__n"))
    return counts.crossJoin(
        F.broadcast(counts.agg(F.min("__n").alias("__minn")))
    ).select(
        "source",
        "lang",
        F.floor(
            F.sqrt(F.col("__minn").cast("double") / F.col("__n"))
            * F.lit(4294967296.0)
        )
        .cast("long")
        .alias("__thr"),
    )


def mixture_hash_u() -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")


@register(
    "curation_mixture_sample",
    oracle=MIXTURE_SAMPLE_ORACLE,
    doc="Temperature-flattened source mixture (the multilingual-"
    "pretraining alpha=0.5 rebalance) over (source, lang) strata: each "
    "stratum keeps a sqrt(min_count/count) fraction of its docs — the "
    "smallest stratum keeps everything, larger ones are downsampled — "
    "selected by content hash (reproducible across engines, task "
    "retries, and reruns; see sampling.py). Shape: one bounded "
    "per-source count aggregate broadcast back, then a pure scan-side "
    "filter; no corpus shuffle at any scale.",
)
def curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(mixture_rates(docs)), ["source", "lang"])
        .where(mixture_hash_u() < F.col("__thr"))
        .select("doc_id", "source", "lang")
    )


_BLOCK_B = 10


@register(
    "curation_block_dedup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
        ),
        b AS (
            SELECT doc_id, j AS pos,
                   array_to_string(tk[j * {_BLOCK_B} + 1 : j * {_BLOCK_B} + {_BLOCK_B}],
                                   ' ') AS blk
            FROM (SELECT doc_id, tk,
                         unnest(range(0, (len(tk) + {_BLOCK_B - 1}) // {_BLOCK_B})) AS j
                  FROM t)
        ),
        c AS (SELECT md5(blk) AS h, COUNT(*) AS n FROM b GROUP BY md5(blk)),
        r AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_kept_blocks,
                   string_agg(blk, ' ' ORDER BY pos) AS clean_text
            FROM b JOIN c ON md5(b.blk) = c.h
            WHERE c.n = 1
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST((len(tk) + {_BLOCK_B - 1}) // {_BLOCK_B} AS BIGINT) AS n_blocks,
               COALESCE(r.n_kept_blocks, 0) AS n_kept_blocks,
               COALESCE(r.clean_text, '') AS clean_text
        FROM t LEFT JOIN r ON t.doc_id = r.doc_id
    """,
    doc=f"Span-level corpus dedup with document reconstruction (C4 "
    f"posture at {_BLOCK_B}-token block granularity): any block whose "
    "content occurs more than once anywhere in the corpus is removed "
    "from every document, and surviving blocks re-join in order — the "
    "operator that TRANSFORMS the corpus rather than just scoring it. "
    "One explode + one count-by-hash + same-key join + per-doc ordered "
    "re-assembly; nothing quadratic.",
)
def curation_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.text import block_dedup

    docs = load(spark, sf_dir, "documents")
    return block_dedup(docs, id_col="doc_id", text_col="text", block_tokens=_BLOCK_B)


@register(
    "curation_perplexity_buckets",
    oracle=f"""
        WITH scored AS (
            {sql_hashed_linear_score()}
        ),
        withlang AS (
            SELECT s.doc_id, d.lang, s.score
            FROM scored s JOIN documents d USING (doc_id)
        ),
        stats AS (
            SELECT lang,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(score AS DECIMAL(27,6))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(score * score AS DECIMAL(27,6))) AS DOUBLE) AS s2
            FROM withlang GROUP BY lang
        )
        SELECT doc_id, lang, score,
               CASE WHEN n <= 1.0 OR (s2 - (s * s) / n) <= 0.0 THEN NULL
                    ELSE (score - s / n)
                         / sqrt((s2 - (s * s) / n) / (n - 1.0)) END AS z,
               CASE WHEN n <= 1.0 OR (s2 - (s * s) / n) <= 0.0 THEN 'middle'
                    WHEN (score - s / n) / sqrt((s2 - (s * s) / n) / (n - 1.0)) < -0.5
                        THEN 'head'
                    WHEN (score - s / n) / sqrt((s2 - (s * s) / n) / (n - 1.0)) > 0.5
                        THEN 'tail'
                    ELSE 'middle' END AS bucket
        FROM withlang JOIN stats USING (lang)
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): score "
    "every doc with the cheap LM proxy (the hashed linear scorer, a "
    "stand-in for a KenLM perplexity), standardize per language with "
    "exact-decimal moments, and split head/middle/tail at z = ±0.5 — "
    "the head/tail split CCNet uses to keep fluent text per language. "
    "Shape: one map pass to score (zero shuffles), a per-lang bounded "
    "stats aggregate broadcast back; sqrt/division are IEEE "
    "correctly-rounded so z is bit-identical cross-engine. Degenerate "
    "groups (one doc, or zero variance) emit z=NULL / bucket 'middle' "
    "EXPLICITLY in both engines — Spark's non-ANSI zero-division "
    "yields NULL while DuckDB yields inf/NaN, a latent cross-engine "
    "mismatch on skewed data the guard removes (round-4 advice).",
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.numeric import DEC
    from sql_engine_spark.operators.text import hashed_linear_score

    docs = load(spark, sf_dir, "documents")
    withlang = hashed_linear_score(
        docs, id_col="doc_id", text_col="text", carry_cols=["lang"]
    ).select("doc_id", "lang", "score")
    stats = withlang.groupBy("lang").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("score").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("score") * F.col("score")).cast(DEC)).cast("double").alias("s2"),
    )
    # Degenerate-group guard (round-4 advice): n=1 or zero variance
    # divides by zero — NULL under Spark's non-ANSI division but
    # inf/NaN in DuckDB, so the guard is EXPLICIT and identical in the
    # oracle: z=NULL, bucket 'middle'. (NULL comparisons below are
    # false in both engines, so 'middle' falls out of the CASE too.)
    ssq = F.col("s2") - (F.col("s") * F.col("s")) / F.col("n")
    z = F.when(
        (F.col("n") > 1.0) & (ssq > 0.0),
        (F.col("score") - F.col("s") / F.col("n"))
        / F.sqrt(ssq / (F.col("n") - F.lit(1.0))),
    )
    return (
        withlang.join(F.broadcast(stats), "lang")
        .withColumn("z", z)
        .withColumn(
            "bucket",
            F.when(F.col("z") < -0.5, "head")
            .when(F.col("z") > 0.5, "tail")
            .otherwise("middle"),
        )
        .select("doc_id", "lang", "score", "z", "bucket")
    )


# Split assignment: cluster-hash thresholds shared by the Spark side
# and the oracle.
# Exact INTEGER thresholds (4294967296 * 8 // 10, * 9 // 10): spelling
# them as 0.8 * 2^32 invites engine-specific float->int conversion —
# Python int() truncates (...836) while DuckDB CAST rounds (...837), a
# one-in-2^32 boundary flake caught in review.
_SPLIT_T_TRAIN = 3435973836
_SPLIT_T_VAL = 3865470566


def _split_expr(cluster_expr: str) -> str:
    u = _sql_hex_to_int(f"md5(CAST({cluster_expr} AS VARCHAR))", 8)
    return (
        f"CASE WHEN {u} < {_SPLIT_T_TRAIN} THEN 'train' "
        f"WHEN {u} < {_SPLIT_T_VAL} THEN 'val' "
        f"ELSE 'test' END"
    )


def _leakage_split_oracle() -> str:
    from sql_engine_spark.queries.dedup import _sql_cc_iter, _sql_minhash_lsh

    return f"""
        WITH cc_pairs AS (
            SELECT id_a, id_b FROM ({_sql_minhash_lsh(3, 8, 4, 0.2)})
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
        {_sql_cc_iter('l2', 'l3')}
        SELECT d.doc_id,
               COALESCE(l3.label, d.doc_id) AS cluster_id,
               {_split_expr('COALESCE(l3.label, d.doc_id)')} AS split
        FROM documents d LEFT JOIN l3 ON l3.node = d.doc_id
    """


@register(
    "curation_leakage_safe_split",
    oracle=_leakage_split_oracle(),
    doc="Leakage-safe train/val/test split (80/10/10): near-dup "
    "clusters (MinHash-LSH pairs -> 3-round connected components) are "
    "assigned to splits ATOMICALLY by a content hash of the cluster "
    "id — no near-duplicate of a validation document can land in "
    "train, the eval-hygiene property a random per-row split violates. "
    "Singletons are their own cluster. Deterministic across engines, "
    "reruns, and partitionings; the invariant (one split per cluster) "
    "holds by construction and is pinned in tests.",
)
def curation_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.queries.dedup import _shared_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = _shared_pairs(spark, sf_dir)
    labels = D.connected_components_fixed(pairs, "id_a", "id_b", iterations=3)
    cluster = F.coalesce(F.col("label"), F.col("doc_id"))
    u = F.conv(
        F.substring(F.md5(cluster.cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            F.when(u < F.lit(_SPLIT_T_TRAIN), "train")
            .when(u < F.lit(_SPLIT_T_VAL), "val")
            .otherwise("test")
            .alias("split"),
        )
    )
