"""Full-text retrieval primitives: inverted index and BM25 top-k.

A training-data pipeline needs corpus search (find contaminated docs,
audit what matched a probe, build retrieval baselines). The two
operators here are the classic IR pair, spelled for Spark scale:

- ``inverted_index``: token -> document frequency + a postings list
  sorted by doc id. ONE corpus shuffle (hash aggregate on the token);
  the postings are sorted per-token with ``array_sort`` AFTER
  ``collect_list`` so the output is deterministic under any partitioning
  (collect_list order is not). At 100 TB a token's postings can be
  wide, but each token is one group — the same bound every search
  engine's posting-list builder lives with; a hot-token cap (stopword
  drop) is the standard mitigation and is exposed as ``max_df``.

- ``bm25_topk``: Robertson/Sparck-Jones BM25 (k1, b) for a LITERAL
  query set against the corpus. The query set is tiny and broadcast
  everywhere; the corpus-side work is one explode + one (doc, term)
  hash aggregate. Global stats (N, avgdl) are 1-row aggregates joined
  by broadcast. Per-(query, doc) term scores are folded in SORTED term
  order via array_sort + aggregate — bit-deterministic double sums —
  and the final per-query ranking goes through the salted two-level
  top-k (operators/similarity.two_level_topk) so no single task ever
  sorts a corpus-proportional score stream.

The reference engine (single-SELECT Rust Volcano executor) has no
GROUP BY + join pipeline long enough to express either; cited per
SURVEY.md §2 as engine-beyond-reference coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.operators.similarity import two_level_topk
from sql_engine_spark.operators.textprep import sql_tokens, tokens


def inverted_index(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
) -> DataFrame:
    """(token, df, postings) — postings = 'doc:tf,doc:tf,...' sorted by
    doc id, serialized to a string so downstream hashing/storage treats
    it as one opaque value. ``max_df`` drops tokens appearing in more
    than that many documents (stopword/hot-key cap)."""
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    idx = tf.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(doc_id, tf))), "
            "s -> concat(s.doc_id, ':', s.tf)), ',')"
        ).alias("postings"),
    )
    if max_df is not None:
        idx = idx.where(F.col("df") <= max_df)
    return idx


def sql_inverted_index(max_df: int | None = None, source: str = "documents") -> str:
    having = f"HAVING COUNT(*) <= {max_df}" if max_df is not None else ""
    return f"""
        WITH tf AS (
            SELECT token, doc_id, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest({sql_tokens('text')}) AS token
                  FROM {source})
            GROUP BY token, doc_id
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS df,
               array_to_string(
                   list_transform(
                       list_sort(list(struct_pack(d := doc_id, t := tf))),
                       s -> concat(s.d, ':', s.t)), ',') AS postings
        FROM tf
        GROUP BY token
        {having}
    """


BM25_K1 = 1.2
BM25_B = 0.75

# (abspath(sf_dir), dataset fingerprint) -> index dir, process-local —
# the SURVEY 7.6 shared-build template applied to retrieval BEFORE the
# family grows (r8 verdict #8: build the index once, don't refactor
# after, as was needed for the graph family).
_BM25_IDX_CACHE: dict[tuple, str] = {}


def bm25_index_shared(spark: SparkSession, sf_dir: str):
    """The retrieval index over `{sf_dir}/documents`, built ONCE per
    (process, dataset) and materialized to parquet: the postings
    relation tf = (doc_id, token, tf, dl) and the doc-stats relation
    docs = (doc_id, dl). A pure function of the corpus — on a real
    cluster these are the index tables a pipeline's indexing stage
    writes (bucketed by token and doc respectively); locally a temp
    dir carries the same contract. Returns (tf_df, docstats_df)."""
    import os

    from sql_engine_spark.io import load
    from sql_engine_spark.operators.dedup import (
        cache_mark,
        dataset_fingerprint,
        release_since,
        tracked_tmpdir,
    )
    from sql_engine_spark.sharedcost import record

    key = (os.path.abspath(sf_dir), dataset_fingerprint(sf_dir, "documents"))
    root = _BM25_IDX_CACHE.get(key)
    if root is None or not os.path.isdir(root):
        import time

        from sql_engine_spark.operators.dedup import _persist

        t0 = time.time()
        docs = load(spark, sf_dir, "documents")
        mark = cache_mark()
        # A repartition(defaultParallelism) before the tokenize (the
        # narrow-file widening rule) was tried in r12 and measured FLAT
        # (6.3s vs 6.8s cold build either way at sf0.1): the build wall
        # is the three writes + persist fan, not the tokenize — and at
        # scale the widen would shuffle full text bytes for nothing
        # (a real corpus arrives as many files, so the scan is already
        # parallel). Left as-is deliberately.
        base = _persist(
            docs.select(
                "doc_id", tokens("text").alias("__t")
            ).select("doc_id", "__t", F.size("__t").cast("long").alias("dl"))
        )
        tf = (
            base.select("doc_id", "dl", F.explode("__t").alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count("*").cast("long").alias("tf"), F.first("dl").alias("dl"))
        )
        root = tracked_tmpdir("sqe_bm25idx_")
        target = spark.sparkContext.defaultParallelism
        tf.repartition(target).write.mode("overwrite").parquet(
            os.path.join(root, "tf.parquet")
        )
        base.select("doc_id", "dl").write.mode("overwrite").parquet(
            os.path.join(root, "docs.parquet")
        )
        # Positional token arrays (doc_id, t, dl) — the third index
        # table: position-aware consumers (BM25F fields, phrase match,
        # snippet windows) posexplode THIS instead of re-tokenizing the
        # corpus. Written from the same persisted tokenize pass.
        base.select(
            "doc_id", F.col("__t").alias("t"), "dl"
        ).write.mode("overwrite").parquet(os.path.join(root, "tokens.parquet"))
        release_since(mark)
        _BM25_IDX_CACHE[key] = root
        record("bm25_index", time.time() - t0)
    return (
        spark.read.parquet(os.path.join(root, "tf.parquet")),
        spark.read.parquet(os.path.join(root, "docs.parquet")),
    )


# name -> parquet path of a first-pass ranking table, process-local
# (keyed like _BM25_IDX_CACHE: abspath + dataset fingerprint + name).
_RANKED_CACHE: dict[tuple, str] = {}


def ranked_shared(spark: SparkSession, sf_dir: str, name: str, build):
    """A first-pass ranking table (query_id, doc_id, score, rank) over
    the house query set, built ONCE per (process, dataset) and
    materialized to parquet — prefix_filter_pairs_shared's pattern
    applied to retrieval's first pass (r13, guide §1.2 don't compute
    twice). Nine registered evaluators/fusers re-ranked the SAME house
    queries with the SAME ranker before consuming the list; on a real
    cluster this is the ranking table the retrieval stage writes and
    every evaluator/fuser scans. `build()` evaluates the ranker at the
    house k; consumers needing k' < k filter `rank <= k'` — a
    rank-prefix under the (score DESC, doc ASC) strict total order is
    bit-identical to ranking at k'. Doubles round-trip parquet exactly,
    so scanned scores equal the in-plan pipeline's bit for bit. Cold
    build cost lands in the shared_builds ledger (bench line items)."""
    import os
    import time

    from sql_engine_spark.operators.dedup import (
        cache_mark,
        dataset_fingerprint,
        release_since,
        tracked_tmpdir,
    )
    from sql_engine_spark.sharedcost import record

    key = (
        os.path.abspath(sf_dir),
        dataset_fingerprint(sf_dir, "documents"),
        name,
    )
    path = _RANKED_CACHE.get(key)
    if path is None or not os.path.isdir(path):
        t0 = time.time()
        mark = cache_mark()
        ranked = build()
        path = os.path.join(
            tracked_tmpdir(f"sqe_rank_{name}_"), "ranked.parquet"
        )
        # k rows per house query — one file, one scan split is right.
        ranked.coalesce(1).write.mode("overwrite").parquet(path)
        release_since(mark)
        _RANKED_CACHE[key] = path
        record(f"rank_{name}", time.time() - t0)
    return spark.read.parquet(path)


def token_arrays_shared(spark: SparkSession, sf_dir: str):
    """The shared index's positional token-array relation
    (doc_id, t array<string>, dl) — built by the same once-per-
    (process, dataset) bm25_index_shared pass. Oracle twin: idx_base
    in sql_bm25_index. Consumers that need token POSITIONS (BM25F
    field split, phrase adjacency, snippet windows) read this instead
    of re-tokenizing documents, so the corpus tokenize stays one
    indexing-stage pass no matter how many rankers run."""
    import os

    from sql_engine_spark.operators.dedup import dataset_fingerprint

    bm25_index_shared(spark, sf_dir)
    # Same (abspath, dataset-fingerprint) key bm25_index_shared caches
    # under — a path whose dataset changed mid-process misses here and
    # the rebuild above re-registers, instead of a path-only scan
    # returning whichever stale root was inserted first.
    key = (os.path.abspath(sf_dir), dataset_fingerprint(sf_dir, "documents"))
    root = _BM25_IDX_CACHE.get(key)
    if root is None or not os.path.isdir(root):
        raise RuntimeError("bm25_index_shared did not register an index root")
    return spark.read.parquet(os.path.join(root, "tokens.parquet"))


def sql_bm25_index(source: str = "documents") -> str:
    """Oracle CTE fragment mirroring bm25_index_shared: yields
    `idx_tf(doc_id, token, tf, dl)` and `idx_docs(doc_id, dl)`."""
    toks = sql_tokens("text")
    return f"""idx_base AS (
            SELECT doc_id, {toks} AS t,
                   CAST(len({toks}) AS BIGINT) AS dl
            FROM {source}
        ),
        idx_tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf,
                   ANY_VALUE(dl) AS dl
            FROM (SELECT doc_id, dl, unnest(t) AS token FROM idx_base)
            GROUP BY doc_id, token
        ),
        idx_docs AS (SELECT doc_id, dl FROM idx_base)"""


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, str]],
    *,
    id_col: str,
    text_col: str,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k docs per literal query.

    Returns (query_id, doc_id, score, rank). Deterministic: per-doc
    term contributions fold in sorted term order; ranking tie-breaks
    (desc score, asc doc_id) through the two-level top-k.
    """
    spark = df.sparkSession
    qterms = (
        spark.createDataFrame(queries, ["query_id", "qtext"])
        .select("query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("token"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t")
    ).select("doc_id", "__t", F.size("__t").cast("double").alias("dl"))
    # Corpus-global stats: a 1x2 relation, broadcast into every branch.
    # avgdl is an EXACT integer sum divided once — a double AVG's
    # summation order varies with partitioning and would wobble the
    # last ulp of every score.
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    toks = base.select("doc_id", "dl", F.explode("__t").alias("token"))
    # Keep only query terms before the (doc, term) aggregate: the term
    # list is tiny and broadcast, so the corpus explode is filtered
    # map-side and the shuffle carries query-relevant tokens only.
    qtok = qterms.select("token").distinct()
    tf = (
        toks.join(F.broadcast(qtok), "token")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    # Robertson idf WITHOUT the log (see _bm25_score_rank): libm `ln`
    # differs between the JVM and glibc in the last ulp (measured on
    # this corpus: Math.log(0x1.451c3a672dbfcp+0) = ...376 vs glibc
    # ...377), so the idf stays the raw odds ratio — pure rational
    # arithmetic, bit-reproducible in any IEEE-754 engine. CAVEAT
    # (round-4 advice): dropping the log is monotone PER TERM but the
    # per-document SUM over several terms is NOT rank-equivalent to
    # true BM25 — a rare term's un-logged idf dominates far harder
    # than its logged form, so multi-term top-k lists CAN differ from
    # canonical BM25, beyond any rescale. This operator's contract is
    # "deterministic BM25-family scorer, exact cross-engine"; where
    # canonical BM25 ranking matters more than bit-equality, plug
    # F.log back in (and ln() in sql_bm25_topk) and accept
    # hash-compare on rank only.
    return _bm25_score_rank(tf, stats, qterms, k)


def bm25_topk_from_index(
    tf_idx: DataFrame,
    docstats: DataFrame,
    queries: list[tuple[str, str]],
    *,
    k: int = 10,
) -> DataFrame:
    """bm25_topk over the prebuilt shared index (bm25_index_shared):
    identical scores — the (doc, term) tf aggregate is exactly what the
    index stores, stats derive from the doc-stats relation by the same
    exact-integer-sum avgdl, and the scoring/fold/top-k pipeline is
    shared verbatim."""
    spark = tf_idx.sparkSession
    qterms = spark.createDataFrame(queries, ["query_id", "qtext"]).select(
        "query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("token")
    )
    stats = docstats.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )
    qtok = qterms.select("token").distinct()
    tf = tf_idx.join(F.broadcast(qtok), "token").select(
        "doc_id",
        "token",
        F.col("tf").cast("double").alias("tf"),
        F.col("dl").cast("double").alias("dl"),
    )
    return _bm25_score_rank(tf, stats, qterms, k)


def _bm25_score_rank(
    tf: DataFrame, stats: DataFrame, qterms: DataFrame, k: int
) -> DataFrame:
    """Shared tail of the BM25 pipeline: rational idf, per-term scores,
    sorted-term fold, salted two-level top-k. `tf` columns
    (doc_id, token, tf double, dl double); `stats` (n_docs, avgdl)."""
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("dfreq"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
            / (F.col("dfreq") + F.lit(0.5))
            + F.lit(1.0),
        )
        .withColumn(
            "tscore",
            F.col("idf")
            * (F.col("tf") * F.lit(BM25_K1 + 1.0))
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, tscore))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.tscore)"
            ).alias("score")
        )
    )
    return two_level_topk(
        scored, score_col="score", k=k, query_col="query_id", id_col="doc_id"
    ).select("query_id", "doc_id", "score", "rank")


def sql_bm25_topk(
    queries: list[tuple[str, str]], *, k: int = 10, source: str = "documents"
) -> str:
    qvals = ", ".join(f"('{qid}', '{qt}')" for qid, qt in queries)
    toks = sql_tokens("text")
    return f"""
        WITH q(query_id, qtext) AS (VALUES {qvals}),
        qterms AS (
            SELECT DISTINCT query_id, unnest(list_distinct({sql_tokens('qtext')})) AS token
            FROM q
        ),
        base AS (
            SELECT doc_id, {toks} AS t,
                   CAST(len({toks}) AS DOUBLE) AS dl
            FROM {source}
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS avgdl
            FROM base
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
            FROM (SELECT doc_id, dl, unnest(t) AS token FROM base)
            WHERE token IN (SELECT token FROM qterms)
            GROUP BY doc_id, token
        ),
        dfreq AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM tf GROUP BY token
        ),
        tscores AS (
            SELECT doc_id, token,
                   ((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))
                       AS tscore
            FROM tf JOIN dfreq USING (token) CROSS JOIN stats
        ),
        scored AS (
            SELECT query_id, doc_id,
                   list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(list_sort(list(struct_pack(tok := token, ts := tscore))),
                                          s -> s.ts)),
                       (a, x) -> a + x) AS score
            FROM tscores JOIN qterms USING (token)
            GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, score, rank FROM (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """
