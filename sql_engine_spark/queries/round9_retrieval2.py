"""Round-9 retrieval continuation: RM3-style pseudo-relevance feedback
over the SHARED materialized index (operators/retrieval.
bm25_index_shared) — the classic two-pass query-expansion loop
(Rocchio 1971; Lavrenko & Croft's relevance models, the RM3 recipe of
Abdul-Jaleel et al. TREC 2004, uniform-weight 'lite' variant):

1. first-pass BM25, take the top-3 feedback docs per query;
2. expansion candidates = tokens of the feedback docs weighted by
   summed tf, minus the original query terms; keep the top-5 per
   query (wsum DESC, token ASC — deterministic);
3. second-pass BM25 over the UNION term set, top-10.

Both passes scan the shared index (no corpus text rescan); candidate
mining is one broadcast-filtered postings aggregate. Term weights stay
uniform in the second pass (the 'lite' deviation from RM3's
interpolated language model — an honest simplification documented
here: the fold stays libm-free and bit-deterministic).

The reference engine has no retrieval surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    _bm25_score_rank,
    bm25_index_shared,
    bm25_topk_from_index,
    sql_bm25_index,
)
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.similarity import two_level_topk
from sql_engine_spark.queries.retrieval import _BM25_QUERIES
from sql_engine_spark.queries.round9_retrieval import (
    _qterms_df,
    _sql_bm25_ranked,
    _sql_sorted_fold,
    _SQL_QTERMS,
)
from sql_engine_spark.registry import register

_RM3_FB_DOCS = 3
_RM3_EXP_TERMS = 5
_RM3_K = 10


@register(
    "retrieval_rm3_expansion",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_RM3_FB_DOCS)},
        fb AS (SELECT query_id, doc_id FROM branked),
        cand AS (
            SELECT f.query_id, t.token, CAST(SUM(t.tf) AS BIGINT) AS wsum
            FROM idx_tf t JOIN fb f USING (doc_id)
            LEFT JOIN qterms q ON q.query_id = f.query_id
                              AND q.token = t.token
            WHERE q.token IS NULL
            GROUP BY f.query_id, t.token
        ),
        expn AS (
            SELECT query_id, token FROM (
                SELECT query_id, token,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY wsum DESC, token) AS r
                FROM cand
            ) WHERE r <= {_RM3_EXP_TERMS}
        ),
        q2 AS (
            SELECT query_id, token FROM qterms
            UNION
            SELECT query_id, token FROM expn
        ),
        etf AS (
            SELECT doc_id, token, CAST(tf AS DOUBLE) AS tf,
                   CAST(dl AS DOUBLE) AS dl
            FROM idx_tf
            WHERE token IN (SELECT token FROM q2)
        ),
        edf AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq
            FROM etf GROUP BY token
        ),
        ets AS (
            SELECT doc_id, token,
                   ((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                        + {BM25_B} * dl / avgdl)) AS tscore
            FROM etf JOIN edf USING (token) CROSS JOIN bstats
        ),
        esc AS (
            SELECT query_id, doc_id,
                   {_sql_sorted_fold('token', 'tscore')} AS score
            FROM ets JOIN q2 USING (token)
            GROUP BY query_id, doc_id
        ),
        eranked AS (
            SELECT query_id, doc_id, score, rank FROM (
                SELECT query_id, doc_id, score,
                       CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS BIGINT)
                           AS rank
                FROM esc
            ) WHERE rank <= {_RM3_K}
        ),
        orig10 AS (
            SELECT query_id, doc_id FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id ASC) AS r
                FROM bsc
            ) WHERE r <= {_RM3_K}
        )
        SELECT e.query_id, e.doc_id, e.rank, e.score,
               o.doc_id IS NOT NULL AS in_original_top10
        FROM eranked e
        LEFT JOIN orig10 o ON o.query_id = e.query_id
                          AND o.doc_id = e.doc_id
    """,
    doc=f"RM3-lite pseudo-relevance feedback: BM25 first pass -> top-"
    f"{_RM3_FB_DOCS} feedback docs -> top-{_RM3_EXP_TERMS} expansion "
    "terms by summed in-feedback tf (original terms excluded, "
    "(wsum DESC, token) deterministic) -> second-pass BM25 over the "
    f"union term set -> top-{_RM3_K}, flagged by membership in the "
    "unexpanded top-10 so the result exposes exactly what the "
    "expansion changed. Both passes and the candidate mining scan the "
    "shared materialized index; dfreq/idf recompute over the expanded "
    "token filter with the identical rational-idf arithmetic, and "
    "per-(query, doc) folds stay in sorted-token order. The classic "
    "recall lever for contamination audits and probe matching when "
    "exact query terms undercover the target.",
)
def retrieval_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    # One first-pass scoring serves both consumers (feedback docs + the
    # in_original_top10 flag): r13 — the process-shared materialized
    # first-pass ranking (queries/retrieval.bm25_ranked_shared); each
    # consumer is now a scan of a k-rows-per-query parquet file, so the
    # r12 persist is gone along with the in-plan first pass.
    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    orig10_ranked = bm25_ranked_shared(spark, sf_dir, k=_RM3_K)
    fb = orig10_ranked.where(F.col("rank") <= _RM3_FB_DOCS).select(
        "query_id", "doc_id"
    )
    cand = (
        tf_idx.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(qterms), ["query_id", "token"], "left_anti")
        .groupBy("query_id", "token")
        .agg(F.sum("tf").cast("long").alias("wsum"))
    )
    expn = two_level_topk(
        cand,
        score_col="wsum",
        k=_RM3_EXP_TERMS,
        query_col="query_id",
        id_col="token",
    ).select("query_id", "token")
    # Persisted (r12): q2 is read twice (the expanded-token scan filter
    # and the per-(query, doc) fold join), and each evaluation re-runs
    # the candidate mining (a full index scan + aggregate) feeding the
    # expansion top-k; the relation is <= (orig + 5) tokens per query.
    q2 = _persist(qterms.unionAll(expn).distinct())
    stats = docstats.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )
    qtok2 = q2.select("token").distinct()
    tf2 = tf_idx.join(F.broadcast(qtok2), "token").select(
        "doc_id",
        "token",
        F.col("tf").cast("double").alias("tf"),
        F.col("dl").cast("double").alias("dl"),
    )
    eranked = _bm25_score_rank(tf2, stats, q2, _RM3_K)
    orig10 = orig10_ranked.select(
        "query_id", "doc_id", F.lit(1).alias("__orig")
    )
    return eranked.join(
        orig10, ["query_id", "doc_id"], "left"
    ).select(
        "query_id",
        "doc_id",
        "rank",
        "score",
        F.col("__orig").isNotNull().alias("in_original_top10"),
    )
