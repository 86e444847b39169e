"""Round-9 retrieval family over the SHARED materialized index
(operators/retrieval.bm25_index_shared — built once per process, the
SURVEY 7.6 template applied BEFORE the family grew, per the r8 verdict):
tf-idf cosine ranking, Dirichlet-smoothed query likelihood, a ranked-
retrieval evaluation report against deterministic pseudo-qrels, RRF
fusion of the two lexical rankers, and the postings-width index audit.

A training-data pipeline needs corpus retrieval for contamination
audits, probe matching, and retrieval baselines; these are the classic
lexical rankers (Salton's vector space model; Zhai & Lafferty's
Dirichlet-prior query likelihood; Cormack/Clarke/Buettcher's reciprocal
rank fusion) spelled libm-free for exact cross-engine comparison:

- idf stays the RATIONAL Robertson odds ratio (no ln — house rule;
  same caveat as text_bm25_topk: per-term monotone, multi-term
  rankings can diverge from the log-idf canon).
- Query likelihood multiplies raw smoothed probabilities instead of
  summing logs: score = prod_t (tf + mu*p_c)/(dl + mu), folded in
  sorted-term order — bit-deterministic, and safe in double for
  bounded query lengths (3-term queries land ~1e-12; underflow needs
  hundreds of terms).
- Every corpus-sized double reduction crosses engines via ssum; the
  per-(query, doc) folds sort by token first.

The reference engine has no retrieval surface at all (single-SELECT
Volcano executor, /root/reference/src/planner/mod.rs:202-207); cited
per SURVEY.md §2 as engine-beyond-reference coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.operators.retrieval import (
    bm25_index_shared,
    bm25_topk_from_index,
    sql_bm25_index,
    sql_bm25_topk,
)
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.similarity import two_level_topk
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.queries.retrieval import _BM25_K, _BM25_QUERIES
from sql_engine_spark.registry import register

_QLM_MU = "2000.0"
_RRF_K0 = "60.0"
_EVAL_K = 10

_QVALS = ", ".join(f"('{qid}', '{qt}')" for qid, qt in _BM25_QUERIES)

# Shared oracle CTE: the literal query set exploded to distinct terms.
_SQL_QTERMS = f"""q(query_id, qtext) AS (VALUES {_QVALS}),
        qterms AS (
            SELECT DISTINCT query_id,
                   unnest(list_distinct({sql_tokens('qtext')})) AS token
            FROM q
        )"""


def _qterms_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_BM25_QUERIES, ["query_id", "qtext"]).select(
        "query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("token")
    )


def _sorted_fold(pairs_col_token: str, val_col: str, *, product: bool = False) -> F.Column:
    """Per-group fold of `val_col` in sorted-`token` order — the house
    bit-deterministic reduction for per-(query, doc) term folds."""
    init = "CAST(1.0 AS DOUBLE)" if product else "CAST(0.0 AS DOUBLE)"
    op = "*" if product else "+"
    return F.expr(
        f"aggregate(array_sort(collect_list(struct({pairs_col_token}, "
        f"{val_col}))), {init}, (a, s) -> a {op} s.{val_col})"
    )


def _sql_sorted_fold(token: str, val: str, *, product: bool = False) -> str:
    init = "CAST(1.0 AS DOUBLE)" if product else "CAST(0.0 AS DOUBLE)"
    op = "*" if product else "+"
    return (
        f"list_reduce(list_prepend({init}, "
        f"list_transform(list_sort(list(struct_pack(tok := {token}, "
        f"v := {val}))), s -> s.v)), (a, x) -> a {op} x)"
    )


# ---------------------------------------------------------------------------
# tf-idf cosine top-k
# ---------------------------------------------------------------------------


@register(
    "retrieval_tfidf_cosine_topk",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM idx_docs),
        dfreq AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq
            FROM idx_tf GROUP BY token
        ),
        idf AS (
            SELECT token,
                   (n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0 AS idf
            FROM dfreq CROSS JOIN stats
        ),
        wd AS (
            SELECT t.doc_id, t.token,
                   CAST(t.tf AS DOUBLE) * i.idf AS w
            FROM idx_tf t JOIN idf i USING (token)
        ),
        dnorm AS (
            SELECT doc_id, sqrt({sql_ssum('w * w')}) AS dn
            FROM wd GROUP BY doc_id
        ),
        wq AS (
            SELECT q.query_id, q.token, i.idf AS w
            FROM qterms q JOIN idf i USING (token)
        ),
        qnorm AS (
            SELECT query_id,
                   sqrt({_sql_sorted_fold('token', 'w * w')}) AS qn
            FROM wq GROUP BY query_id
        ),
        num AS (
            SELECT wq.query_id, wd.doc_id,
                   {_sql_sorted_fold('wq.token', 'wq.w * wd.w')} AS num
            FROM wq JOIN wd ON wq.token = wd.token
            GROUP BY wq.query_id, wd.doc_id
        ),
        scored AS (
            SELECT n.query_id, n.doc_id,
                   n.num / (q.qn * d.dn) AS score
            FROM num n
            JOIN qnorm q USING (query_id)
            JOIN dnorm d USING (doc_id)
        )
        SELECT query_id, doc_id, score, rank FROM (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {_BM25_K}
    """,
    doc="tf-idf cosine top-10 per literal query (Salton vector-space "
    "model) over the SHARED retrieval index: doc weights tf*idf with "
    "the rational odds-ratio idf (libm-free house rule), document "
    "norms over ALL the doc's terms via ssum (order-independent "
    "corpus aggregate), query norms and dot products folded in "
    "sorted-term order, score = dot / (|q| |d|). OOV query terms drop "
    "at the idf join (standard; every term of the literal set occurs "
    "in the corpus). Ranking through the salted two-level top-k. At "
    "100 TB: one postings scan for norms, one broadcast-filtered "
    "postings scan for numerators — no corpus-sized sort.",
)
def retrieval_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_ranked_shared(spark, sf_dir)


def tfidf_ranked_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The house tf-idf cosine ranking, built once per (process,
    dataset) and materialized (operators/retrieval.ranked_shared) —
    consumed by the registered ranker and retrieval_rrf_fusion."""
    from sql_engine_spark.operators.retrieval import ranked_shared

    return ranked_shared(
        spark, sf_dir, "tfidf", lambda: _tfidf_cosine_build(spark, sf_dir)
    )


def _tfidf_cosine_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    stats = docstats.agg(F.count("*").cast("double").alias("n_docs"))
    dfreq = tf_idx.groupBy("token").agg(
        F.count("*").cast("double").alias("dfreq")
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "token",
        (
            (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
            / (F.col("dfreq") + F.lit(0.5))
            + F.lit(1.0)
        ).alias("idf"),
    )
    wd = tf_idx.join(idf, "token").select(
        "doc_id", "token", (F.col("tf").cast("double") * F.col("idf")).alias("w")
    )
    dnorm = wd.groupBy("doc_id").agg(
        F.sqrt(ssum(F.col("w") * F.col("w"))).alias("dn")
    )
    wq = qterms.join(idf, "token").select(
        "query_id", "token", F.col("idf").alias("w")
    )
    qnorm = wq.groupBy("query_id").agg(
        F.sqrt(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, w))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.w * s.w)"
            )
        ).alias("qn")
    )
    num = (
        F.broadcast(wq)
        .withColumnRenamed("w", "w_q")
        .join(wd, "token")
        .select(
            "query_id",
            "doc_id",
            "token",
            (F.col("w_q") * F.col("w")).alias("wqd"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, wqd))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.wqd)"
            ).alias("num")
        )
    )
    scored = (
        num.join(F.broadcast(qnorm), "query_id")
        .join(dnorm, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("num") / (F.col("qn") * F.col("dn"))).alias("score"),
        )
    )
    return two_level_topk(
        scored, score_col="score", k=_BM25_K, query_col="query_id", id_col="doc_id"
    ).select("query_id", "doc_id", "score", "rank")

# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood
# ---------------------------------------------------------------------------


@register(
    "retrieval_qlm_dirichlet_topk",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        coll AS (
            SELECT CAST(SUM(dl) AS DOUBLE) AS c_total FROM idx_docs
        ),
        pc AS (
            SELECT token,
                   CAST(SUM(tf) AS DOUBLE) / c_total AS p_c
            FROM idx_tf CROSS JOIN coll
            GROUP BY token, c_total
        ),
        qpc AS (
            SELECT q.query_id, q.token, p.p_c
            FROM qterms q JOIN pc p USING (token)
        ),
        cand AS (
            SELECT DISTINCT q.query_id, t.doc_id, t.dl
            FROM idx_tf t JOIN qterms q USING (token)
        ),
        bg AS (
            SELECT c.query_id, c.doc_id,
                   {_sql_sorted_fold(
                       'p.token',
                       f'({_QLM_MU} * p.p_c) / (CAST(c.dl AS DOUBLE) + {_QLM_MU})',
                       product=True,
                   )} AS bg_prod
            FROM cand c JOIN qpc p ON p.query_id = c.query_id
            GROUP BY c.query_id, c.doc_id
        ),
        pres AS (
            SELECT p.query_id, t.doc_id,
                   {_sql_sorted_fold(
                       'p.token',
                       f'(CAST(t.tf AS DOUBLE) + {_QLM_MU} * p.p_c) '
                       f'/ ({_QLM_MU} * p.p_c)',
                       product=True,
                   )} AS pres_prod
            FROM idx_tf t JOIN qpc p ON p.token = t.token
            GROUP BY p.query_id, t.doc_id
        ),
        scored AS (
            SELECT b.query_id, b.doc_id,
                   b.bg_prod * p.pres_prod AS score
            FROM bg b JOIN pres p
              ON p.query_id = b.query_id AND p.doc_id = b.doc_id
        )
        SELECT query_id, doc_id, score, rank FROM (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {_BM25_K}
    """,
    doc="Dirichlet-prior query-likelihood top-10 (Zhai & Lafferty 2001, "
    f"mu={_QLM_MU}) over the shared retrieval index, spelled libm-free: "
    "instead of summing log probabilities, the smoothed per-term "
    "probabilities (tf + mu p_c)/(dl + mu) MULTIPLY directly — split "
    "as (background product over all the query's terms) x (present-"
    "term ratio product), each folded in sorted-term order, so absent "
    "terms are smoothed exactly as the model requires without any "
    "pow(dl+mu, |q|). Safe in double for bounded query lengths "
    "(3-term scores land ~1e-12; underflow needs hundreds of terms — "
    "at that point switch to log-space and rank-only comparison). "
    "Candidates are docs sharing >= 1 query term (index-driven "
    "evaluation — docs with zero matches rank below all candidates by "
    "construction). OOV terms drop at the collection-stats join. One "
    "broadcast-filtered postings scan; ranking via two_level_topk.",
)
def retrieval_qlm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qlm_ranked_shared(spark, sf_dir)


def qlm_ranked_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The house Dirichlet-QLM ranking, built once per (process,
    dataset) and materialized (operators/retrieval.ranked_shared) —
    consumed by the registered ranker and retrieval_rank_agreement."""
    from sql_engine_spark.operators.retrieval import ranked_shared

    return ranked_shared(
        spark, sf_dir, "qlm", lambda: _qlm_dirichlet_build(spark, sf_dir)
    )


def _qlm_dirichlet_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    mu = float(_QLM_MU)
    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    coll = docstats.agg(F.sum("dl").cast("double").alias("c_total"))
    # p(t|C) is only consumed for QUERY tokens (the qpc join below), and
    # a token's collection frequency is a sum over ITS OWN postings, so
    # filtering the scan to query tokens BEFORE the aggregate yields the
    # identical p_c values while aggregating ~|query terms| postings
    # lists instead of the whole vocabulary (r12, guide §2.3 — the
    # oracle keeps the full-vocab CTE; the join certifies equivalence).
    # The filtered postings relation feeds THREE consumers (p_c, the
    # candidate set, the present-term fold) — persisted so the index
    # scan + broadcast join run once per build, not once per consumer
    # (r13, r12 verdict #8: one postings scan feeding every leg).
    qtok = qterms.select("token").distinct()
    fp = _persist(tf_idx.join(F.broadcast(qtok), "token"))
    pc = (
        fp.groupBy("token")
        .agg(F.sum("tf").cast("double").alias("cf"))
        .crossJoin(F.broadcast(coll))
        .select("token", (F.col("cf") / F.col("c_total")).alias("p_c"))
    )
    qpc = F.broadcast(qterms.join(pc, "token").select("query_id", "token", "p_c"))
    cand = (
        fp.join(F.broadcast(qterms), "token")
        .select("query_id", "doc_id", "dl")
        .distinct()
    )
    bg_factor = (F.lit(mu) * F.col("p_c")) / (
        F.col("dl").cast("double") + F.lit(mu)
    )
    bg = (
        cand.join(qpc, "query_id")
        .select("query_id", "doc_id", "token", bg_factor.alias("f"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, f))), "
                "CAST(1.0 AS DOUBLE), (a, s) -> a * s.f)"
            ).alias("bg_prod")
        )
    )
    ratio = (F.col("tf").cast("double") + F.lit(mu) * F.col("p_c")) / (
        F.lit(mu) * F.col("p_c")
    )
    pres = (
        fp.join(qpc, "token")
        .select("query_id", "doc_id", "token", ratio.alias("r"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, r))), "
                "CAST(1.0 AS DOUBLE), (a, s) -> a * s.r)"
            ).alias("pres_prod")
        )
    )
    scored = bg.join(pres, ["query_id", "doc_id"]).select(
        "query_id",
        "doc_id",
        (F.col("bg_prod") * F.col("pres_prod")).alias("score"),
    )
    return two_level_topk(
        scored, score_col="score", k=_BM25_K, query_col="query_id", id_col="doc_id"
    ).select("query_id", "doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# Ranked-retrieval evaluation report (pseudo-qrels)
# ---------------------------------------------------------------------------


def _sql_bm25_ranked(k: int) -> str:
    """CTE chain `branked(query_id, doc_id, score, rank)`: the BM25
    pipeline of bm25_topk_from_index rendered over the idx CTEs —
    identical arithmetic to sql_bm25_topk, sourced from the index."""
    from sql_engine_spark.operators.retrieval import BM25_B, BM25_K1

    return f"""bstats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
            FROM idx_docs
        ),
        btf AS (
            SELECT doc_id, token, CAST(tf AS DOUBLE) AS tf,
                   CAST(dl AS DOUBLE) AS dl
            FROM idx_tf
            WHERE token IN (SELECT token FROM qterms)
        ),
        bdf AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq
            FROM btf GROUP BY token
        ),
        bts AS (
            SELECT doc_id, token,
                   ((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))
                       AS tscore
            FROM btf JOIN bdf USING (token) CROSS JOIN bstats
        ),
        bsc AS (
            SELECT query_id, doc_id,
                   {_sql_sorted_fold('token', 'tscore')} AS score
            FROM bts JOIN qterms USING (token)
            GROUP BY query_id, doc_id
        ),
        branked AS (
            SELECT query_id, doc_id, score, rank FROM (
                SELECT query_id, doc_id, score,
                       CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
                FROM bsc
            ) WHERE rank <= {k}
        )"""


@register(
    "retrieval_eval_report",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_EVAL_K)},
        nq AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS nq
            FROM qterms GROUP BY query_id
        ),
        matches AS (
            SELECT q.query_id, t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_match
            FROM idx_tf t JOIN qterms q USING (token)
            GROUP BY q.query_id, t.doc_id
        ),
        rel AS (
            SELECT m.query_id, m.doc_id
            FROM matches m JOIN nq USING (query_id)
            WHERE m.n_match = nq.nq
        ),
        nrel AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
            FROM rel GROUP BY query_id
        ),
        flags AS (
            SELECT r.query_id, r.doc_id, r.rank,
                   CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
            FROM branked r
            LEFT JOIN rel ON rel.query_id = r.query_id
                         AND rel.doc_id = r.doc_id
        ),
        cum AS (
            SELECT query_id, rank, is_rel,
                   CAST(SUM(is_rel) OVER (PARTITION BY query_id
                        ORDER BY rank) AS BIGINT) AS cum_rel
            FROM flags
        ),
        perq AS (
            SELECT query_id,
                   CAST(SUM(is_rel) AS BIGINT) AS hits_at_k,
                   MAX(CASE WHEN is_rel = 1
                            THEN CAST(1.0 AS DOUBLE) / CAST(rank AS DOUBLE)
                            ELSE CAST(0.0 AS DOUBLE) END) AS reciprocal_rank,
                   {sql_ssum(
                       'CASE WHEN is_rel = 1 THEN CAST(cum_rel AS DOUBLE)'
                       ' / CAST(rank AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END',
                       scale='1000000000.0',
                   )} AS ap_sum
            FROM cum GROUP BY query_id
        )
        SELECT p.query_id,
               COALESCE(n.n_rel, 0) AS n_rel,
               p.hits_at_k,
               CAST(p.hits_at_k AS DOUBLE) / CAST({_EVAL_K} AS DOUBLE)
                   AS p_at_k,
               CASE WHEN COALESCE(n.n_rel, 0) > 0
                    THEN CAST(p.hits_at_k AS DOUBLE) / CAST(n.n_rel AS DOUBLE)
                    ELSE CAST(NULL AS DOUBLE) END AS recall_at_k,
               p.reciprocal_rank,
               CASE WHEN COALESCE(n.n_rel, 0) > 0
                    THEN p.ap_sum / CAST(n.n_rel AS DOUBLE)
                    ELSE CAST(NULL AS DOUBLE) END AS ap_at_k
        FROM perq p LEFT JOIN nrel n USING (query_id)
    """,
    doc=f"Ranked-retrieval evaluation report at k={_EVAL_K} against "
    "DETERMINISTIC pseudo-qrels (a doc is relevant to a query iff it "
    "contains ALL the query's terms — boolean-AND containment, "
    "computable exactly in both engines, the standard stand-in when "
    "no human judgments exist): per query, the relevant-set size, "
    "hits@k, precision@k, recall@k, reciprocal rank (0 when no "
    "relevant doc ranks), and average precision, all over the BM25 "
    "ranking from the shared index. MRR/MAP are the classic "
    "rank-aware metrics an IR or contamination-audit baseline "
    "reports; everything is rational arithmetic (integer cumulative "
    "relevance over a rank window; the <= k AP terms fold through "
    "ssum at the 1e-9 grain). Qrels cost one broadcast-filtered "
    "postings aggregate — no corpus text rescan.",
)
def retrieval_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    ranked = bm25_ranked_shared(spark, sf_dir, k=_EVAL_K)
    nq = qterms.groupBy("query_id").agg(F.count("*").cast("long").alias("nq"))
    matches = (
        tf_idx.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("n_match"))
    )
    # Persisted (r12, guide §1.2): rel is consumed twice (per-query
    # relevant-count + the ranked flag join); unpersisted, each
    # consumer re-ran the index scan + aggregate.
    rel = _persist(
        matches.join(F.broadcast(nq), "query_id")
        .where(F.col("n_match") == F.col("nq"))
        .select("query_id", "doc_id")
    )
    nrel = rel.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    flags = ranked.join(
        rel.withColumn("__r", F.lit(1)), ["query_id", "doc_id"], "left"
    ).select(
        "query_id",
        "rank",
        F.coalesce("__r", F.lit(0)).alias("is_rel"),
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    cum = flags.withColumn(
        "cum_rel", F.sum("is_rel").over(w).cast("long")
    )
    rankD = F.col("rank").cast("double")
    perq = cum.groupBy("query_id").agg(
        F.sum("is_rel").cast("long").alias("hits_at_k"),
        F.max(
            F.when(F.col("is_rel") == 1, F.lit(1.0) / rankD).otherwise(
                F.lit(0.0)
            )
        ).alias("reciprocal_rank"),
        ssum(
            F.when(
                F.col("is_rel") == 1,
                F.col("cum_rel").cast("double") / rankD,
            ).otherwise(F.lit(0.0)),
            scale=1e9,
        ).alias("ap_sum"),
    )
    n_rel = F.coalesce("n_rel", F.lit(0)).cast("long")
    return perq.join(nrel, "query_id", "left").select(
        "query_id",
        n_rel.alias("n_rel"),
        "hits_at_k",
        (F.col("hits_at_k").cast("double") / F.lit(float(_EVAL_K))).alias(
            "p_at_k"
        ),
        F.when(
            n_rel > 0, F.col("hits_at_k").cast("double") / n_rel.cast("double")
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("recall_at_k"),
        "reciprocal_rank",
        F.when(n_rel > 0, F.col("ap_sum") / n_rel.cast("double"))
        .otherwise(F.lit(None).cast("double"))
        .alias("ap_at_k"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of the two lexical rankers
# ---------------------------------------------------------------------------

_RRF_TOP = 5


def _sql_tfidf_ranked(k: int) -> str:
    """CTE chain `tranked(query_id, doc_id, score, rank)`: the tf-idf
    cosine pipeline with t-prefixed CTE names so it composes with
    _sql_bm25_ranked in one WITH block."""
    return f"""tstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM idx_docs),
        tdf AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq
            FROM idx_tf GROUP BY token
        ),
        tidf AS (
            SELECT token,
                   (n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0 AS idf
            FROM tdf CROSS JOIN tstats
        ),
        twd AS (
            SELECT t.doc_id, t.token, CAST(t.tf AS DOUBLE) * i.idf AS w
            FROM idx_tf t JOIN tidf i USING (token)
        ),
        tdnorm AS (
            SELECT doc_id, sqrt({sql_ssum('w * w')}) AS dn
            FROM twd GROUP BY doc_id
        ),
        twq AS (
            SELECT q.query_id, q.token, i.idf AS w
            FROM qterms q JOIN tidf i USING (token)
        ),
        tqnorm AS (
            SELECT query_id, sqrt({_sql_sorted_fold('token', 'w * w')}) AS qn
            FROM twq GROUP BY query_id
        ),
        tnum AS (
            SELECT twq.query_id, twd.doc_id,
                   {_sql_sorted_fold('twq.token', 'twq.w * twd.w')} AS num
            FROM twq JOIN twd ON twq.token = twd.token
            GROUP BY twq.query_id, twd.doc_id
        ),
        tscored AS (
            SELECT n.query_id, n.doc_id, n.num / (q.qn * d.dn) AS score
            FROM tnum n
            JOIN tqnorm q USING (query_id)
            JOIN tdnorm d USING (doc_id)
        ),
        tranked AS (
            SELECT query_id, doc_id, score, rank FROM (
                SELECT query_id, doc_id, score,
                       CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
                FROM tscored
            ) WHERE rank <= {k}
        )"""


@register(
    "retrieval_rrf_fusion",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_BM25_K)},
        {_sql_tfidf_ranked(_BM25_K)},
        fused AS (
            SELECT COALESCE(b.query_id, t.query_id) AS query_id,
                   COALESCE(b.doc_id, t.doc_id) AS doc_id,
                   COALESCE(CAST(1.0 AS DOUBLE)
                            / ({_RRF_K0} + CAST(b.rank AS DOUBLE)),
                            CAST(0.0 AS DOUBLE))
                 + COALESCE(CAST(1.0 AS DOUBLE)
                            / ({_RRF_K0} + CAST(t.rank AS DOUBLE)),
                            CAST(0.0 AS DOUBLE)) AS rrf_score
            FROM branked b
            FULL OUTER JOIN tranked t
              ON b.query_id = t.query_id AND b.doc_id = t.doc_id
        )
        SELECT query_id, doc_id, rrf_score, rank FROM (
            SELECT query_id, doc_id, rrf_score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM fused
        ) WHERE rank <= {_RRF_TOP}
    """,
    doc="Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009, "
    f"k0={_RRF_K0}) of the two lexical rankers — BM25 and tf-idf "
    f"cosine, both top-{_BM25_K} from the shared index: rrf = sum of "
    "1/(k0 + rank) over the lists ranking the doc (absent list "
    "contributes 0), re-ranked to the fused top-5 per query. Fusion "
    "is the standard robustness device when rankers disagree (and "
    "the text-side sibling of ann_hybrid_rrf, which fuses lexical "
    "with vector retrieval). Pure rational arithmetic on ranks — "
    "bit-exact by construction; the fused window runs over <= "
    f"2x{_BM25_K} rows per query.",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    k0 = float(_RRF_K0)
    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    b = bm25_ranked_shared(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("r_b")
    )
    t = tfidf_ranked_shared(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("r_t")
    )
    fused = b.join(t, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("r_b").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("r_t").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _RRF_TOP)
        .select("query_id", "doc_id", "rrf_score", "rank")
    )


# ---------------------------------------------------------------------------
# Index audit: postings-width distribution
# ---------------------------------------------------------------------------


@register(
    "retrieval_index_stats",
    oracle=f"""
        WITH {sql_bm25_index()},
        dfreq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(tf) AS BIGINT) AS cf
            FROM idx_tf GROUP BY token
        ),
        tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total_cf FROM dfreq)
        SELECT CAST(length(CAST(df AS VARCHAR)) AS BIGINT) AS df_digits,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(df) AS BIGINT) AS postings_rows,
               CAST(SUM(cf) AS BIGINT) AS bucket_cf,
               CAST(MAX(df) AS BIGINT) AS max_df,
               CAST(SUM(cf) AS DOUBLE) / CAST(tot.total_cf AS DOUBLE)
                   AS corpus_share
        FROM dfreq CROSS JOIN tot
        GROUP BY df_digits, tot.total_cf
    """,
    doc="Postings-width audit of the shared retrieval index: tokens "
    "bucketed by the DECIMAL DIGIT COUNT of their document frequency "
    "(an exact, log-free magnitude bucket — length(CAST(df AS "
    "STRING)) is identical in both engines), with per-bucket token "
    "count, postings rows, collection frequency, max df, and corpus "
    "share. The capacity-planning read for the inverted index: the "
    "top bucket is the stopword band the max_df cap "
    "(text_inverted_index) must absorb, and postings skew here is "
    "what decides token-bucketed layout at 100 TB. Exact integers "
    "plus one final division.",
)
def retrieval_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf_idx, _docstats = bm25_index_shared(spark, sf_dir)
    dfreq = tf_idx.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    tot = dfreq.agg(F.sum("cf").cast("long").alias("total_cf"))
    return (
        dfreq.crossJoin(F.broadcast(tot))
        .groupBy(
            F.length(F.col("df").cast("string")).cast("long").alias("df_digits"),
            "total_cf",
        )
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("df").cast("long").alias("postings_rows"),
            F.sum("cf").cast("long").alias("bucket_cf"),
            F.max("df").cast("long").alias("max_df"),
        )
        .select(
            "df_digits",
            "n_tokens",
            "postings_rows",
            "bucket_cf",
            "max_df",
            (
                F.col("bucket_cf").cast("double")
                / F.col("total_cf").cast("double")
            ).alias("corpus_share"),
        )
    )
