"""Round-10 retrieval batch over the SHARED materialized index
(operators/retrieval.bm25_index_shared): Jelinek-Mercer query
likelihood (the second classic LM smoothing, complementing the r9
Dirichlet), BM25F fielded scoring (Robertson, Zaragoza & Taylor CIKM
2004 — weighted per-field tf pooled BEFORE saturation), pivoted length
normalization (Singhal, Buckley & Mitra SIGIR 1996, spelled libm-free),
MAP + MRR evaluation (the two rank metrics the r9 eval report left to
nDCG), and a BM25-vs-QLM ranking-agreement report (Kendall tau over
the per-query top-10 union).

House discipline (r4+ conventions): no libm in any score — smoothing
products and rational idf only, folded in sorted-token order; every
ranking tie-breaks (score DESC, doc_id ASC); all corpus passes scan
the shared index, never re-tokenize.

The reference engine has no retrieval surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_index_shared,
    bm25_topk_from_index,
    sql_bm25_index,
)
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.textprep import sql_tokens
from sql_engine_spark.queries.retrieval import _BM25_QUERIES
from sql_engine_spark.queries.round9_retrieval import (
    _qterms_df,
    _sql_bm25_ranked,
    _sql_sorted_fold,
    _SQL_QTERMS,
)
from sql_engine_spark.registry import register

_K = 10
_JM_LAMBDA = 0.3  # weight on the collection model

# ---------------------------------------------------------------------------
# retrieval_jm_smoothing_topk — query likelihood, Jelinek-Mercer smoothing
# ---------------------------------------------------------------------------


@register(
    "retrieval_jm_smoothing_topk",
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
                       f'{_JM_LAMBDA} * p.p_c',
                       product=True,
                   )} AS bg_prod
            FROM cand c JOIN qpc p ON p.query_id = c.query_id
            GROUP BY c.query_id, c.doc_id
        ),
        pres AS (
            SELECT p.query_id, t.doc_id,
                   {_sql_sorted_fold(
                       'p.token',
                       f'((1.0 - {_JM_LAMBDA}) * CAST(t.tf AS DOUBLE) '
                       f'/ CAST(t.dl AS DOUBLE) + {_JM_LAMBDA} * p.p_c) '
                       f'/ ({_JM_LAMBDA} * p.p_c)',
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
        ) WHERE rank <= {_K}
    """,
    doc="Jelinek-Mercer-smoothed query likelihood top-10 (Zhai & "
    f"Lafferty 2001, lambda={_JM_LAMBDA}) over the shared retrieval "
    "index — the interpolation smoothing that complements the r9 "
    "Dirichlet prior: p(t|d) = (1-l) tf/dl + l p(t|C). Libm-free like "
    "its Dirichlet sibling: the per-doc probability PRODUCT splits as "
    "(background product of l*p_c over the query's terms) x (present-"
    "term ratio product), each folded in sorted-token order, so absent "
    "terms cost exactly the background factor and every double op is "
    "fixed-order rational arithmetic. Candidate set = docs sharing >= "
    "1 query term (the postings union — at 100 TB this is the "
    "standard impact-ordered candidate bound, never the full corpus).",
)
def retrieval_jm_smoothing_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    lam = float(_JM_LAMBDA)
    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    coll = docstats.agg(F.sum("dl").cast("double").alias("c_total"))
    # Same filter-before-aggregate as the Dirichlet sibling (r12, guide
    # §2.3): p(t|C) is only read for query tokens and a token's cf sums
    # over its own postings, so the query-token semi-join before the
    # groupBy gives identical p_c without the full-vocab aggregate.
    qtok = qterms.select("token").distinct()
    pc = (
        tf_idx.join(F.broadcast(qtok), "token")
        .groupBy("token")
        .agg(F.sum("tf").cast("double").alias("cf"))
        .crossJoin(F.broadcast(coll))
        .select("token", (F.col("cf") / F.col("c_total")).alias("p_c"))
    )
    qpc = F.broadcast(
        qterms.join(pc, "token").select("query_id", "token", "p_c")
    )
    cand = (
        tf_idx.join(F.broadcast(qterms), "token")
        .select("query_id", "doc_id", "dl")
        .distinct()
    )
    bg = (
        cand.join(qpc, "query_id")
        .select(
            "query_id",
            "doc_id",
            "token",
            (F.lit(lam) * F.col("p_c")).alias("f"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, f))), "
                "CAST(1.0 AS DOUBLE), (a, s) -> a * s.f)"
            ).alias("bg_prod")
        )
    )
    ratio = (
        (F.lit(1.0 - lam)) * F.col("tf").cast("double") / F.col("dl").cast("double")
        + F.lit(lam) * F.col("p_c")
    ) / (F.lit(lam) * F.col("p_c"))
    pres = (
        tf_idx.join(qpc, "token")
        .select("query_id", "doc_id", "token", ratio.alias("f"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, f))), "
                "CAST(1.0 AS DOUBLE), (a, s) -> a * s.f)"
            ).alias("pres_prod")
        )
    )
    from pyspark.sql import Window

    scored = bg.join(pres, ["query_id", "doc_id"]).select(
        "query_id",
        "doc_id",
        (F.col("bg_prod") * F.col("pres_prod")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _K)
        .select("query_id", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# retrieval_bm25f_fields — fielded BM25 (title = first 5 tokens, body = rest)
# ---------------------------------------------------------------------------

_BM25F_TITLE_LEN = 5
_BM25F_W_TITLE = 3.0
_BM25F_W_BODY = 1.0


@register(
    "retrieval_bm25f_fields",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        ftf AS (
            SELECT doc_id, token,
                   CAST(SUM(CASE WHEN pos <= {_BM25F_TITLE_LEN}
                            THEN 1 ELSE 0 END) AS DOUBLE) AS tf_title,
                   CAST(SUM(CASE WHEN pos > {_BM25F_TITLE_LEN}
                            THEN 1 ELSE 0 END) AS DOUBLE) AS tf_body,
                   ANY_VALUE(dl) AS dl
            FROM (SELECT doc_id, dl,
                         unnest(t) AS token,
                         generate_subscripts(t, 1) AS pos
                  FROM idx_base)
            GROUP BY doc_id, token
        ),
        wdoc AS (
            SELECT doc_id,
                   {_BM25F_W_TITLE} * LEAST(CAST(dl AS DOUBLE),
                                            {_BM25F_TITLE_LEN})
                 + {_BM25F_W_BODY} * GREATEST(CAST(dl AS DOUBLE)
                                              - {_BM25F_TITLE_LEN}, 0.0)
                       AS wdl
            FROM idx_docs
        ),
        wstats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   SUM(wdl) / CAST(COUNT(*) AS DOUBLE) AS avg_wdl
            FROM wdoc
        ),
        qtf AS (
            SELECT f.doc_id, f.token,
                   {_BM25F_W_TITLE} * f.tf_title
                 + {_BM25F_W_BODY} * f.tf_body AS wtf
            FROM ftf f
            WHERE f.token IN (SELECT token FROM qterms)
        ),
        qdf AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq
            FROM qtf GROUP BY token
        ),
        ts AS (
            SELECT t.doc_id, t.token,
                   ((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                   * (t.wtf * ({BM25_K1} + 1.0))
                   / (t.wtf + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * w.wdl / avg_wdl)) AS tscore
            FROM qtf t
            JOIN wdoc w USING (doc_id)
            JOIN qdf USING (token)
            CROSS JOIN wstats
        ),
        sc AS (
            SELECT q.query_id, t.doc_id,
                   {_sql_sorted_fold('t.token', 't.tscore')} AS score
            FROM ts t JOIN qterms q USING (token)
            GROUP BY q.query_id, t.doc_id
        )
        SELECT query_id, doc_id, score, rank FROM (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM sc
        ) WHERE rank <= {_K}
    """,
    doc="BM25F fielded top-10 (Robertson, Zaragoza & Taylor CIKM 2004): "
    f"each doc splits into a title field (first {_BM25F_TITLE_LEN} "
    "tokens) and body; per-term field tfs pool with field weights "
    f"({_BM25F_W_TITLE}x title, {_BM25F_W_BODY}x body) BEFORE the "
    "BM25 saturation — the defining BM25F property (weighting after "
    "saturation would double-count strong fields). Document length "
    "normalizes against the field-WEIGHTED length and its corpus "
    "average. Positions come from one posexplode of the shared "
    "index's token arrays (no corpus re-tokenize); idf stays the "
    "rational Robertson form and per-(query, doc) folds run in "
    "sorted-term order (house libm-free discipline). The fielded "
    "scorer every doc-with-metadata corpus (title/heading/body web "
    "text, captioned images) wants over flat BM25.",
)
def retrieval_bm25f_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.operators.retrieval import token_arrays_shared

    base = token_arrays_shared(spark, sf_dir)
    qterms = _qterms_df(spark)

    ftf = (
        base.select(
            "doc_id", "dl", F.posexplode("t").alias("pos0", "token")
        )
        .groupBy("doc_id", "token")
        .agg(
            F.sum(
                F.when(F.col("pos0") + 1 <= _BM25F_TITLE_LEN, 1).otherwise(0)
            )
            .cast("double")
            .alias("tf_title"),
            F.sum(
                F.when(F.col("pos0") + 1 > _BM25F_TITLE_LEN, 1).otherwise(0)
            )
            .cast("double")
            .alias("tf_body"),
            F.first("dl").alias("dl"),
        )
    )
    wdoc = base.select(
        "doc_id",
        (
            F.lit(_BM25F_W_TITLE)
            * F.least(F.col("dl").cast("double"), F.lit(float(_BM25F_TITLE_LEN)))
            + F.lit(_BM25F_W_BODY)
            * F.greatest(
                F.col("dl").cast("double") - F.lit(float(_BM25F_TITLE_LEN)),
                F.lit(0.0),
            )
        ).alias("wdl"),
    )
    wstats = wdoc.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("wdl") / F.count("*").cast("double")).alias("avg_wdl"),
    )
    qtok = qterms.select("token").distinct()
    qtf = ftf.join(F.broadcast(qtok), "token").select(
        "doc_id",
        "token",
        (
            F.lit(_BM25F_W_TITLE) * F.col("tf_title")
            + F.lit(_BM25F_W_BODY) * F.col("tf_body")
        ).alias("wtf"),
    )
    qdf = qtf.groupBy("token").agg(
        F.count("*").cast("double").alias("dfreq")
    )
    tscore = (
        ((F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5) + 1.0)
        * (F.col("wtf") * (BM25_K1 + 1.0))
        / (
            F.col("wtf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("wdl") / F.col("avg_wdl"))
        )
    )
    ts = (
        qtf.join(wdoc, "doc_id")
        .join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(wstats))
        .select("doc_id", "token", tscore.alias("tscore"))
    )
    sc = (
        ts.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, tscore))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.tscore)"
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _K)
        .select("query_id", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# retrieval_pivoted_length_norm — Singhal pivoted normalization (libm-free)
# ---------------------------------------------------------------------------

_PIV_S = 0.2


@register(
    "retrieval_pivoted_length_norm",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        pstats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
            FROM idx_docs
        ),
        ptf AS (
            SELECT doc_id, token, CAST(tf AS DOUBLE) AS tf,
                   CAST(dl AS DOUBLE) AS dl
            FROM idx_tf
            WHERE token IN (SELECT token FROM qterms)
        ),
        pdf AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfreq
            FROM ptf GROUP BY token
        ),
        ts AS (
            SELECT t.doc_id, t.token,
                   (t.tf / (t.tf + 1.0))
                   / (1.0 - {_PIV_S} + {_PIV_S} * t.dl / avgdl)
                   * ((n_docs + 1.0) / dfreq) AS tscore
            FROM ptf t JOIN pdf USING (token) CROSS JOIN pstats
        ),
        sc AS (
            SELECT q.query_id, t.doc_id,
                   {_sql_sorted_fold('t.token', 't.tscore')} AS score
            FROM ts t JOIN qterms q USING (token)
            GROUP BY q.query_id, t.doc_id
        )
        SELECT query_id, doc_id, score, rank FROM (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM sc
        ) WHERE rank <= {_K}
    """,
    doc="Pivoted-length-normalized VSM top-10 (Singhal, Buckley & Mitra "
    f"SIGIR 1996, s={_PIV_S}): tf saturates as tf/(tf+1) and the "
    "score divides by the pivoted norm (1 - s + s*dl/avgdl) — the "
    "correction for the 'long documents win on raw tf' bias that "
    "predates (and motivated) BM25's b term. DELIBERATE deviation "
    "from Singhal's 1+ln(1+ln(tf)) dampening: the rational tf/(tf+1) "
    "saturator and (N+1)/df idf keep every double op libm-free and "
    "bit-identical cross-engine (the house rule since r4 — ln() "
    "differs between JVM and glibc in the last ulp); same saturation "
    "shape, no logs. Scans the shared index; folds in sorted-term "
    "order; (score DESC, doc_id) ties.",
)
def retrieval_pivoted_length_norm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    pstats = docstats.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )
    qtok = qterms.select("token").distinct()
    ptf = tf_idx.join(F.broadcast(qtok), "token").select(
        "doc_id",
        "token",
        F.col("tf").cast("double").alias("tf"),
        F.col("dl").cast("double").alias("dl"),
    )
    pdf = ptf.groupBy("token").agg(
        F.count("*").cast("double").alias("dfreq")
    )
    tscore = (
        (F.col("tf") / (F.col("tf") + 1.0))
        / (1.0 - _PIV_S + _PIV_S * F.col("dl") / F.col("avgdl"))
        * ((F.col("n_docs") + 1.0) / F.col("dfreq"))
    )
    ts = (
        ptf.join(F.broadcast(pdf), "token")
        .crossJoin(F.broadcast(pstats))
        .select("doc_id", "token", tscore.alias("tscore"))
    )
    sc = (
        ts.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, tscore))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.tscore)"
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _K)
        .select("query_id", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# retrieval_map_mrr — MAP + MRR against the r9 pseudo-qrels convention
# ---------------------------------------------------------------------------

# Pseudo-qrels: a doc is relevant to a query iff it contains EVERY
# query term (the r9 eval-report convention — deterministic, derived
# from the corpus itself, so the metric is exact at any sf).


@register(
    "retrieval_map_mrr",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_K)},
        qsize AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms
            FROM qterms GROUP BY query_id
        ),
        qd AS (
            SELECT q.query_id, t.doc_id,
                   CAST(COUNT(DISTINCT t.token) AS BIGINT) AS nt
            FROM idx_tf t JOIN qterms q USING (token)
            GROUP BY q.query_id, t.doc_id
        ),
        qrels AS (
            SELECT qd.query_id, qd.doc_id
            FROM qd JOIN qsize USING (query_id)
            WHERE qd.nt = qsize.n_terms
        ),
        nrel AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
            FROM qrels GROUP BY query_id
        ),
        hits AS (
            SELECT b.query_id, b.rank,
                   CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
            FROM branked b
            LEFT JOIN qrels r ON r.query_id = b.query_id
                             AND r.doc_id = b.doc_id
        ),
        prec AS (
            SELECT query_id, rank, rel,
                   CAST(SUM(rel) OVER (PARTITION BY query_id
                        ORDER BY rank) AS DOUBLE)
                   / CAST(rank AS DOUBLE) AS prec_at_k
            FROM hits
        ),
        perq AS (
            SELECT query_id,
                   SUM(CASE WHEN rel = 1 THEN prec_at_k ELSE 0.0 END)
                       AS ap_num,
                   MIN(CASE WHEN rel = 1 THEN rank END) AS first_hit,
                   CAST(SUM(rel) AS BIGINT) AS hits_at_k
            FROM prec
            GROUP BY query_id
        )
        SELECT p.query_id,
               CASE WHEN COALESCE(n.n_rel, 0) = 0 THEN 0.0
                    ELSE p.ap_num / LEAST(CAST(n.n_rel AS DOUBLE), {_K}.0)
               END AS ap_at_k,
               COALESCE(1.0 / CAST(p.first_hit AS DOUBLE), 0.0) AS rr,
               p.hits_at_k
        FROM perq p LEFT JOIN nrel n USING (query_id)
    """,
    doc=f"MAP@{_K} and MRR evaluation of the BM25 ranking against the "
    "r9 deterministic pseudo-qrels (doc relevant iff it contains "
    "EVERY query term): per query, average precision = mean of "
    "precision@rank at each relevant hit, normalized by min(#qrels, "
    f"{_K}) (the trec_eval AP@k convention), and reciprocal rank of "
    "the first hit. Running precision is an exact integer prefix-sum "
    "over rank divided by rank — no float accumulation ambiguity. "
    "Completes the r9 eval family (nDCG@10, eval report) with the "
    "two metrics every retrieval regression suite reports first.",
)
def retrieval_map_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    ranked = bm25_ranked_shared(spark, sf_dir, k=_K).select(
        "query_id", "doc_id", "rank"
    )
    qterms = _qterms_df(spark)
    qsize = qterms.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_terms")
    )
    # Persisted (r12, guide §1.2): qrels is consumed twice (the per-
    # query relevant-count and the ranked-hits flag join); unpersisted,
    # each consumer re-ran the index scan + aggregate.
    qrels = _persist(
        tf_idx.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("token").cast("long").alias("nt"))
        .join(F.broadcast(qsize), "query_id")
        .where(F.col("nt") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )
    nrel = qrels.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    hits = ranked.join(
        qrels.withColumn("rel1", F.lit(1)), ["query_id", "doc_id"], "left"
    ).select(
        "query_id",
        "rank",
        F.coalesce("rel1", F.lit(0)).alias("rel"),
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prec = hits.withColumn(
        "prec_at_k",
        F.sum("rel").over(w).cast("double") / F.col("rank").cast("double"),
    )
    perq = (
        prec.groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("rel") == 1, F.col("prec_at_k")).otherwise(0.0)
            ).alias("ap_num"),
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias(
                "first_hit"
            ),
            F.sum("rel").cast("long").alias("hits_at_k"),
        )
        .join(F.broadcast(nrel), "query_id", "left")
        .select(
            "query_id",
            F.when(F.coalesce("n_rel", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("ap_num")
                / F.least(
                    F.col("n_rel").cast("double"), F.lit(float(_K))
                )
            )
            .alias("ap_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("first_hit").cast("double"), F.lit(0.0)
            ).alias("rr"),
            "hits_at_k",
        )
    )
    return perq


# ---------------------------------------------------------------------------
# retrieval_rank_agreement — BM25 vs QLM Kendall tau over the top-10 union
# ---------------------------------------------------------------------------


@register(
    "retrieval_rank_agreement",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_K)},
        coll AS (
            SELECT CAST(SUM(dl) AS DOUBLE) AS c_total FROM idx_docs
        ),
        pc AS (
            SELECT token, CAST(SUM(tf) AS DOUBLE) / c_total AS p_c
            FROM idx_tf CROSS JOIN coll GROUP BY token, c_total
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
                       f'(2000.0 * p.p_c) / (CAST(c.dl AS DOUBLE) + 2000.0)',
                       product=True,
                   )} AS bg_prod
            FROM cand c JOIN qpc p ON p.query_id = c.query_id
            GROUP BY c.query_id, c.doc_id
        ),
        pres AS (
            SELECT p.query_id, t.doc_id,
                   {_sql_sorted_fold(
                       'p.token',
                       '(CAST(t.tf AS DOUBLE) + 2000.0 * p.p_c) '
                       '/ (2000.0 * p.p_c)',
                       product=True,
                   )} AS pres_prod
            FROM idx_tf t JOIN qpc p ON p.token = t.token
            GROUP BY p.query_id, t.doc_id
        ),
        qlm AS (
            SELECT query_id, doc_id, rank FROM (
                SELECT b.query_id, b.doc_id,
                       CAST(row_number() OVER (PARTITION BY b.query_id
                            ORDER BY b.bg_prod * p.pres_prod DESC,
                                     b.doc_id ASC) AS BIGINT) AS rank
                FROM bg b JOIN pres p
                  ON p.query_id = b.query_id AND p.doc_id = b.doc_id
            ) WHERE rank <= {_K}
        ),
        uni AS (
            SELECT query_id, doc_id,
                   COALESCE(b.rank, {_K + 1}) AS rank_bm25,
                   COALESCE(q.rank, {_K + 1}) AS rank_qlm
            FROM (SELECT query_id, doc_id, rank FROM branked) b
            FULL OUTER JOIN qlm q USING (query_id, doc_id)
        ),
        pairs AS (
            SELECT a.query_id,
                   CAST(SUM(CASE WHEN (a.rank_bm25 - b.rank_bm25)
                                    * (a.rank_qlm - b.rank_qlm) > 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
                   CAST(SUM(CASE WHEN (a.rank_bm25 - b.rank_bm25)
                                    * (a.rank_qlm - b.rank_qlm) < 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM uni a JOIN uni b
              ON a.query_id = b.query_id AND a.doc_id < b.doc_id
            GROUP BY a.query_id
        )
        SELECT p.query_id, u.n_union, p.concordant, p.discordant,
               CAST(p.concordant - p.discordant AS DOUBLE)
               / CAST(p.n_pairs AS DOUBLE) AS kendall_tau
        FROM pairs p
        JOIN (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_union
              FROM uni GROUP BY query_id) u USING (query_id)
    """,
    doc=f"Ranking-agreement report: Kendall tau between the BM25 and "
    f"Dirichlet-QLM (mu=2000) top-{_K} lists per query, computed over "
    f"the union of the two lists with absent docs pinned at rank "
    f"{_K + 1} (the standard truncated-list tau-handling). The pair "
    f"enumeration is a per-query self-join over <= 2x{_K} rows — "
    "bounded by k, NEVER corpus-proportional, the same bounded-grid "
    "posture as stats_kendall_tau_binned. Both rankers scan the "
    "shared index. The scorer-drift diagnostic run before swapping "
    "retrieval models in a curation pipeline: tau near 1 means the "
    "swap is low-risk; per-query lows localize where models disagree.",
)
def retrieval_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.queries.round9_retrieval import (
        retrieval_qlm_dirichlet_topk,
    )

    from sql_engine_spark.queries.retrieval import bm25_ranked_shared
    from sql_engine_spark.queries.round9_retrieval import qlm_ranked_shared

    # Both legs scan process-shared materialized rankings (r13; r12
    # verdict #8): the tau join is now the only per-invocation work.
    bm25 = bm25_ranked_shared(spark, sf_dir, k=_K).select(
        "query_id", "doc_id", F.col("rank").alias("rank_bm25")
    )
    qlm = qlm_ranked_shared(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("rank_qlm")
    )
    from sql_engine_spark.operators.dedup import _persist

    # The union relation is consumed THREE times (both sides of the
    # tau pair self-join + the per-query size) and is k-bounded
    # (<= 2k rows per query) — persist it so the two ranker pipelines
    # derive ONCE instead of once per consumer (r10 plan audit: this
    # query re-derived both rankers 3x, 27 scans / 57 shuffles).
    uni = _persist(
        bm25.join(qlm, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("rank_bm25", F.lit(_K + 1)).alias("rank_bm25"),
            F.coalesce("rank_qlm", F.lit(_K + 1)).alias("rank_qlm"),
        )
    )
    a = uni.alias("a")
    b = uni.alias("b")
    sgn = (F.col("a.rank_bm25") - F.col("b.rank_bm25")) * (
        F.col("a.rank_qlm") - F.col("b.rank_qlm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.query_id").alias("query_id"))
        .agg(
            F.sum(F.when(sgn > 0, 1).otherwise(0))
            .cast("long")
            .alias("concordant"),
            F.sum(F.when(sgn < 0, 1).otherwise(0))
            .cast("long")
            .alias("discordant"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    nu = uni.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_union")
    )
    return (
        pairs.join(F.broadcast(nu), "query_id")
        .select(
            "query_id",
            "n_union",
            "concordant",
            "discordant",
            (
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.col("n_pairs").cast("double")
            ).alias("kendall_tau"),
        )
    )
