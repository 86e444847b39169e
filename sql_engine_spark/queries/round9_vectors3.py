"""Round-9 late vectors/retrieval/quality/privacy batch.

- ann_sign_hamming_rerank: 1-bit (sign) vector quantization packed into
  two BIGINT lanes, Hamming shortlist, exact cosine rerank, recall@5
  audit vs the brute baseline.
- retrieval_ndcg_at10: graded-relevance nDCG over the shared BM25
  index, discounts as pinned literals (log2 of small integer ranks is
  a CONSTANT TABLE, not a runtime transcendental — the spectral-grid
  device applied to IR).
- quality_selection_rate_parity: per-source selection rates of the
  hashed linear quality classifier with disparate-impact ratios and
  the four-fifths flag.
- privacy_generalization_ladder: the k-anonymity generalization
  lattice walk — suppression cost at each quasi-identifier
  coarsening level.

The reference engine has none of this surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207); all four are
engine-beyond-reference coverage per SURVEY.md §2.5, libm-free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.functions.vectors import dot, l2_norm
from sql_engine_spark.io import load
from sql_engine_spark.operators.retrieval import bm25_index_shared, sql_bm25_index
from sql_engine_spark.operators.similarity import two_level_topk
from sql_engine_spark.operators.text import (
    hashed_linear_score,
    sql_hashed_linear_score,
)
from sql_engine_spark.queries.round9_retrieval import (
    _qterms_df,
    _sql_bm25_ranked,
    _SQL_QTERMS,
)
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# ann_sign_hamming_rerank — 1-bit quantization + Hamming shortlist
# ---------------------------------------------------------------------------

_SIGN_SHORTLIST = 30
_SIGN_K = 5

_SQL_SIGN_COS = """
    list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
"""


def _sql_sign_half(lo: int, hi: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_slice(embedding, {lo}, {hi}), "
        f"x -> CAST(CASE WHEN x > 0 THEN 1 ELSE 0 END AS BIGINT))), "
        f"(a, b) -> a * 2 + b)"
    )


@register(
    "ann_sign_hamming_rerank",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   {_sql_sign_half(1, 32)} AS h1,
                   {_sql_sign_half(33, 64)} AS h2
            FROM embeddings
        ),
        ham AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   bit_count(xor(q.h1, c.h1)) + bit_count(xor(q.h2, c.h2))
                       AS hamming,
                   {_SQL_SIGN_COS} AS cosine
            FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10
        ),
        short AS (
            SELECT query_id, neighbor_id, cosine FROM (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY hamming, neighbor_id) AS hrank
                FROM ham
            ) WHERE hrank <= {_SIGN_SHORTLIST}
        ),
        rerank AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rank
                FROM short
            ) WHERE rank <= {_SIGN_K}
        ),
        brute AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rank
                FROM ham
            ) WHERE rank <= {_SIGN_K}
        )
        SELECT b.query_id,
               CAST(COUNT(r.neighbor_id) AS BIGINT) AS hits_at5,
               CAST(COUNT(r.neighbor_id) AS DOUBLE)
                   / CAST({_SIGN_K} AS DOUBLE) AS recall_at5
        FROM brute b
        LEFT JOIN rerank r ON b.query_id = r.query_id
                          AND b.neighbor_id = r.neighbor_id
        GROUP BY b.query_id
    """,
    doc="1-bit (sign) vector quantization with Hamming shortlist and "
    "exact rerank (Charikar 2002 SRP specialized to the identity "
    "projection; the 'binary quantization' mode every modern vector "
    "store ships — 32x memory compression): pack the 64 sign bits into "
    "two BIGINT lanes, shortlist the "
    f"{_SIGN_SHORTLIST} Hamming-nearest candidates per query (two "
    "XOR+POPCNT ops per pair instead of 64 multiply-adds — the 100 TB "
    "arithmetic win, and the packed codes are 16 bytes/vector so a "
    "billion codes fit in cluster RAM), then rerank the shortlist with "
    "exact cosine and report recall@5 against the in-plan brute-force "
    "truth. Both top-k stages run through the salted two-level rank "
    "(no single-task corpus sort). Deterministic ties: (hamming, id) "
    "and (cosine DESC, id).",
)
def ann_sign_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")

    def half(lo: int) -> F.Column:
        return F.aggregate(
            F.slice("embedding", lo, 32),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2
            + F.when(x > F.lit(0.0), F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )

    v = emb.select(
        "vec_id",
        "embedding",
        l2_norm("embedding").alias("nrm"),
        half(1).alias("h1"),
        half(33).alias("h2"),
    )
    q = v.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("h1").alias("qh1"),
        F.col("h2").alias("qh2"),
    )
    c = v.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("h1").alias("ch1"),
        F.col("h2").alias("ch2"),
    )
    ham = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "neighbor_id",
            (
                F.bit_count(F.expr("qh1 ^ ch1"))
                + F.bit_count(F.expr("qh2 ^ ch2"))
            ).alias("hamming"),
            (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    short = two_level_topk(
        ham,
        score_col="hamming",
        k=_SIGN_SHORTLIST,
        rank_col="hrank",
        ascending=True,
    ).drop("hrank")
    rerank = two_level_topk(short, score_col="cosine", k=_SIGN_K).select(
        "query_id", "neighbor_id"
    )
    brute = two_level_topk(ham, score_col="cosine", k=_SIGN_K).select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(
        rerank.withColumn("__hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    return hits.groupBy("query_id").agg(
        F.count("__hit").cast("long").alias("hits_at5"),
        (F.count("__hit").cast("double") / F.lit(float(_SIGN_K))).alias(
            "recall_at5"
        ),
    )


# ---------------------------------------------------------------------------
# retrieval_ndcg_at10 — graded nDCG with pinned literal discounts
# ---------------------------------------------------------------------------

_NDCG_K = 10
# 1/log2(rank+1) for ranks 1..10 — computed ONCE here and embedded as
# the same shortest-roundtrip literal in both engines (the literal
# trig-grid device: log2 of a small-integer constant is a constant).
_DISCOUNTS = [1.0 / math.log2(i + 1) for i in range(1, _NDCG_K + 1)]
_SQL_DISC = (
    "[" + ", ".join(f"CAST({repr(d)} AS DOUBLE)" for d in _DISCOUNTS) + "]"
)


@register(
    "retrieval_ndcg_at10",
    oracle=f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_NDCG_K)},
        grades AS (
            SELECT q.query_id, t.doc_id, CAST(COUNT(*) AS BIGINT) AS rel
            FROM idx_tf t JOIN qterms q USING (token)
            GROUP BY q.query_id, t.doc_id
        ),
        dcg AS (
            SELECT r.query_id,
                   {sql_ssum(
                       'CAST(COALESCE(g.rel, 0) AS DOUBLE)'
                       f' * {_SQL_DISC}[r.rank]',
                       scale='1000000000.0')} AS dcg
            FROM branked r
            LEFT JOIN grades g ON g.query_id = r.query_id
                              AND g.doc_id = r.doc_id
            GROUP BY r.query_id
        ),
        ideal AS (
            SELECT query_id, rel,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
            FROM grades
        ),
        idcg AS (
            SELECT query_id,
                   {sql_ssum(
                       f'CAST(rel AS DOUBLE) * {_SQL_DISC}[irank]',
                       scale='1000000000.0')} AS idcg
            FROM ideal WHERE irank <= {_NDCG_K}
            GROUP BY query_id
        )
        SELECT d.query_id, d.dcg, i.idcg, d.dcg / i.idcg AS ndcg
        FROM dcg d JOIN idcg i USING (query_id)
    """,
    doc=f"nDCG@{_NDCG_K} over the shared BM25 index with GRADED "
    "pseudo-relevance (rel(q,d) = number of distinct query terms the "
    "doc contains, 1..3 — the graded refinement of the eval report's "
    "boolean-AND qrels; Jarvelin & Kekalainen TOIS 2002): DCG folds "
    "rel x 1/log2(rank+1) over the BM25 top-10, IDCG over the ideal "
    "(rel DESC) ordering of the full graded candidate set, nDCG = "
    "DCG/IDCG. The discount column is a PINNED LITERAL ARRAY — log2 "
    "of small-integer ranks is a module-import constant embedded "
    "identically in both engines (the spectral literal-grid device), "
    "so no runtime transcendental exists anywhere. Grades cost one "
    "broadcast-filtered postings aggregate; both folds cross engines "
    "via ssum at the 1e-9 grain.",
)
def retrieval_ndcg_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    qterms = _qterms_df(spark)
    ranked = bm25_ranked_shared(spark, sf_dir, k=_NDCG_K)
    from sql_engine_spark.operators.dedup import _persist

    # Consumed twice (the DCG join and the ideal-ordering top-k); the
    # persist makes single evaluation of the postings aggregate
    # structural instead of relying on runtime exchange reuse (r12,
    # guide §5 — same treatment as map_mrr/eval_report's qrels).
    grades = _persist(
        tf_idx.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("rel"))
    )
    disc = F.array(*[F.lit(d) for d in _DISCOUNTS])
    dcg = (
        ranked.join(grades, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            (
                F.coalesce("rel", F.lit(0)).cast("double")
                * F.element_at(disc, F.col("rank").cast("int"))
            ).alias("term"),
        )
        .groupBy("query_id")
        .agg(ssum(F.col("term"), scale=1e9).alias("dcg"))
    )
    ideal = two_level_topk(
        grades.withColumnRenamed("doc_id", "neighbor_id"),
        score_col="rel",
        k=_NDCG_K,
        rank_col="irank",
    )
    idcg = ideal.select(
        "query_id",
        (
            F.col("rel").cast("double")
            * F.element_at(disc, F.col("irank").cast("int"))
        ).alias("term"),
    ).groupBy("query_id").agg(ssum(F.col("term"), scale=1e9).alias("idcg"))
    return dcg.join(idcg, "query_id").select(
        "query_id", "dcg", "idcg", (F.col("dcg") / F.col("idcg")).alias("ndcg")
    )


# ---------------------------------------------------------------------------
# quality_selection_rate_parity — disparate impact of the quality filter
# ---------------------------------------------------------------------------


@register(
    "quality_selection_rate_parity",
    oracle=f"""
        WITH scored AS ({sql_hashed_linear_score()}),
        j AS (
            SELECT d.source, s.label
            FROM scored s JOIN documents d USING (doc_id)
        ),
        g AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN label = 'keep' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_keep
            FROM j GROUP BY source
        ),
        r AS (
            SELECT source, n_docs, n_keep,
                   CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE)
                       AS selection_rate
            FROM g
        ),
        best AS (SELECT MAX(selection_rate) AS best_rate FROM r)
        SELECT source, n_docs, n_keep, selection_rate, best_rate,
               selection_rate / best_rate AS impact_ratio,
               selection_rate / best_rate >= CAST(0.8 AS DOUBLE)
                   AS passes_four_fifths
        FROM r CROSS JOIN best
    """,
    doc="Disparate-impact audit of the quality filter by source "
    "(Feldman et al. KDD'15; the EEOC four-fifths rule, 29 CFR "
    "1607.4(D)): per-source selection rate of the hashed linear "
    "quality classifier (same scorer as text_quality_classifier — "
    "one shared per-row map), the impact ratio against the "
    "best-selected source, and the 80%-rule flag. A curation pipeline "
    "that silently filters one source 5x harder than another skews "
    "the training mixture — this is the per-round audit that catches "
    "it. Integer counts, one bounded groupBy, fixed-order divisions; "
    "0.8 pinned CAST(AS DOUBLE).",
)
def quality_selection_rate_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = hashed_linear_score(
        docs, id_col="doc_id", text_col="text", carry_cols=["source"]
    )
    g = scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("label") == "keep", 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
    )
    r = g.withColumn(
        "selection_rate",
        F.col("n_keep").cast("double") / F.col("n_docs").cast("double"),
    )
    best = r.agg(F.max("selection_rate").alias("best_rate"))
    return r.crossJoin(F.broadcast(best)).select(
        "source",
        "n_docs",
        "n_keep",
        "selection_rate",
        "best_rate",
        (F.col("selection_rate") / F.col("best_rate")).alias("impact_ratio"),
        (F.col("selection_rate") / F.col("best_rate") >= F.lit(0.8)).alias(
            "passes_four_fifths"
        ),
    )


# ---------------------------------------------------------------------------
# privacy_generalization_ladder — k-anonymity lattice walk
# ---------------------------------------------------------------------------

_LADDER_K = 5


def _sql_ladder_level(name: str, uid: str, t: str) -> str:
    return f"""
            SELECT '{name}' AS level,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(MIN(cnt) AS BIGINT) AS min_group,
                   CAST(SUM(cnt) AS BIGINT) AS rows_total,
                   CAST(SUM(CASE WHEN cnt < {_LADDER_K} THEN cnt ELSE 0 END)
                        AS BIGINT) AS rows_suppressed
            FROM (
                SELECT {uid} AS qi_user, {t} AS qi_time,
                       CAST(COUNT(*) AS BIGINT) AS cnt
                FROM events GROUP BY 1, 2
            )"""


@register(
    "privacy_generalization_ladder",
    oracle=f"""
        WITH lv AS (
            {_sql_ladder_level('L0_exact', 'user_id',
                               "CAST(date_trunc('day', ts) AS DATE)")}
            UNION ALL
            {_sql_ladder_level('L1_decade_week', 'user_id // 10',
                               "datediff('day', DATE '1970-01-01', "
                               "CAST(date_trunc('day', ts) AS DATE)) // 7")}
            UNION ALL
            {_sql_ladder_level('L2_century_month', 'user_id // 100',
                               "CAST(date_trunc('month', ts) AS DATE)")}
        )
        SELECT level, n_groups, min_group, rows_total, rows_suppressed,
               CAST(rows_suppressed AS DOUBLE) / CAST(rows_total AS DOUBLE)
                   AS suppression_fraction,
               rows_suppressed = 0 AS k_satisfied
        FROM lv
    """,
    doc="k-anonymity generalization-lattice walk (Samarati & Sweeney "
    "1998; the Incognito/Mondrian decision input): for three "
    "quasi-identifier coarsenings of (user_id, event time) — exact "
    "user x day, user-decade x week, user-century x month — report "
    "group count, the minimum group size, and the suppression cost "
    f"(rows in groups below k={_LADDER_K}) of publishing at that "
    "level. The ladder quantifies the privacy-utility trade a release "
    "pipeline walks: generalize until the suppression fraction is "
    "acceptable, suppress the remainder (the existing "
    "privacy_suppression_plan operator). Three map-side-combinable "
    "aggregates; week is epoch-day//7 arithmetic (engine-neutral week "
    "numbering), all counts exact BIGINTs.",
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")

    def level(name: str, uid: F.Column, t: F.Column) -> DataFrame:
        g = ev.groupBy(
            uid.alias("qi_user"), t.alias("qi_time")
        ).agg(F.count("*").cast("long").alias("cnt"))
        return g.agg(
            F.lit(name).alias("level"),
            F.count("*").cast("long").alias("n_groups"),
            F.min("cnt").cast("long").alias("min_group"),
            F.sum("cnt").cast("long").alias("rows_total"),
            F.sum(F.when(F.col("cnt") < _LADDER_K, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("rows_suppressed"),
        )

    day = F.date_trunc("day", "ts").cast("date")
    lv = (
        level("L0_exact", F.col("user_id"), day)
        .unionAll(
            level(
                "L1_decade_week",
                F.expr("user_id DIV 10"),
                F.expr(
                    "datediff(CAST(date_trunc('day', ts) AS DATE), "
                    "DATE '1970-01-01') DIV 7"
                ),
            )
        )
        .unionAll(
            level(
                "L2_century_month",
                F.expr("user_id DIV 100"),
                F.date_trunc("month", "ts").cast("date"),
            )
        )
    )
    return lv.select(
        "level",
        "n_groups",
        "min_group",
        "rows_total",
        "rows_suppressed",
        (
            F.col("rows_suppressed").cast("double")
            / F.col("rows_total").cast("double")
        ).alias("suppression_fraction"),
        (F.col("rows_suppressed") == 0).alias("k_satisfied"),
    )


# ---------------------------------------------------------------------------
# emb_anisotropy_profile — how directionally concentrated is the space?
# ---------------------------------------------------------------------------


@register(
    "emb_anisotropy_profile",
    oracle=f"""
        WITH v AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        d AS (
            SELECT CAST(i AS BIGINT) AS pos, e[i + 1] AS val
            FROM (SELECT e, unnest(range(0, len(e))) AS i FROM v)
        ),
        mu AS (
            SELECT pos, {sql_ssum('val')} / CAST((SELECT n FROM cnt) AS DOUBLE)
                       AS mu
            FROM d GROUP BY pos
        ),
        mv AS (
            SELECT sqrt({sql_ssum('mu * mu', scale='1000000000.0')})
                       AS mean_vec_norm
            FROM mu
        ),
        mn AS (
            SELECT {sql_ssum(
                'sqrt(list_reduce(list_transform(e, '
                'x -> x * x), (a, b) -> a + b))')}
                   / CAST((SELECT n FROM cnt) AS DOUBLE) AS mean_norm
            FROM v
        )
        SELECT n, mean_norm, mean_vec_norm,
               mean_vec_norm / mean_norm AS anisotropy
        FROM cnt CROSS JOIN mn CROSS JOIN mv
    """,
    doc="Embedding-space anisotropy profile (Ethayarajh EMNLP 2019's "
    "observation that contextual embedding spaces collapse into a "
    "narrow cone; Mu & Viswanath's all-but-the-top remedy): the ratio "
    "||mean vector|| / mean(||v||). Near 0 = centered/isotropic "
    "(cosine similarities are meaningful); near 1 = all vectors share "
    "a dominant direction (every cosine is inflated and dedup/ANN "
    "thresholds calibrated on it silently break). The per-dimension "
    "mean is one posexplode + 64-group aggregate (dimension-bounded), "
    "the norms fold through the house sequential reduction, and every "
    "corpus-sized double crosses engines via ssum. The audit a "
    "pipeline runs before trusting any cosine threshold it tuned "
    "elsewhere.",
)
def emb_anisotropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.vectors import l2_norm

    emb = load(spark, sf_dir, "embeddings").select("embedding")
    cnt = emb.agg(F.count("*").cast("long").alias("n"))
    d = emb.select(
        F.posexplode(F.col("embedding")).alias("pos", "valf")
    ).select(
        F.col("pos").cast("long").alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    mu = (
        d.groupBy("pos")
        .agg(ssum(F.col("val")).alias("s"))
        .crossJoin(F.broadcast(cnt))
        .select((F.col("s") / F.col("n").cast("double")).alias("mu"))
    )
    mv = mu.agg(
        F.sqrt(ssum(F.col("mu") * F.col("mu"), scale=1e9)).alias(
            "mean_vec_norm"
        )
    )
    mn = (
        emb.select(l2_norm("embedding").alias("nrm"))
        .agg(ssum(F.col("nrm")).alias("s"))
        .crossJoin(F.broadcast(cnt))
        .select((F.col("s") / F.col("n").cast("double")).alias("mean_norm"))
    )
    return (
        cnt.crossJoin(F.broadcast(mn))
        .crossJoin(F.broadcast(mv))
        .select(
            "n",
            "mean_norm",
            "mean_vec_norm",
            (F.col("mean_vec_norm") / F.col("mean_norm")).alias("anisotropy"),
        )
    )
