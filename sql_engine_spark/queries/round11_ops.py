"""Round-11 operator batch: interpolated Kneser-Ney bigram smoothing
(the modern-LM-era n-gram smoothing the MLE bigram scorer and Katz-style
trigram backoff left uncovered), deterministic systematic PPS sampling
(Madow 1949 — the unequal-probability design behind size-weighted corpus
subsampling), and Matryoshka truncation distortion over the shared kNN
graph's edges (the pairwise-geometry complement to emb_matryoshka_recall's
retrieval view).

House disciplines: integer counts until final fixed-order rational
arithmetic (Kneser-Ney's D = 0.75 is binary-exact); two-level bucketed
prefix sums instead of single-task global windows (operators/prefix);
shared materialized relations (knn graph) instead of per-query rebuilds;
deterministic tie-breaks everywhere.

The reference engine has none of this surface (min/max/sum/count/avg
only — /root/reference/src/executor/aggregation.rs:168-427).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.graph import sql_knn_shared
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# text_kneser_ney_bigram — interpolated KN smoothing, top bigrams
# ---------------------------------------------------------------------------

_KN_D = 0.75  # the standard absolute discount; binary-exact in a double
_KN_TOPN = 20


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('text')} AS t FROM documents
        ),
        big AS (
            SELECT a.tok AS w1, b.tok AS w2
            FROM (SELECT doc_id, unnest(t) AS tok,
                         generate_subscripts(t, 1) AS p FROM toks) a
            JOIN (SELECT doc_id, unnest(t) AS tok,
                         generate_subscripts(t, 1) AS p FROM toks) b
              ON b.doc_id = a.doc_id AND b.p = a.p + 1
        ),
        bc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram
            FROM big GROUP BY w1, w2
        ),
        uni AS (
            SELECT w1,
                   CAST(SUM(c_bigram) AS BIGINT) AS c_w1,
                   CAST(COUNT(*) AS BIGINT) AS n1p_fw
            FROM bc GROUP BY w1
        ),
        cont AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bw
            FROM bc GROUP BY w2
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n1p_all FROM bc
        )
        SELECT w1, w2, c_bigram, c_w1, n1p_fw, n1p_bw,
               (CAST(n1p_bw AS DOUBLE) / CAST(n1p_all AS DOUBLE)) AS p_cont,
               ((CAST(c_bigram AS DOUBLE) - {_KN_D})
                    / CAST(c_w1 AS DOUBLE))
               + ((({_KN_D} * CAST(n1p_fw AS DOUBLE))
                    / CAST(c_w1 AS DOUBLE))
                  * (CAST(n1p_bw AS DOUBLE) / CAST(n1p_all AS DOUBLE)))
                   AS p_kn
        FROM (
            SELECT b.*, u.c_w1, u.n1p_fw, c.n1p_bw, t.n1p_all,
                   row_number() OVER (ORDER BY b.c_bigram DESC,
                                      b.w1 ASC, b.w2 ASC) AS rk
            FROM bc b
            JOIN uni u USING (w1) JOIN cont c USING (w2) CROSS JOIN tot t
        ) WHERE rk <= {_KN_TOPN}
    """,
    doc="Interpolated Kneser-Ney bigram smoothing (Kneser & Ney 1995; "
    f"Chen & Goodman 1999's preferred variant), D = {_KN_D}, reported "
    f"for the corpus's top-{_KN_TOPN} bigrams: P_KN(w2|w1) = "
    "(c(w1w2)-D)/c(w1) + D*N1+(w1,.)/c(w1) * P_cont(w2), with the "
    "continuation probability P_cont(w2) = N1+(.,w2)/N1+(..) counting "
    "distinct CONTEXTS, not tokens — the property that makes KN the "
    "default n-gram smoother ('Francisco' is frequent but only ever "
    "follows 'San'). Complements text_bigram_lm_score (MLE) and "
    "text_trigram_backoff (Katz-style) with the third classic family. "
    "All counts integer-exact; D is binary-exact so the final "
    "fixed-order rational expression is bit-identical cross-engine. "
    "One adjacency explode + three grouped aggregates — the bigram "
    "relation is vocabulary^2-bounded, never corpus^2.",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Adjacent pairs without a positions self-join: index the token
    # array directly (engine side only — the oracle's positional join
    # is the same relation). The size guard is load-bearing: Spark's
    # sequence(2, n) is DESCENDING for n < 2.
    pairs = (
        docs.select(tokens("text").alias("t"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array() "
                    "ELSE transform(sequence(2, size(t)), "
                    "     i -> struct(element_at(t, i - 1) AS w1, "
                    "                 element_at(t, i) AS w2)) END"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bc = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c_bigram")
    )
    uni = bc.groupBy("w1").agg(
        F.sum("c_bigram").cast("long").alias("c_w1"),
        F.count("*").cast("long").alias("n1p_fw"),
    )
    cont = bc.groupBy("w2").agg(F.count("*").cast("long").alias("n1p_bw"))
    tot = bc.agg(F.count("*").cast("long").alias("n1p_all"))
    # Top-N through the salted two-level rank, NOT a bare global
    # row_number() window: bigram TYPES grow with the corpus (Heaps —
    # the repo's own text_heaps_doubling measures it), so an
    # unpartitioned sort would funnel a corpus-growing relation through
    # one task. Struct ordering is field-wise, so asc(struct(w1, w2))
    # is exactly the oracle's (w1 ASC, w2 ASC) tie-break; the result is
    # bit-identical to the single-window spelling.
    from sql_engine_spark.operators.similarity import two_level_topk

    joined = two_level_topk(
        bc.join(uni, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("__q", F.lit(1))
        .withColumn("__bid", F.struct("w1", "w2")),
        score_col="c_bigram",
        k=_KN_TOPN,
        rank_col="rk",
        query_col="__q",
        id_col="__bid",
    ).drop("__q", "__bid")
    d = F.lit(_KN_D)
    c_b = F.col("c_bigram").cast("double")
    c_w1 = F.col("c_w1").cast("double")
    n1fw = F.col("n1p_fw").cast("double")
    n1bw = F.col("n1p_bw").cast("double")
    n1all = F.col("n1p_all").cast("double")
    return joined.select(
        "w1",
        "w2",
        "c_bigram",
        "c_w1",
        "n1p_fw",
        "n1p_bw",
        (n1bw / n1all).alias("p_cont"),
        (((c_b - d) / c_w1) + (((d * n1fw) / c_w1) * (n1bw / n1all))).alias(
            "p_kn"
        ),
    )


# ---------------------------------------------------------------------------
# sample_pps_systematic — Madow systematic unequal-probability sampling
# ---------------------------------------------------------------------------

_PPS_M = 100  # selection points


@register(
    "sample_pps_systematic",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS s FROM documents
        ),
        cum AS (
            SELECT doc_id, s,
                   SUM(s) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS c
            FROM sized
        ),
        tot AS (SELECT CAST(SUM(s) AS BIGINT) AS tt FROM sized),
        hits AS (
            SELECT doc_id, s, c, c - s AS prev, tt,
                   (CASE WHEN 2 * c * {_PPS_M} <= tt THEN 0
                         ELSE LEAST({_PPS_M},
                             (2 * c * {_PPS_M} - tt + 2 * tt - 1) // (2 * tt))
                    END)
                 - (CASE WHEN 2 * (c - s) * {_PPS_M} <= tt THEN 0
                         ELSE LEAST({_PPS_M},
                             (2 * (c - s) * {_PPS_M} - tt + 2 * tt - 1)
                                 // (2 * tt))
                    END) AS n_hits
            FROM cum CROSS JOIN tot
        )
        SELECT doc_id, s AS n_chars, CAST(c AS BIGINT) AS cum_chars,
               CAST(n_hits AS BIGINT) AS n_hits
        FROM hits WHERE n_hits >= 1
    """,
    doc="Systematic probability-proportional-to-size sampling (Madow "
    f"1949): {_PPS_M} selection points u_k = (k + 1/2) * T / m placed "
    "at fixed midpoints over the cumulative n_chars line (deterministic "
    "— the house derandomization of the usual random start), each "
    "selecting the document whose [cum-s, cum) interval contains it. "
    "Inclusion probability is proportional to document size, the "
    "design token-weighted corpus subsampling wants (sampling docs "
    "uniformly under-represents long documents' tokens); n_hits > 1 "
    "flags documents larger than the sampling step (the with-"
    "replacement correction a downstream estimator needs). All "
    "arithmetic is INTEGER (the point count is cross-multiplied, "
    "never divided), so selection is bit-exact in both engines. "
    "Engine side: the cumulative line is a two-level bucketed prefix "
    "sum over a slim (doc_id, n_chars) projection — one corpus "
    "shuffle by range bucket, no single-task global sort.",
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.prefix import (
        bucketed_running_sum,
        derived_rank_buckets,
        range_bucket,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("s")
    )
    bounds = docs.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("tt"),
    )
    n_rows = docs.count()
    n_buckets = derived_rank_buckets(n_rows, target_rows=250_000)
    sized = docs.crossJoin(F.broadcast(bounds))
    cum = bucketed_running_sum(
        sized,
        part_cols=[],
        order_col="doc_id",
        value_col="s",
        bucket=range_bucket("doc_id", F.col("lo"), F.col("hi"), n_buckets),
        out_col="c",
    )
    def f_expr(xcol: str) -> str:
        """#selection points strictly below `xcol`, all-integer. The
        ELSE branch's dividend is strictly positive, where Spark's
        truncating `div` and DuckDB's flooring `//` agree."""
        return (
            f"(CASE WHEN 2 * {xcol} * {_PPS_M} <= tt THEN 0 "
            f"ELSE least(CAST({_PPS_M} AS BIGINT), "
            f"(2 * {xcol} * {_PPS_M} - tt + 2 * tt - 1) div (2 * tt)) END)"
        )

    hits = cum.withColumn("prev", F.col("c") - F.col("s")).withColumn(
        "n_hits",
        F.expr(f"{f_expr('c')} - {f_expr('prev')}").cast("long"),
    )
    return hits.where(F.col("n_hits") >= 1).select(
        "doc_id",
        F.col("s").alias("n_chars"),
        F.col("c").cast("long").alias("cum_chars"),
        "n_hits",
    )


# ---------------------------------------------------------------------------
# emb_matryoshka_edge_distortion — truncated-dim cosine error on kNN edges
# ---------------------------------------------------------------------------

_MTRYD = (16, 32)


def _trunc_cos_sql(d: int) -> str:
    """DuckDB cosine over the first d dims of pre-doubled lists a.e/b.e,
    fixed fold order (list_reduce is left-to-right, matching Spark's
    aggregate())."""
    return f"""
        list_reduce(list_transform(list_zip(a.e[1:{d}], b.e[1:{d}]),
                                   p -> p[1] * p[2]), (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(a.e[1:{d}], x -> x * x),
                            (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(b.e[1:{d}], x -> x * x),
                              (x, y) -> x + y)))
    """


@register(
    "emb_matryoshka_edge_distortion",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        ev AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        pairs AS (
            SELECT k.src, k.dst, k.cosine,
                   {_trunc_cos_sql(16)} AS cos16,
                   {_trunc_cos_sql(32)} AS cos32
            FROM knn k
            JOIN ev a ON a.vec_id = k.src
            JOIN ev b ON b.vec_id = k.dst
        )
        SELECT d, n_edges, abs_err_sum,
               abs_err_sum / CAST(n_edges AS DOUBLE) AS mean_abs_err,
               max_abs_err
        FROM (
            SELECT 16 AS d, CAST(COUNT(*) AS BIGINT) AS n_edges,
                   {sql_ssum('abs(cos16 - cosine)', scale='1000000000.0')}
                       AS abs_err_sum,
                   MAX(abs(cos16 - cosine)) AS max_abs_err
            FROM pairs
            UNION ALL
            SELECT 32 AS d, CAST(COUNT(*) AS BIGINT) AS n_edges,
                   {sql_ssum('abs(cos32 - cosine)', scale='1000000000.0')}
                       AS abs_err_sum,
                   MAX(abs(cos32 - cosine)) AS max_abs_err
            FROM pairs
        )
    """,
    doc="Matryoshka truncation distortion (Kusupati et al. 2022) "
    "measured on the shared kNN graph's EDGES: for each edge, the "
    "cosine recomputed from only the first 16/32 of 64 dimensions vs "
    "the full-dimension cosine; per truncation width, edge count, "
    "exact-summed absolute error (ssum at 1e9 — order-independent "
    "cross-engine), mean and max. The pairwise-geometry complement to "
    "emb_matryoshka_recall's retrieval‑rank view: rank recall can "
    "survive large absolute distortion, and a fine-tune that promises "
    "usable prefixes should watch both. Cost is edge-bounded (k per "
    "node via the shared materialized graph) — never corpus^2, and no "
    "re-derivation: one scan of the graph plus two slim joins to the "
    "doubled-vector relation. Fold order over dimensions is fixed and "
    "identical in both engines, so every cosine is bit-exact.",
)
def emb_matryoshka_edge_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    g = knn_graph_shared(spark, sf_dir)

    def cos_d(d: int):
        dot = F.expr(
            f"aggregate(zip_with(slice(a_e, 1, {d}), slice(b_e, 1, {d}), "
            "(x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
        )
        na = F.sqrt(
            F.expr(
                f"aggregate(transform(slice(a_e, 1, {d}), x -> x * x), "
                "CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
            )
        )
        nb = F.sqrt(
            F.expr(
                f"aggregate(transform(slice(b_e, 1, {d}), x -> x * x), "
                "CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
            )
        )
        return dot / (na * nb)

    pairs = (
        g.join(
            emb.select(F.col("vec_id").alias("src"), F.col("e").alias("a_e")),
            "src",
        )
        .join(
            emb.select(F.col("vec_id").alias("dst"), F.col("e").alias("b_e")),
            "dst",
        )
        .select(
            "cosine",
            cos_d(16).alias("cos16"),
            cos_d(32).alias("cos32"),
        )
    )
    # Both widths in ONE aggregation job (cos16/cos32 are columns of the
    # same row set), then an unpivot of the 1-row wide result — so the
    # graph scan and both embedding joins run exactly once, matching the
    # registered doc's "one scan of the graph plus two slim joins".
    aggs = [F.count("*").cast("long").alias("n_edges")]
    for d in _MTRYD:
        err = F.abs(F.col(f"cos{d}") - F.col("cosine"))
        aggs.append(ssum(err, scale=1e9).alias(f"abs_err_sum_{d}"))
        aggs.append(F.max(err).alias(f"max_abs_err_{d}"))
    wide = pairs.agg(*aggs)
    stack = (
        f"stack({len(_MTRYD)}, "
        + ", ".join(
            f"{d}, abs_err_sum_{d}, max_abs_err_{d}" for d in _MTRYD
        )
        + ") as (d, abs_err_sum, max_abs_err)"
    )
    out = wide.selectExpr("n_edges", stack).select(
        F.col("d").cast("int").alias("d"), "n_edges", "abs_err_sum",
        "max_abs_err",
    )
    return out.select(
        "d",
        "n_edges",
        "abs_err_sum",
        (F.col("abs_err_sum") / F.col("n_edges").cast("double")).alias(
            "mean_abs_err"
        ),
        "max_abs_err",
    )


# ---------------------------------------------------------------------------
# dedup_crossmodal_candidate_audit — the semantic leg's cost instrument
# ---------------------------------------------------------------------------


def _xm_audit_oracle() -> str:
    from sql_engine_spark.operators.similarity import sql_lsh_bucket
    from sql_engine_spark.queries.dedup import _XM_PLANES, _XM_TABLES

    bucket_rows = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{sql_lsh_bucket('e', _XM_PLANES, 64, offset=t * _XM_PLANES)} AS bk"
        " FROM xv"
        for t in range(_XM_TABLES)
    )
    return f"""
        WITH xv AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        xb AS ({bucket_rows}),
        sz AS (
            SELECT t, bk, CAST(COUNT(*) AS BIGINT) AS n
            FROM xb GROUP BY t, bk
        )
        SELECT t,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MAX(n) AS BIGINT) AS max_bucket,
               CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS cand_pairs
        FROM sz GROUP BY t
    """


@register(
    "dedup_crossmodal_candidate_audit",
    oracle=_xm_audit_oracle(),
    doc="Candidate-economics audit for dedup_crossmodal_agreement's "
    "semantic leg (the house cap-audit contract, applied where a CAP "
    "would be wrong): per LSH table, bucket count, max bucket size and "
    "the exact in-bucket candidate-pair volume sum(n*(n-1)/2) — "
    "computed from ONE grouped aggregate over the bucket rows, never "
    "by materializing the pairs, so the instrument costs O(n*tables) "
    "at any corpus size. This is the standing evidence for the "
    "operator's measured super-linear wall (alpha~1.3 at the r11 "
    "re-anchor): at a FIXED plane count the per-table candidate "
    "volume is ~n^2/2^(planes+1), and the plane count cannot grow "
    "with the corpus without collapsing the documented recall "
    "contract ((1-theta/pi)^planes per table — ~0.56^p at the t=0.2 "
    "operating point), while a bucket-size cap would drop EVERY "
    "bucket once avg size exceeds it (unlike the sparse hot-bucket "
    "case minhash's cap=20 handles). The answer itself also grows "
    "super-linearly on clustered embeddings (measured 1,868 -> "
    "29,142 verified pairs for 3.3x vectors), so the audit separates "
    "answer growth from candidate waste per dataset. All integers.",
)
def dedup_crossmodal_candidate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sql_engine_spark.operators.similarity import lsh_bucket
    from sql_engine_spark.queries.dedup import _XM_PLANES, _XM_TABLES

    emb = load(spark, sf_dir, "embeddings")
    cols = [
        lsh_bucket("embedding", _XM_PLANES, 64, offset=t * _XM_PLANES).alias(
            f"__b{t}"
        )
        for t in range(_XM_TABLES)
    ]
    wide = emb.select(F.col("vec_id").alias("__id"), *cols)
    stack = (
        f"stack({_XM_TABLES}, "
        + ", ".join(f"{t}, __b{t}" for t in range(_XM_TABLES))
        + ") as (t, bk)"
    )
    rows = wide.selectExpr("__id", stack)
    sz = rows.groupBy("t", "bk").agg(F.count("*").cast("long").alias("n"))
    return sz.groupBy("t").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.max("n").cast("long").alias("max_bucket"),
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("cand_pairs"),
    )
