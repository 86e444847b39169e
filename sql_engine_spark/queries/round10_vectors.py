"""Round-10 vector batch: label-filtered exact search (the 'filtered
ANN' baseline every vector store now benchmarks — predicate pushdown
INTO the candidate join, not post-filtering a top-k), triplet mining
over the shared kNN graph (the contrastive-training data miner:
hardest positive / hardest negative per anchor, Schroff et al. FaceNet
CVPR 2015 terminology), and two-stage residual scalar quantization
(the residual-coding idea of RQ/RVQ applied to the SQ8 codec —
quantize, subtract the reconstruction, quantize the residual at the
finer stage-2 scale, report the per-stage distortion drop).

House discipline: double reductions go through DECIMAL(27,6)
(functions/numeric.dsum — order-independent cross-engine), per-vector
folds stay in dimension order, rankings tie-break (score DESC, id ASC),
and round() ties (away-from-zero in both engines) carry the int8 codec.

The reference engine has no vector surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207); these extend
the SURVEY LLM-ops similarity family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.graph import (
    KNN_K,
    knn_graph_shared,
    sql_knn_shared,
)
from sql_engine_spark.registry import register

_COS = """
    list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
"""

# ---------------------------------------------------------------------------
# ann_label_filtered_topk — exact filtered search (filter pushed into join)
# ---------------------------------------------------------------------------


@register(
    "ann_label_filtered_topk",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
                   {_COS} AS cosine
            FROM v q JOIN v c ON q.label = c.label
             AND q.vec_id < 10 AND c.vec_id >= 10
        )
        SELECT query_id, label, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= 5
    """,
    doc="Label-filtered exact cosine top-5 (the 'filtered ANN' "
    "baseline: every production vector search carries a metadata "
    "predicate — tenant, language, license class): each of the 10 "
    "query vectors searches ONLY corpus vectors sharing its label, "
    "with the filter applied as an equi-join key BEFORE any scoring — "
    "at 100 TB this is the difference between scoring the whole "
    "corpus and scoring one label partition (the filter prunes the "
    "shuffle, not the top-k). Post-filtering a global top-k instead "
    "would under-fill results for selective filters — the classic "
    "filtered-search failure this operator's shape avoids. Exact "
    "arithmetic, (cosine DESC, id) ties.",
)
def ann_label_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("e"),
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label"),
        F.col("e").alias("qe"),
    )
    c = emb.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label"),
        F.col("e").alias("ce"),
    )
    dot = F.expr(
        "aggregate(zip_with(qe, ce, (a, b) -> a * b), "
        "CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
    )
    nrm = F.sqrt(
        F.expr(
            "aggregate(transform(qe, x -> x * x), CAST(0.0 AS DOUBLE), "
            "(s, x) -> s + x)"
        )
    ) * F.sqrt(
        F.expr(
            "aggregate(transform(ce, x -> x * x), CAST(0.0 AS DOUBLE), "
            "(s, x) -> s + x)"
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, "label")
        .select(
            "query_id", "label", "neighbor_id", (dot / nrm).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("query_id", "label", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# emb_triplet_mining — hardest positive / hardest negative per anchor
# ---------------------------------------------------------------------------


def _triplet_oracle() -> str:
    from sql_engine_spark.operators.graph import sql_knn_shared

    return f"""
        WITH knn AS ({sql_knn_shared()}),
        lbl AS (SELECT vec_id, label FROM embeddings),
        e AS (
            SELECT k.src, k.dst, k.cosine,
                   a.label AS a_label, b.label AS b_label
            FROM knn k
            JOIN lbl a ON a.vec_id = k.src
            JOIN lbl b ON b.vec_id = k.dst
        ),
        per_anchor AS (
            SELECT src, ANY_VALUE(a_label) AS label,
                   MAX(CASE WHEN b_label = a_label THEN cosine END)
                       AS pos_cos,
                   MAX(CASE WHEN b_label <> a_label THEN cosine END)
                       AS neg_cos
            FROM e GROUP BY src
        ),
        trip AS (
            SELECT label, pos_cos - neg_cos AS margin
            FROM per_anchor
            WHERE pos_cos IS NOT NULL AND neg_cos IS NOT NULL
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_triplets,
               {sql_dsum('margin')} AS margin_sum,
               CAST(SUM(CASE WHEN margin <= 0.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hard,
               CAST(SUM(CASE WHEN margin > 0.0 AND margin <= 0.05
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_semi_hard
        FROM trip GROUP BY label
    """


@register(
    "emb_triplet_mining",
    oracle=_triplet_oracle(),
    doc="Triplet mining over the shared kNN graph (FaceNet, Schroff et "
    "al. CVPR 2015 vocabulary): per anchor, the hardest positive = "
    "highest-cosine same-label neighbor and hardest negative = "
    "highest-cosine different-label neighbor among its (up to) "
    f"{KNN_K} approximate nearest neighbors; margin = pos - neg. Per "
    "label: triplet count, decimal-exact margin sum (dsum — rerun- "
    "and engine-stable), HARD count (negative at least as close as "
    "the positive, margin <= 0 — the mislabeled/boundary anchors a "
    "contrastive fine-tune wants first) and SEMI-HARD count (margin "
    "in (0, 0.05]). Candidate pairs are bounded by the graph's "
    "out-degree — k per anchor, never corpus x corpus; the mining is "
    "one join + one anchor-keyed aggregate over the materialized "
    "graph. The training-pair generator for embedding fine-tuning "
    "runs exactly this shape at 100 TB.",
)
def emb_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph_shared(spark, sf_dir)
    lbl = emb.select("vec_id", "label")
    e = (
        g.join(
            lbl.select(
                F.col("vec_id").alias("src"), F.col("label").alias("a_label")
            ),
            "src",
        )
        .join(
            lbl.select(
                F.col("vec_id").alias("dst"), F.col("label").alias("b_label")
            ),
            "dst",
        )
        .select("src", "a_label", "b_label", "cosine")
    )
    per_anchor = e.groupBy("src").agg(
        F.first("a_label").alias("label"),
        F.max(
            F.when(F.col("b_label") == F.col("a_label"), F.col("cosine"))
        ).alias("pos_cos"),
        F.max(
            F.when(F.col("b_label") != F.col("a_label"), F.col("cosine"))
        ).alias("neg_cos"),
    )
    trip = per_anchor.where(
        F.col("pos_cos").isNotNull() & F.col("neg_cos").isNotNull()
    ).select("label", (F.col("pos_cos") - F.col("neg_cos")).alias("margin"))
    return trip.groupBy("label").agg(
        F.count("*").cast("long").alias("n_triplets"),
        dsum("margin").alias("margin_sum"),
        F.sum(F.when(F.col("margin") <= 0.0, 1).otherwise(0))
        .cast("long")
        .alias("n_hard"),
        F.sum(
            F.when(
                (F.col("margin") > 0.0) & (F.col("margin") <= 0.05), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_semi_hard"),
    )


# ---------------------------------------------------------------------------
# emb_residual_quantize — two-stage residual scalar quantization report
# ---------------------------------------------------------------------------

# Stage 1: the SQ8 symmetric codec (scale = amax/127). Stage 2 re-codes
# the stage-1 residual with ITS residual amax — the finer grid. Both
# stages share one exploded (dim, value) aggregate each.


def _rq_sql() -> str:
    q1 = "CASE WHEN s1.scale = 0.0 THEN 0.0 ELSE round(x.v / s1.scale) END"
    return f"""
        WITH x AS (
            SELECT vec_id, dim,
                   CAST(v AS DOUBLE) AS v
            FROM (SELECT vec_id,
                         unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                  FROM embeddings)
        ),
        s1 AS (
            SELECT dim,
                   GREATEST(ABS(MIN(v)), ABS(MAX(v))) / 127.0 AS scale
            FROM x GROUP BY dim
        ),
        r1 AS (
            SELECT x.vec_id, x.dim,
                   x.v - ({q1}) * s1.scale AS res
            FROM x JOIN s1 USING (dim)
        ),
        s2 AS (
            SELECT dim,
                   GREATEST(ABS(MIN(res)), ABS(MAX(res))) / 127.0 AS scale
            FROM r1 GROUP BY dim
        ),
        r2 AS (
            SELECT r1.vec_id, r1.dim,
                   r1.res - (CASE WHEN s2.scale = 0.0 THEN 0.0
                             ELSE round(r1.res / s2.scale) END) * s2.scale
                       AS res2,
                   r1.res
            FROM r1 JOIN s2 USING (dim)
        ),
        perv AS (
            SELECT vec_id,
                   CAST(COUNT(*) AS BIGINT) AS n_dims,
                   {sql_ssum('res * res', scale='1e15')} AS sse1,
                   {sql_ssum('res2 * res2', scale='1e15')} AS sse2
            FROM r2 GROUP BY vec_id
        )
        SELECT vec_id, n_dims, sse1, sse2,
               CASE WHEN sse1 = 0.0 THEN 0.0 ELSE sse2 / sse1 END
                   AS residual_ratio
        FROM perv
    """


@register(
    "emb_residual_quantize",
    oracle=_rq_sql(),
    doc="Two-stage residual scalar quantization report (the RQ/RVQ "
    "residual-coding idea on the SQ8 codec; stage 2 = FAISS-style "
    "refine step): stage 1 quantizes each dimension symmetrically "
    "(scale = amax/127, round half away from zero — identical tie "
    "rule both engines), stage 2 re-quantizes the stage-1 residual "
    "against the residual's own per-dimension amax (a ~127x finer "
    "grid when stage 1 is tight). Per vector: dimension count and "
    "decimal-exact squared-error mass after each stage (dsum), plus "
    "the sse2/sse1 ratio — the distortion the refine stage removes, "
    "i.e. the evidence for paying 2x code storage. Each stage costs "
    "ONE bounded (dim)-aggregate + one map pass; nothing is "
    "corpus-quadratic and the per-dim scale relations (64 rows) "
    "broadcast. Zero-spread dims guard to code 0 at both stages.",
)
def emb_residual_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "vf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )
    s1 = x.groupBy("dim").agg(
        (
            F.greatest(F.abs(F.min("v")), F.abs(F.max("v"))) / F.lit(127.0)
        ).alias("scale")
    )
    q1 = F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
        F.round(F.col("v") / F.col("scale"), 0)
    )
    r1 = (
        x.join(F.broadcast(s1), "dim")
        .select(
            "vec_id", "dim", (F.col("v") - q1 * F.col("scale")).alias("res")
        )
    )
    s2 = r1.groupBy("dim").agg(
        (
            F.greatest(F.abs(F.min("res")), F.abs(F.max("res")))
            / F.lit(127.0)
        ).alias("scale2")
    )
    q2 = F.when(F.col("scale2") == 0.0, F.lit(0.0)).otherwise(
        F.round(F.col("res") / F.col("scale2"), 0)
    )
    r2 = (
        r1.join(F.broadcast(s2), "dim")
        .select(
            "vec_id",
            "res",
            (F.col("res") - q2 * F.col("scale2")).alias("res2"),
        )
    )
    perv = r2.groupBy("vec_id").agg(
        F.count("*").cast("long").alias("n_dims"),
        ssum(F.col("res") * F.col("res"), scale=1e15).alias("sse1"),
        ssum(F.col("res2") * F.col("res2"), scale=1e15).alias("sse2"),
    )
    return perv.select(
        "vec_id",
        "n_dims",
        "sse1",
        "sse2",
        F.when(F.col("sse1") == 0.0, F.lit(0.0))
        .otherwise(F.col("sse2") / F.col("sse1"))
        .alias("residual_ratio"),
    )


# ---------------------------------------------------------------------------
# ann_knn_graph_derived — the kNN graph at the 100 TB operating point
# ---------------------------------------------------------------------------


@register(
    "ann_knn_graph_derived",
    oracle=sql_knn_shared(),
    doc="Batch kNN graph with the plane count DERIVED from the corpus "
    "size (planes = ceil(log2(n/1024)), floored/capped — operators/"
    "similarity.derived_planes) instead of a pinned 4: the 100 TB "
    "operating point, where expected bucket volume stays ~1024 rows "
    "as corpora grow and the build stays ~linear. The r10 sf1 stress "
    "probe measured the pinned build at ~37x wall for 10x vectors "
    "(in-bucket candidate pairs grow quadratically once buckets "
    "saturate, 215s vs 53s derived). As of round 11 the WHOLE graph "
    "family runs on this derivation — knn_graph_shared derives its "
    "plane count per dataset and every consumer's oracle substitutes "
    "the same count via the deferred sql_knn_shared marker — so this "
    "entry is now the family's parity probe: literally the shared "
    "scan, pinned green at every sealed sf.",
)
def ann_knn_graph_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared

    return knn_graph_shared(spark, sf_dir)
