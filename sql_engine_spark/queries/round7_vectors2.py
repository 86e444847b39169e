"""Round-7 vectors set 2: MMR diversified re-ranking (Carbonell &
Goldstein 1998) over the exact-cosine candidate set, and the product-
quantization reconstruction-distortion audit (the index-quality report
for ann_pq_topk / ann_ivfpq_topk).

Reference parity: the reference engine has no vector surface at all
(/root/reference/src — scalar expressions only); these extend the
repo's ANN family with the retrieval-diversity and index-audit legs a
RAG-era corpus stack needs.

Determinism: every cosine is the repo's sequential-order reduction
(functions/vectors.py — bit-identical to DuckDB's list_reduce); the
MMR lambda constants are shared literals with a fixed op order; greedy
ties break to the smallest neighbor id; PQ code assignment reuses the
first-max-lowest-code convention of pq_topk, and the per-subspace
reconstruction error is a sequential zip_with/aggregate reduction with
ssum for the cross-row mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.functions.vectors import cosine_sim, sql_cosine
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import register

DIM = 64
_MMR_K = 8  # candidate pool per query
_LAM = "0.7"
_ONE_MINUS_LAM = "0.3"


def _mmr_oracle() -> str:
    cc = sql_cosine("r.ce", "s.ce")
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nn AS (
            SELECT vec_id, e,
                   sqrt(list_reduce(list_transform(e, x -> x * x),
                                    (a, b) -> a + b)) AS n
            FROM v
        ),
        cand AS (
            SELECT query_id, neighbor_id, cosine, ce, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ({sql_cosine('q.e', 'c.e')}) AS cosine, c.e AS ce,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY ({sql_cosine('q.e', 'c.e')}) DESC, c.vec_id
                       ) AS rank
                FROM nn q JOIN nn c ON q.vec_id < 10 AND c.vec_id >= 10
            ) WHERE rank <= {_MMR_K}
        ),
        s1 AS (
            SELECT query_id, neighbor_id, cosine, ce FROM cand WHERE rank = 1
        ),
        r2s AS (
            SELECT r.query_id, r.neighbor_id, r.cosine, r.ce,
                   ({cc}) AS sim1,
                   CAST({_LAM} AS DOUBLE) * r.cosine
                   - CAST({_ONE_MINUS_LAM} AS DOUBLE) * ({cc}) AS score
            FROM cand r JOIN s1 s ON r.query_id = s.query_id
            WHERE r.rank > 1
        ),
        r2 AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, neighbor_id) AS rn
            FROM r2s
        ),
        s2 AS (SELECT query_id, neighbor_id, cosine, ce, score FROM r2 WHERE rn = 1),
        r3s AS (
            SELECT r.query_id, r.neighbor_id, r.cosine, r.sim1,
                   ({cc}) AS sim2,
                   CAST({_LAM} AS DOUBLE) * r.cosine
                   - CAST({_ONE_MINUS_LAM} AS DOUBLE)
                     * GREATEST(r.sim1, ({cc})) AS score
            FROM r2 r JOIN s2 s ON r.query_id = s.query_id
            WHERE r.rn > 1
        ),
        r3 AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, neighbor_id) AS rn
            FROM r3s
        ),
        s3 AS (SELECT query_id, neighbor_id, cosine, score FROM r3 WHERE rn = 1)
        SELECT query_id, CAST(1 AS BIGINT) AS slot, neighbor_id,
               cosine AS relevance,
               CAST({_LAM} AS DOUBLE) * cosine AS mmr_score
        FROM s1
        UNION ALL
        SELECT query_id, CAST(2 AS BIGINT), neighbor_id, cosine, score FROM s2
        UNION ALL
        SELECT query_id, CAST(3 AS BIGINT), neighbor_id, cosine, score FROM s3
    """


@register(
    "ann_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="Maximal Marginal Relevance re-ranking (Carbonell & Goldstein "
    f"1998): from each query's exact-cosine top-{_MMR_K} candidate "
    "pool, greedily select 3 results maximizing lambda*relevance - "
    f"(1-lambda)*max-similarity-to-selected (lambda = {_LAM}) — THE "
    "standard diversified-retrieval baseline for RAG result sets. The "
    "greedy loop unrolls to 3 fixed rounds of (candidates x selected) "
    "joins — each bounded by queries x pool size, never corpus-sized; "
    "candidate-candidate cosines are the sequential-order reduction "
    "shared with the oracle, ties break to the smallest neighbor id. "
    "The corpus-sized work is the one brute-force scoring pass "
    "(ann_brute_topk's plan); swap in any ANN candidate source at "
    "scale.",
)
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import brute_force_topk

    lam, oml = float(_LAM), float(_ONE_MINUS_LAM)
    emb = load(spark, sf_dir, "embeddings")
    cand = brute_force_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=_MMR_K,
    )
    ce = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    # cand is queries x pool rows — broadcast it against the corpus-sized
    # vector relation, and broadcast every selected-set relation in the
    # greedy rounds (queries-sized): no sort-merge join anywhere.
    cand = _persist(F.broadcast(cand).join(ce, "neighbor_id"))
    s1 = cand.where(F.col("rank") == 1).select(
        "query_id", "neighbor_id", "cosine", "ce"
    )
    r2s = (
        cand.where(F.col("rank") > 1)
        .join(
            F.broadcast(s1.select("query_id", F.col("ce").alias("s_ce"))),
            "query_id",
        )
        .withColumn("sim1", cosine_sim("ce", "s_ce"))
        .withColumn(
            "score", F.lit(lam) * F.col("cosine") - F.lit(oml) * F.col("sim1")
        )
        .drop("s_ce")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    r2 = r2s.withColumn("rn", F.row_number().over(w))
    s2 = r2.where(F.col("rn") == 1).select(
        "query_id", "neighbor_id", "cosine", "ce", "score"
    )
    r3s = (
        r2.where(F.col("rn") > 1)
        .join(
            F.broadcast(s2.select("query_id", F.col("ce").alias("s_ce"))),
            "query_id",
        )
        .withColumn("sim2", cosine_sim("ce", "s_ce"))
        .withColumn(
            "score",
            F.lit(lam) * F.col("cosine")
            - F.lit(oml) * F.greatest(F.col("sim1"), F.col("sim2")),
        )
        .drop("s_ce")
    )
    r3 = r3s.withColumn("rn", F.row_number().over(w))
    s3 = r3.where(F.col("rn") == 1).select("query_id", "neighbor_id", "cosine", "score")
    out1 = s1.select(
        "query_id",
        F.lit(1).cast("long").alias("slot"),
        "neighbor_id",
        F.col("cosine").alias("relevance"),
        (F.lit(lam) * F.col("cosine")).alias("mmr_score"),
    )
    out2 = s2.select(
        "query_id",
        F.lit(2).cast("long").alias("slot"),
        "neighbor_id",
        F.col("cosine").alias("relevance"),
        F.col("score").alias("mmr_score"),
    )
    out3 = s3.select(
        "query_id",
        F.lit(3).cast("long").alias("slot"),
        "neighbor_id",
        F.col("cosine").alias("relevance"),
        F.col("score").alias("mmr_score"),
    )
    return out1.unionAll(out2).unionAll(out3)


_PQ_SUB = 8
_PQ_K = 16
_PQ_DSUB = DIM // _PQ_SUB
_PQ_SCALE = "1000000000.0"


def _pq_distortion_oracle() -> str:
    dsub = _PQ_DSUB
    sl = f"[t.m * {dsub} + 1 : t.m * {dsub} + {dsub}]"
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),"
        " (acc, v) -> acc + v)"
    )
    err = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(list_zip(nv_slice, ce),"
        " p -> (p[1] - p[2]) * (p[1] - p[2]))),"
        " (a, b) -> a + b)"
    )
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nn AS (
            SELECT vec_id, e,
                   sqrt(list_reduce(list_transform(e, x -> x * x),
                                    (a, b) -> a + b)) AS n
            FROM v
        ),
        seeds AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j,
                   list_transform(e, x -> x / n) AS nv
            FROM (SELECT vec_id, e, n FROM nn WHERE vec_id >= 10
                  ORDER BY vec_id LIMIT {_PQ_K})
        ),
        ms AS (SELECT unnest(range(0, {_PQ_SUB})) AS m),
        cent AS (
            SELECT ms.m, s.j, s.nv[ms.m * {dsub} + 1 : ms.m * {dsub} + {dsub}] AS ce
            FROM seeds s CROSS JOIN ms
        ),
        assigned AS (
            SELECT vec_id, m, j, ce, nv_slice FROM (
                SELECT c.vec_id, t.m, t.j, t.ce,
                       list_transform(c.e, x -> x / c.n){sl} AS nv_slice,
                       row_number() OVER (PARTITION BY c.vec_id, t.m
                                          ORDER BY {dot.format(a=f'c.e{sl}', b='t.ce')} DESC, t.j)
                           AS rn
                FROM nn c CROSS JOIN cent t WHERE c.vec_id >= 10
            ) WHERE rn = 1
        ),
        errs AS (
            SELECT vec_id, m, {err} AS err FROM assigned
        )
        SELECT m,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               {sql_ssum("err", scale=_PQ_SCALE)} / CAST(COUNT(*) AS DOUBLE)
                   AS mean_err,
               MAX(err) AS max_err
        FROM errs
        GROUP BY m
    """


@register(
    "emb_pq_distortion",
    oracle=_pq_distortion_oracle(),
    doc="Product-quantization reconstruction-distortion audit — the "
    "index-quality report behind ann_pq_topk (same codebook: unit "
    f"sub-centroids from the {_PQ_K} lowest-id corpus vectors, "
    f"{_PQ_SUB} subspaces of {_PQ_DSUB} dims, first-max-lowest-code "
    "assignment): per subspace, the mean and max squared L2 error "
    "between each corpus vector's normalized slice and its assigned "
    "sub-centroid — exactly the quantity PQ k-means minimizes (Jegou "
    "et al. 2011), so a hot subspace flags where codebook budget "
    "should go. Assignment is one corpus x codebook scoring pass "
    "(codebook broadcast, 128 rows); the error reduction is the "
    "sequential zip_with/aggregate shared with the oracle; cross-row "
    "means go through ssum.",
)
def emb_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import _py_unit

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    seed_rows = (
        corpus.select("vec_id", F.col("embedding").alias("__v"))
        .orderBy("vec_id")
        .limit(_PQ_K)
        .collect()
    )
    units = [_py_unit(r["__v"]) for r in seed_rows]
    cent_rows = [
        (m, j, u[m * _PQ_DSUB : (m + 1) * _PQ_DSUB])
        for m in range(_PQ_SUB)
        for j, u in enumerate(units)
    ]
    cent = spark.createDataFrame(cent_rows, "m INT, j INT, ce ARRAY<DOUBLE>")
    from sql_engine_spark.functions.vectors import dot, l2_norm

    c = corpus.select(
        "vec_id", F.col("embedding").alias("e"), l2_norm("embedding").alias("n")
    )
    ms = spark.range(_PQ_SUB).select(F.col("id").cast("int").alias("m"))
    sliced = c.crossJoin(F.broadcast(ms)).select(
        "vec_id",
        "m",
        F.slice(F.col("e"), F.col("m") * _PQ_DSUB + 1, _PQ_DSUB).alias("e_slice"),
        F.slice(
            F.transform(F.col("e"), lambda x: x.cast("double") / F.col("n")),
            F.col("m") * _PQ_DSUB + 1,
            _PQ_DSUB,
        ).alias("nv_slice"),
    )
    wa = Window.partitionBy("vec_id", "m").orderBy(
        F.desc("__dot"), F.asc("j")
    )
    assigned = (
        sliced.join(F.broadcast(cent), "m")
        .withColumn("__dot", dot("e_slice", "ce"))
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
    )
    err = F.aggregate(
        F.zip_with(
            F.col("nv_slice"), F.col("ce"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    errs = assigned.select("m", err.alias("err"))
    scale = float(_PQ_SCALE)
    return errs.groupBy("m").agg(
        F.count("*").cast("long").alias("n_vectors"),
        (ssum(F.col("err"), scale=scale) / F.count("*").cast("double")).alias(
            "mean_err"
        ),
        F.max("err").alias("max_err"),
    )
