"""Round-7 vector & graph operators: Matryoshka truncation recall, a
Johnson-Lindenstrauss projection distortion audit, per-dimension
variance ranking, an embedding-space cosine histogram, resource-
allocation link prediction, and the kNN-graph degree histogram.

All pair stages are id-keyed joins or bounded-degree wedge joins; all
vector reductions are sequential-order folds (functions/vectors) so
doubles hash across engines; double reductions go through the shared
rounding (functions/numeric.ssum) where the DECIMAL cast seam could
bite.

Reference parity note: the reference engine (dylan-p-wong/sql-engine)
has no vector or graph surface (SURVEY.md §2); these extend the
LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.functions.vectors import dot, l2_norm
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.graph import sql_capped_adjacency
from sql_engine_spark.operators.similarity import (
    brute_force_topk,
    plane_vals,
)
from sql_engine_spark.operators.graph import sql_knn_shared
from sql_engine_spark.registry import register

_MRL_DIM = 16

_COS_QC = """
    list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
"""


def _brute_sql(src: str, k: int = 5) -> str:
    return f"""
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS_QC} AS cosine,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_COS_QC} DESC, c.vec_id) AS rank
            FROM {src} q JOIN {src} c
              ON q.vec_id < 10 AND c.vec_id >= 10
        ) WHERE rank <= {k}
    """


@register(
    "emb_matryoshka_recall",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        v16 AS (SELECT vec_id, e[1:{_MRL_DIM}] AS e FROM v),
        full_tk AS ({_brute_sql('v')}),
        pre_tk AS ({_brute_sql('v16')}),
        hits AS (
            SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM full_tk f JOIN pre_tk p
              ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
            GROUP BY f.query_id
        ),
        qs AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM full_tk GROUP BY query_id
        )
        SELECT qs.query_id, qs.n_true,
               COALESCE(n_hits, 0) AS n_hits,
               CAST(COALESCE(n_hits, 0) AS DOUBLE)
                   / CAST(qs.n_true AS DOUBLE) AS recall
        FROM qs LEFT JOIN hits USING (query_id)
    """,
    doc="Matryoshka truncation audit: recall@5 of brute-force search "
    "over the FIRST 16 of 64 embedding dimensions against the full-"
    "dimension truth (Kusupati et al. 2022 — MRL embeddings promise "
    "usable prefixes; this measures whether THESE embeddings keep "
    "that promise, the go/no-go for serving 4x-cheaper truncated "
    "vectors). Composes two brute baselines (broadcast queries x one "
    "corpus scan each) + id-sized joins; per-query denominator is the "
    "full-dim result count (the round-7 recall convention).",
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    pre = emb.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIM).alias("emb16")
    )
    full_tk = brute_force_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    )
    pre_tk = brute_force_topk(
        pre.where(F.col("vec_id") < 10),
        pre.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="emb16",
        k=5,
    )
    hits = (
        full_tk.select("query_id", "neighbor_id")
        .join(pre_tk.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    qs = full_tk.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_true")
    )
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        "n_true",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        (
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_true").cast("double")
        ).alias("recall"),
    )


_JL_P = 16
_JL_SRC_DIM = 64


def _jl_proj_sql() -> str:
    """DuckDB: the 16 projected coordinates as a list — each is the
    sequential-order dot of e with a deterministic +-1 plane, scaled by
    1/sqrt(P) (= /4.0 exactly for P=16)."""
    from sql_engine_spark.operators.similarity import sql_plane_pattern

    coords = ", ".join(
        "(list_reduce(list_transform(list_zip(e, "
        + sql_plane_pattern(100 + j, _JL_SRC_DIM)
        + "), p -> p[1] * p[2]), (x, y) -> x + y) / 4.0)"
        for j in range(_JL_P)
    )
    return f"[{coords}]"


@register(
    "emb_jl_distortion",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        p AS (SELECT vec_id, e, {_jl_proj_sql()} AS pj FROM v),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   sqrt(list_reduce(list_transform(list_zip(a.e, b.e),
                        q -> (q[1] - q[2]) * (q[1] - q[2])), (x, y) -> x + y))
                       AS dist_full,
                   sqrt(list_reduce(list_transform(list_zip(a.pj, b.pj),
                        q -> (q[1] - q[2]) * (q[1] - q[2])), (x, y) -> x + y))
                       AS dist_proj
            FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
        )
        SELECT id_a, id_b, dist_full, dist_proj,
               dist_proj / dist_full AS ratio
        FROM pairs WHERE dist_full > 0.0
    """,
    doc="Johnson-Lindenstrauss projection distortion audit: project 64d "
    "embeddings to 16d with a deterministic +-1 (Rademacher) matrix "
    "scaled 1/sqrt(16) (Achlioptas 2003 — database-friendly random "
    "projections), then compare Euclidean distances on consecutive-id "
    "pairs. The per-pair ratio distribution IS the empirical JL bound "
    "— the evidence for whether 4x-cheaper projected distances are "
    "safe for coarse filtering. Projection is 16 map-side fold "
    "expressions over literal planes (no shuffle); the pair stage is "
    "an id-keyed self-join, n pairs total, never quadratic.",
)
def emb_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import plane_pattern_expr

    emb = load(spark, sf_dir, "embeddings")
    proj = F.array(
        *[
            (
                F.expr(
                    "aggregate(zip_with(embedding, "
                    + plane_pattern_expr(100 + j, _JL_SRC_DIM)
                    + ", (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)"
                )
                / F.lit(4.0)
            )
            for j in range(_JL_P)
        ]
    )
    p = _persist(
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
            proj.alias("pj"),
        )
    )
    a = p.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("pj").alias("pa"),
    )
    b = p.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("pj").alias("pb"),
    )

    def edist(x: str, y: str) -> F.Column:
        d = F.zip_with(F.col(x), F.col(y), lambda u, v: (u - v) * (u - v))
        return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, t: acc + t))

    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1).select(
        "id_a",
        "id_b",
        edist("ea", "eb").alias("dist_full"),
        edist("pa", "pb").alias("dist_proj"),
    )
    return pairs.where(F.col("dist_full") > 0.0).select(
        "id_a",
        "id_b",
        "dist_full",
        "dist_proj",
        (F.col("dist_proj") / F.col("dist_full")).alias("ratio"),
    )


_DIMVAR_TOPK = 8


@register(
    "emb_dim_variance_topk",
    oracle=f"""
        WITH ex AS (
            SELECT generate_subscripts(embedding, 1) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        m AS (
            SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_ssum('x')} AS sx,
                   {sql_ssum('x * x')} AS sxx
            FROM ex GROUP BY dim
        ),
        v AS (
            SELECT CAST(dim AS BIGINT) AS dim, n,
                   (sxx - (sx * sx) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                       AS variance
            FROM m
        )
        SELECT dim, n, variance,
               CAST(row_number() OVER (ORDER BY variance DESC, dim)
                    AS BIGINT) AS rank
        FROM v
        QUALIFY rank <= {_DIMVAR_TOPK}
    """,
    doc="Per-dimension variance ranking of the embedding space: the "
    "top-8 most-informative dimensions (population variance) — the "
    "dimension-collapse / feature-selection screen (a near-zero-"
    "variance dimension carries no signal and is free compression; "
    "emb_centroid_shift reads BETWEEN-label structure, this reads "
    "per-axis spread). One exploded (dim, value) aggregate, map-side "
    "combinable, dim rows out; moment sums go through the shared "
    "IEEE rounding (ssum — the DECIMAL cast seam bites squared "
    "terms); the rank window runs over the dim-sized relation.",
)
def emb_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim0", "xf")).select(
        (F.col("dim0") + 1).alias("dim"), F.col("xf").cast("double").alias("x")
    )
    m = ex.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        ssum(F.col("x")).alias("sx"),
        ssum(F.col("x") * F.col("x")).alias("sxx"),
    )
    v = m.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        (
            (F.col("sxx") - (F.col("sx") * F.col("sx")) / F.col("n").cast("double"))
            / F.col("n").cast("double")
        ).alias("variance"),
    )
    w = Window.orderBy(F.desc("variance"), F.asc("dim"))
    return (
        v.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _DIMVAR_TOPK)
    )


_COSH_STRIDE = 7


@register(
    "emb_cosine_pair_histogram",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        pairs AS (
            SELECT {_COS_QC} AS cosine
            FROM v q JOIN v c ON c.vec_id = q.vec_id + {_COSH_STRIDE}
        ),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM pairs),
        binned AS (
            SELECT CAST(least(floor((cosine + 1.0) * 5.0), 9) AS BIGINT)
                       AS bin
            FROM pairs
        )
        SELECT bin,
               CAST(bin AS DOUBLE) / 5.0 - 1.0 AS lo,
               CAST(bin + 1 AS DOUBLE) / 5.0 - 1.0 AS hi,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
        FROM binned CROSS JOIN t
        GROUP BY bin, t.total
    """,
    doc="Embedding-space cosine histogram over a deterministic stride-7 "
    "pair sample (id-keyed join, exactly one pair per id — never "
    "quadratic): 10 bins over [-1, 1]. The collapse/anisotropy screen "
    "(Ethayarajh 2019): a healthy space spreads mass across bins; "
    "representation collapse piles everything near 1.0, and that "
    "shift shows up here long before downstream recall degrades. "
    "Cosines are the sequential-order fold shared with every ANN "
    "operator; bin edges are exact k/5 - 1 doubles computed "
    "identically in both engines.",
)
def emb_cosine_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    q = emb.select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    pairs = q.join(c, F.col("cid") == F.col("qid") + _COSH_STRIDE).select(
        (dot("qe", "ce") / (l2_norm("qe") * l2_norm("ce"))).alias("cosine")
    )
    binned = _persist(
        pairs.select(
            F.least(F.floor((F.col("cosine") + 1.0) * 5.0), F.lit(9))
            .cast("long")
            .alias("bin")
        )
    )
    t = binned.agg(F.count("*").cast("long").alias("total"))
    return (
        binned.groupBy("bin")
        .agg(F.count("*").cast("long").alias("n"))
        .crossJoin(F.broadcast(t))
        .select(
            "bin",
            (F.col("bin").cast("double") / 5.0 - 1.0).alias("lo"),
            ((F.col("bin") + 1).cast("double") / 5.0 - 1.0).alias("hi"),
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
    )


_KNN_UND = """
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn
"""
_RA_TOPK = 3


@register(
    "graph_resource_allocation",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_capped_adjacency()},
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adjw GROUP BY node
        ),
        wedges AS (
            SELECT x.nb AS a, y.nb AS b, x.node AS center
            FROM adj x JOIN adj y ON x.node = y.node AND x.nb < y.nb
        ),
        nonadj AS (
            SELECT w.a, w.b, w.center FROM wedges w
            LEFT JOIN undw e ON w.a = e.a AND w.b = e.b
            WHERE e.a IS NULL
        ),
        ra AS (
            SELECT n.a, n.b,
                   CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                   {sql_ssum('1.0 / CAST(d.deg AS DOUBLE)')} AS ra_score
            FROM nonadj n JOIN deg d ON n.center = d.node
            GROUP BY n.a, n.b
        )
        SELECT a, b, common_neighbors, ra_score,
               CAST(row_number() OVER (
                   PARTITION BY a ORDER BY ra_score DESC, b) AS BIGINT) AS rank
        FROM ra
        QUALIFY rank <= {_RA_TOPK}
    """,
    doc="Resource-allocation link prediction over the kNN graph (Zhou, "
    "Lu & Zhang 2009): candidate pair score = sum over common "
    "neighbors of 1/degree(neighbor) — the degree-weighted upgrade of "
    "plain common-neighbor counting (graph_common_neighbors), and the "
    "log-free sibling of Adamic-Adar (1/log deg needs libm log, which "
    "is not cross-engine bit-stable; RA's exact rational weights are, "
    "and it outperforms AA in the published benchmarks). EXISTING "
    "edges are anti-joined out — this predicts missing links, not "
    "re-scores present ones. Wedge enumeration is DEGREE-CAPPED at "
    "the WEDGE_CAP strongest neighbors per center (operators/"
    "graph.capped_adjacency, mirrored in the oracle; inert at test "
    "scale), so hub in-degree cannot go quadratic at 100x; the "
    "1/degree weights keep TRUE degrees. The weight reduction goes "
    "through the shared IEEE rounding (ssum); top-3 per node via "
    "the node-partitioned rank window.",
)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import (
        capped_adjacency,
        knn_graph_shared,
        und_edges,
    )

    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    adjw = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = adjw.groupBy("node").agg(F.count("*").cast("long").alias("deg"))
    adj = _persist(capped_adjacency(g))
    x = adj.alias("x")
    y = adj.alias("y")
    wedges = x.join(
        y,
        (F.col("x.node") == F.col("y.node")) & (F.col("x.nb") < F.col("y.nb")),
    ).select(
        F.col("x.nb").alias("a"),
        F.col("y.nb").alias("b"),
        F.col("x.node").alias("center"),
    )
    nonadj = wedges.join(und, ["a", "b"], "left_anti")
    ra = (
        nonadj.join(deg, F.col("center") == F.col("node"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            ssum(F.lit(1.0) / F.col("deg").cast("double")).alias("ra_score"),
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("ra_score"), F.asc("b"))
    return (
        ra.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _RA_TOPK)
    )


@register(
    "graph_degree_histogram",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS ({_KNN_UND}),
        adj AS (
            SELECT a AS node FROM und
            UNION ALL
            SELECT b AS node FROM und
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM adj GROUP BY node
        ),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) AS DOUBLE) / CAST(t.n_nodes AS DOUBLE) AS share
        FROM deg CROSS JOIN t
        GROUP BY degree, t.n_nodes
    """,
    doc="Degree distribution of the undirected kNN graph — the hub "
    "audit behind every wedge-based operator in this repo: "
    "graph_common_neighbors / graph_resource_allocation enumerate "
    "C(degree, 2) pairs per center and the r6 verdict's BFS note was "
    "exactly about in-degree hubs, so this histogram is the evidence "
    "that degrees stay near the k=5 construction bound (out-degree is "
    "capped by k; IN-degree is not — popular vectors appear in many "
    "top-5 lists). Since r8 the wedge family IS degree-capped "
    "(operators/graph.capped_adjacency, WEDGE_CAP strongest "
    "neighbors per center) and triangles use degree-ordered "
    "orientation; this histogram remains the evidence of how much "
    "tail the cap would trim (none at test scale: max degree 13 "
    "at sf0.1). Two bounded aggregates over the edge list.",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared, und_edges

    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g)
    adj = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node"))
    )
    deg = _persist(
        adj.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    )
    t = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("long").alias("n"))
        .crossJoin(F.broadcast(t))
        .select(
            "degree",
            "n",
            (F.col("n").cast("double") / F.col("n_nodes").cast("double")).alias(
                "share"
            ),
        )
    )
