"""Round-6 vector & graph operators: ANN recall auditing, per-label
centroid drift, 2-round k-core peeling, and common-neighbor similarity
over the kNN graph.

Scale posture: every graph stage is an edge-sized equi-join or a
bounded per-node aggregate over the BOUNDED-DEGREE kNN graph (out-degree
k by construction); vector statistics are one exploded (dim, value)
aggregate with DECIMAL-exact reductions. The reference engine has no
vector or graph surface at all (SURVEY.md §2); these extend the
LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.graph import (
    capped_adjacency,
    knn_graph_shared,
    sql_capped_adjacency,
    und_edges,
)
from sql_engine_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from sql_engine_spark.operators.graph import sql_knn_shared
from sql_engine_spark.queries.similarity import DIM, _BRUTE_ORACLE, _lsh_oracle
from sql_engine_spark.registry import register

_DEC = "DECIMAL(27,6)"


@register(
    "ann_lsh_recall_report",
    oracle=f"""
        WITH brute AS ({_BRUTE_ORACLE}),
        lsh AS ({_lsh_oracle(4)}),
        hits AS (
            SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM brute b JOIN lsh l
              ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
            GROUP BY b.query_id
        ),
        qs AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM brute GROUP BY query_id
        )
        SELECT qs.query_id, qs.n_true,
               COALESCE(n_hits, 0) AS n_hits,
               CAST(COALESCE(n_hits, 0) AS DOUBLE)
                   / CAST(qs.n_true AS DOUBLE) AS recall
        FROM qs LEFT JOIN hits USING (query_id)
    """,
    doc="ANN recall audit: per query, how many of the exact cosine "
    "top-5 the LSH index returned — recall@5, THE metric every ANN "
    "deployment tracks before trusting an index (FAISS/ScaNN benchmark "
    "methodology). Composes the existing brute-force baseline and the "
    "LSH path and joins their results on (query, neighbor); queries "
    "with an empty LSH bucket surface as recall 0, not missing rows. "
    "The denominator is the PER-QUERY brute-force result count, not a "
    "fixed k: a query with fewer than k true neighbors (tiny corpus or "
    "bucket) still reports recall 1.0 when the index returned every "
    "one. The brute side is the documented exact baseline (broadcast "
    "queries x one corpus scan); the report adds only id-sized joins.",
)
def ann_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    brute = brute_force_topk(q, c, id_col="vec_id", vec_col="embedding", k=5)
    lsh = lsh_topk(
        q, c, id_col="vec_id", vec_col="embedding", k=5, planes=4, dim=DIM
    )
    hits = (
        brute.select("query_id", "neighbor_id")
        .join(lsh.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    qs = brute.groupBy("query_id").agg(F.count("*").cast("long").alias("n_true"))
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        "n_true",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        (
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_true").cast("double")
        ).alias("recall"),
    )


@register(
    "emb_centroid_shift",
    oracle=f"""
        WITH ex AS (
            SELECT label, i AS dim, CAST(v AS DOUBLE) AS x
            FROM (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ),
        lbl AS (
            SELECT label, dim, {sql_dsum('x')} / COUNT(*) AS mu_l,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ex GROUP BY label, dim
        ),
        gmu AS (
            SELECT dim, {sql_dsum('x')} / COUNT(*) AS mu_g
            FROM ex GROUP BY dim
        )
        SELECT label, MIN(n) AS n_vecs,
               sqrt({sql_dsum('(mu_l - mu_g) * (mu_l - mu_g)')}) AS centroid_shift
        FROM lbl JOIN gmu USING (dim)
        GROUP BY label
    """,
    doc="Per-label centroid drift: L2 distance between each label's "
    "embedding centroid and the corpus centroid — the cluster-"
    "separation / training-mix drift monitor (a label whose centroid "
    "sits on the global mean carries no signal; one drifting away over "
    "snapshots marks distribution shift). One exploded (label, dim) "
    "aggregate — map-side combinable, labels x dim rows out — then a "
    "dim-sized join; every mean goes through DECIMAL(27,6) and the "
    "final sqrt is IEEE-stable. No per-row vector collects, no "
    "quadratic stage.",
)
def emb_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ex = _persist(
        emb.select(
            "label", F.posexplode("embedding").alias("dim0", "v")
        ).select(
            "label",
            (F.col("dim0") + 1).alias("dim"),
            F.col("v").cast("double").alias("x"),
        )
    )
    lbl = ex.groupBy("label", "dim").agg(
        (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count("*")).alias("mu_l"),
        F.count("*").cast("long").alias("n"),
    )
    glob = ex.groupBy(F.col("dim").alias("__d")).agg(
        (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count("*")).alias("mu_g")
    )
    d = F.col("mu_l") - F.col("mu_g")
    return (
        lbl.join(F.broadcast(glob), F.col("dim") == F.col("__d"))
        .groupBy("label")
        .agg(
            F.min("n").alias("n_vecs"),
            F.sqrt(F.sum((d * d).cast(_DEC)).cast("double")).alias(
                "centroid_shift"
            ),
        )
    )


_KCORE_K = 6
_KNN_UND = (
    "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn"
)


@register(
    "graph_kcore_peel2",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS ({_KNN_UND}),
        deg1 AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
            ) GROUP BY node
        ),
        alive1 AS (SELECT node FROM deg1 WHERE deg >= {_KCORE_K}),
        e2 AS (
            SELECT a, b FROM und
            WHERE a IN (SELECT node FROM alive1)
              AND b IN (SELECT node FROM alive1)
        ),
        deg2 AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT a AS node FROM e2 UNION ALL SELECT b AS node FROM e2
            ) GROUP BY node
        )
        SELECT node, deg AS degree_after_peel2
        FROM deg2 WHERE deg >= {_KCORE_K}
    """,
    doc=f"Two peeling rounds toward the {_KCORE_K}-core of the kNN "
    "similarity graph — the dense-cluster extractor (k-core "
    "decomposition finds the tightly-connected duplicate/topic "
    "communities; Matula-Beck peeling, here unrolled to 2 synchronous "
    "rounds like the repo's label propagation). Each round is one "
    "mirrored-edge degree count (map-side combinable) plus two "
    "left-semi joins to drop edges touching peeled nodes — edge-sized "
    "work, no per-node adjacency materialization. Fixed round count "
    "keeps the oracle static; full convergence is the same loop run "
    "to fixpoint.",
)
def graph_kcore_peel2(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("a").alias("node"))
            .unionAll(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("deg"))
        )

    alive1 = degrees(und).where(F.col("deg") >= _KCORE_K).select("node")
    e2 = _persist(
        und.join(alive1, und.a == alive1.node, "left_semi").join(
            alive1, und.b == alive1.node, "left_semi"
        )
    )
    return (
        degrees(e2)
        .where(F.col("deg") >= _KCORE_K)
        .select("node", F.col("deg").alias("degree_after_peel2"))
    )


_CN_TOPK = 3


@register(
    "graph_common_neighbors",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_capped_adjacency()},
        wedges AS (
            SELECT x.nb AS a, y.nb AS b
            FROM adj x JOIN adj y ON x.node = y.node AND x.nb < y.nb
        ),
        cn AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
            FROM wedges GROUP BY a, b
        ),
        ranked AS (
            SELECT a, b, common_neighbors,
                   CAST(row_number() OVER (
                       PARTITION BY a
                       ORDER BY common_neighbors DESC, b) AS BIGINT) AS rank
            FROM cn WHERE common_neighbors >= 2
        )
        SELECT a, b, common_neighbors, rank
        FROM ranked WHERE rank <= {_CN_TOPK}
    """,
    doc="Common-neighbor similarity over the kNN graph: for each node, "
    "its top-3 partners by shared-neighbor count (>= 2) — the "
    "link-prediction / 'related documents' primitive (Liben-Nowell & "
    "Kleinberg 2003). Wedge enumeration is DEGREE-CAPPED (r7 verdict "
    "#1): centers enumerate pairs only over their WEDGE_CAP strongest "
    "neighbors (operators/graph.capped_adjacency — cosine DESC, id "
    "ASC, mirrored exactly in the oracle), so per-center volume is "
    "bounded by C(cap, 2) even when in-degree hubs form (out-degree "
    "is k=5 by construction, in-degree is NOT bounded — a popular "
    "vector lands in many top-5 lists). The cap is inert at test "
    "scale (max degree 13 at sf0.1 < cap 32); on hubby graphs it "
    "trades recall of weakest-edge wedges for the bound. The rank "
    "window partitions on node a (corpus-cardinality key, bounded "
    "candidate lists).",
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    adj = _persist(capped_adjacency(g))
    x = adj.alias("x")
    y = adj.alias("y")
    wedges = x.join(
        y,
        (F.col("x.node") == F.col("y.node")) & (F.col("x.nb") < F.col("y.nb")),
    ).select(F.col("x.nb").alias("a"), F.col("y.nb").alias("b"))
    cn = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("common_neighbors")
    )
    w = Window.partitionBy("a").orderBy(F.desc("common_neighbors"), F.asc("b"))
    return (
        cn.where(F.col("common_neighbors") >= 2)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _CN_TOPK)
        .select("a", "b", "common_neighbors", "rank")
    )
