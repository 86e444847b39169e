"""Round-5 graph & linear-algebra operators: degree-oriented triangle
counting, 2-round label propagation, matrix-free PCA power iteration,
and payload SimHash for binary near-dup.

Split from queries/round5.py along domain lines (round-6 refactor);
semantics, registry keys, and oracles unchanged.
"""



from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.text import hashed_linear_score, sql_hashed_linear_score
from sql_engine_spark.registry import register
from sql_engine_spark.operators.textprep import shingles, sql_shingles, sql_tokens, tokens  # noqa: F401,E501


from sql_engine_spark.operators.graph import (  # noqa: E402
    sql_triangle_corner_counts,
)
from sql_engine_spark.operators.graph import (  # noqa: E402
    knn_graph_shared,
    sql_knn_shared,
    und_both_dirs,
    und_edges,
)


@register(
    "graph_triangle_count",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_triangle_corner_counts(
            "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn"
        )}
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM tri_corners GROUP BY node
    """,
    doc="Per-node triangle counting over the kNN similarity graph — "
    "the clustering-coefficient primitive for community detection and "
    "semantic-neighborhood density (dense triangles = tight duplicate "
    "clusters). Degree-ordered enumeration (Suri & Vassilvitskii, WWW "
    "2011 'Counting Triangles and the Curse of the Last Reducer' / "
    "Chiba-Nishizeki, operators/graph.triangle_corner_counts): edges "
    "orient low-degree -> high-degree, wedges form only at each "
    "triangle's minimum corner, closure is a semi join — per-vertex "
    "wedge volume is bounded by out-degree <= O(sqrt(m)) even at hub "
    "vertices, where an id-ordered orientation would pile a hub\'s "
    "whole neighborhood onto one corner. Reuses ann_knn_graph\'s "
    "build (shared params, operators/graph.knn_graph_shared) so the oracle\'s graph is "
    "bit-identical.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import triangle_corner_counts_shared

    # Shared materialized triangle relation (operators/graph.
    # triangle_triples_shared): scan + one aggregate, no re-enumeration.
    return triangle_corner_counts_shared(spark, sf_dir)


def _sql_lpa_iter(prev: str, cur: str) -> str:
    return f"""c_{cur} AS (
            SELECT e.src AS node, l.label, CAST(COUNT(*) AS BIGINT) AS n
            FROM lpa_edges e JOIN {prev} l ON l.node = e.dst
            GROUP BY 1, 2
        ),
        {cur} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (
                           PARTITION BY node ORDER BY n DESC, label) AS rk
                FROM c_{cur}
            ) WHERE rk = 1
        )"""


@register(
    "graph_label_propagation",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        lpa_edges AS (
            SELECT a AS src, b AS dst FROM und
            UNION ALL
            SELECT b AS src, a AS dst FROM und
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM lpa_edges),
        {_sql_lpa_iter('l0', 'l1')},
        {_sql_lpa_iter('l1', 'l2')}
        SELECT node, label FROM l2
    """,
    doc="Synchronous label propagation (Raghavan et al. 2007) over the "
    "kNN similarity graph, FIXED 2 iterations with a deterministic "
    "update (most frequent neighbor label, ties to the smallest) so "
    "the oracle unrolls the identical rounds — the community-detection "
    "sibling of connected components for semantic cluster discovery, "
    "converging on modularity structure instead of mere connectivity. "
    "Per round: one edge-sized join + one (node, label) count "
    "aggregate + a per-node argmax window (node cardinality = corpus, "
    "bounded candidate lists — the knn_graph window argument). At "
    "depth, add the localCheckpoint discipline (pagerank_fixed's "
    "checkpoint_every).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g)
    edges = _persist(
        und_both_dirs(und)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(2):
        counts = (
            edges.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").cast("long").alias("n"))
        )
        labels = (
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels


_PCA_ITERS = 3
_PCA_DIM = 64


def _sql_pca_iter(prev_v: str, tag: str) -> str:
    """One power-iteration round: s = X^T (X v) with decimal-exact
    per-dimension sums, then L2-normalize in dimension order."""
    return f"""pca_xv_{tag} AS (
            SELECT e,
                   list_reduce(list_transform(list_zip(e, (SELECT l FROM {prev_v})),
                                              p -> p[1] * p[2]),
                               (a, b) -> a + b) AS xv
            FROM pca_vecs
        ),
        pca_s_{tag} AS (
            SELECT dim, CAST(SUM(CAST(x * xv AS DECIMAL(27,6))) AS DOUBLE) AS s
            FROM (
                SELECT unnest(e) AS x, generate_subscripts(e, 1) AS dim, xv
                FROM pca_xv_{tag}
            ) GROUP BY dim
        ),
        pca_raw_{tag} AS (
            SELECT list_transform(list_sort(list(struct_pack(dim := dim, s := s))),
                                  t -> t.s) AS raw
            FROM pca_s_{tag}
        ),
        pca_n_{tag} AS (
            SELECT raw,
                   sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                            list_transform(raw, y -> y * y)), (a, b) -> a + b))
                       AS nrm
            FROM pca_raw_{tag}
        ),
        pca_v_{tag} AS (
            SELECT list_transform(raw, x -> x / nrm) AS l FROM pca_n_{tag}
        )"""


def _pca_oracle() -> str:
    iters = ",\n        ".join(
        _sql_pca_iter("pca_v0" if i == 1 else f"pca_v_i{i - 1}", f"i{i}")
        for i in range(1, _PCA_ITERS + 1)
    )
    last = f"i{_PCA_ITERS}"
    return f"""
        WITH pca_vecs AS MATERIALIZED (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        pca_v0 AS (
            SELECT list_transform(range(1, {_PCA_DIM + 1}),
                                  i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
                                            ELSE CAST(0.0 AS DOUBLE) END) AS l
        ),
        {iters},
        pca_count AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pca_vecs)
        SELECT CAST(dim AS BIGINT) AS dim,
               l[dim] AS component,
               (SELECT nrm FROM pca_n_{last}) / n AS eigenvalue_est
        FROM pca_v_{last}
        CROSS JOIN pca_count
        CROSS JOIN (SELECT unnest(range(1, {_PCA_DIM + 1})) AS dim)
    """


@register(
    "ann_pca_power_iteration",
    oracle=_pca_oracle(),
    doc="Top principal direction of the embedding corpus by MATRIX-FREE "
    "power iteration (3 rounds of v <- normalize(X^T (X v)) from the "
    "e_1 start): the PCA/whitening primitive embedding pipelines run "
    "before semantic clustering (SemDeDup-style) without ever "
    "materializing the 64x64 covariance — each round is ONE "
    "distributed pass (per-row dot with the LITERAL v, per-dim "
    "DECIMAL-exact sums, 64 rows back to the driver: model-sized, the "
    "k-means-literal discipline from operators/similarity.py). "
    "Python-side normalization folds in dimension order with the same "
    "IEEE doubles the oracle's list_reduce produces, so the component "
    "is bit-identical cross-engine. Output: (dim, component, "
    "eigenvalue_est = |X^T X v| / n).",
)
def ann_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.pca import pca_power_component

    emb = _persist(load(spark, sf_dir, "embeddings").select("embedding"))
    v, eig = pca_power_component(
        emb, vec_col="embedding", dim=_PCA_DIM, iterations=_PCA_ITERS
    )
    rows = [(d + 1, v[d], eig) for d in range(_PCA_DIM)]
    return spark.createDataFrame(
        rows, "dim long, component double, eigenvalue_est double"
    )


_PAY_BLOCK = 16  # base64 chars per digest block


def _sql_payload_digs() -> str:
    """Base64-chunk digests of the binary payload (DuckDB spelling).
    Spark's base64 MIME-wraps with \\r\\n every 76 chars; the Spark side
    strips them so both engines chunk the identical unwrapped string."""
    b64 = "to_base64(CAST(text AS BLOB))"
    return (
        f"list_transform(range(1, CAST(ceil(length({b64}) / {_PAY_BLOCK}.0) "
        f"AS BIGINT) + 1), i -> md5(substring({b64}, "
        f"CAST((i - 1) * {_PAY_BLOCK} + 1 AS BIGINT), {_PAY_BLOCK})))"
    )


@register(
    "multimodal_payload_simhash",
    oracle=f"""
        WITH sigs AS MATERIALIZED (
            SELECT doc_id AS id,
                   {{sig}} AS sig
            FROM documents
        ),
        blocks AS (
            SELECT id, b, substring(sig, b * 16 + 1, 16) AS key
            FROM sigs CROSS JOIN range(0, 4) t(b)
        ),
        candidates AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM blocks a JOIN blocks b
              ON a.b = b.b AND a.key = b.key AND a.id < b.id
        )
        SELECT id_a, id_b,
               CAST({{ham}} AS BIGINT) AS hamming
        FROM candidates
        JOIN sigs sa ON id_a = sa.id
        JOIN sigs sb ON id_b = sb.id
        WHERE {{ham}} <= 2
    """.format(
        sig="concat((CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 2, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 3, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 4, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 5, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 6, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 7, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 8, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 9, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 10, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 11, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 12, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 13, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 14, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 15, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 16, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 17, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 18, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 19, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 20, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 21, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 22, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 23, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 24, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 25, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 26, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 27, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 28, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 29, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 30, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 31, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 32, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 1, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 2, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 3, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 4, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 5, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 6, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 7, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 8, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 9, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 10, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 11, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 12, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 13, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 14, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 15, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 16, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 17, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 18, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 19, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 20, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 21, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 22, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 23, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 24, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 25, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 26, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 27, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 28, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 29, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 30, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 31, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 32, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END))",
        ham="((CASE WHEN substring(sa.sig, 1, 1) <> substring(sb.sig, 1, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 2, 1) <> substring(sb.sig, 2, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 3, 1) <> substring(sb.sig, 3, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 4, 1) <> substring(sb.sig, 4, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 5, 1) <> substring(sb.sig, 5, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 6, 1) <> substring(sb.sig, 6, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 7, 1) <> substring(sb.sig, 7, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 8, 1) <> substring(sb.sig, 8, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 9, 1) <> substring(sb.sig, 9, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 10, 1) <> substring(sb.sig, 10, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 11, 1) <> substring(sb.sig, 11, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 12, 1) <> substring(sb.sig, 12, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 13, 1) <> substring(sb.sig, 13, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 14, 1) <> substring(sb.sig, 14, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 15, 1) <> substring(sb.sig, 15, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 16, 1) <> substring(sb.sig, 16, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 17, 1) <> substring(sb.sig, 17, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 18, 1) <> substring(sb.sig, 18, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 19, 1) <> substring(sb.sig, 19, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 20, 1) <> substring(sb.sig, 20, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 21, 1) <> substring(sb.sig, 21, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 22, 1) <> substring(sb.sig, 22, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 23, 1) <> substring(sb.sig, 23, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 24, 1) <> substring(sb.sig, 24, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 25, 1) <> substring(sb.sig, 25, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 26, 1) <> substring(sb.sig, 26, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 27, 1) <> substring(sb.sig, 27, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 28, 1) <> substring(sb.sig, 28, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 29, 1) <> substring(sb.sig, 29, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 30, 1) <> substring(sb.sig, 30, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 31, 1) <> substring(sb.sig, 31, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 32, 1) <> substring(sb.sig, 32, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 33, 1) <> substring(sb.sig, 33, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 34, 1) <> substring(sb.sig, 34, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 35, 1) <> substring(sb.sig, 35, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 36, 1) <> substring(sb.sig, 36, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 37, 1) <> substring(sb.sig, 37, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 38, 1) <> substring(sb.sig, 38, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 39, 1) <> substring(sb.sig, 39, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 40, 1) <> substring(sb.sig, 40, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 41, 1) <> substring(sb.sig, 41, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 42, 1) <> substring(sb.sig, 42, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 43, 1) <> substring(sb.sig, 43, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 44, 1) <> substring(sb.sig, 44, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 45, 1) <> substring(sb.sig, 45, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 46, 1) <> substring(sb.sig, 46, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 47, 1) <> substring(sb.sig, 47, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 48, 1) <> substring(sb.sig, 48, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 49, 1) <> substring(sb.sig, 49, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 50, 1) <> substring(sb.sig, 50, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 51, 1) <> substring(sb.sig, 51, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 52, 1) <> substring(sb.sig, 52, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 53, 1) <> substring(sb.sig, 53, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 54, 1) <> substring(sb.sig, 54, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 55, 1) <> substring(sb.sig, 55, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 56, 1) <> substring(sb.sig, 56, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 57, 1) <> substring(sb.sig, 57, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 58, 1) <> substring(sb.sig, 58, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 59, 1) <> substring(sb.sig, 59, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 60, 1) <> substring(sb.sig, 60, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 61, 1) <> substring(sb.sig, 61, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 62, 1) <> substring(sb.sig, 62, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 63, 1) <> substring(sb.sig, 63, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 64, 1) <> substring(sb.sig, 64, 1) THEN 1 ELSE 0 END))",
    ),
    doc="Near-duplicate BINARY payloads by SimHash over fixed-width "
    "base64 chunks — the perceptual-hash posture for opaque media "
    "blobs (catches payloads differing in a localized byte region, "
    "where exact digest dedup sees two distinct files): chunk the "
    "payload's base64 into 16-char blocks, md5 each, 64-bit simhash "
    "over chunk digests, Manku pigeonhole block pairing (d <= 2), "
    "unrolled Hamming verify. Reuses the text pipeline's entire "
    "simhash machinery via simhash_hamming_pairs_from_digests "
    "(operators/dedup.py); one map pass + 4 bounded-key equi-joins. "
    "Spark's MIME base64 wrapping is stripped so both engines chunk "
    "the identical string.",
)
def multimodal_payload_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import (
        simhash_hamming_pairs_from_digests,
    )
    from sql_engine_spark.operators.multimodal import with_binary_payload

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    # Narrow-file widening (the simhash_hamming_pairs text path's rule,
    # r12: it was missing on this digest path): the per-chunk md5 map is
    # the dominant cost and a single small parquet file otherwise runs
    # it in ONE task — measured 4 concurrent single-task ~3.9s jobs
    # (broadcast threads racing the unmaterialized persist) at sf0.1.
    target = spark.sparkContext.defaultParallelism
    files = docs.inputFiles()
    if 0 < len(files) < target:
        docs = docs.repartition(target)
    # Materialize the unwrapped base64 into a column BEFORE the chunk
    # transform: HOF lambdas run interpreted with no common-subexpression
    # elimination, so an inlined `b64` re-ran base64+regexp_replace over
    # the WHOLE payload once per chunk index — O(len^2 / block) per row
    # (r12 optimization; results unchanged, the chunks are the same).
    b64col = docs.select(
        F.col("doc_id").alias("__id"),
        F.expr("regexp_replace(base64(payload), '[\\r\\n]', '')").alias("__b64"),
    )
    digs = b64col.select(
        "__id",
        F.expr(
            f"transform(sequence(1, CAST(ceil(length(__b64) / {_PAY_BLOCK}.0) "
            f"AS INT)), i -> md5(substring(__b64, ({_PAY_BLOCK} * (i - 1)) + 1, "
            f"{_PAY_BLOCK})))"
        ).alias("__digs"),
    )
    return simhash_hamming_pairs_from_digests(
        digs, bits=64, n_blocks=4, max_hamming=2
    )
