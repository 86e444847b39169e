"""Round-9 vectors/clusters/engine set: IVF cell-balance audit,
near-dup cluster purity, kNN component-size histogram, per-source
shingle Simpson diversity, and the Spark 4 `SELECT * EXCEPT` clause.

House disciplines: shared builds scanned (kNN graph, shingle digests,
MinHash pair pipeline), integer-exact counts with one final division,
derived-seed quantizer mirrored argmax-for-argmax in the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist, connected_components_fixed
from sql_engine_spark.operators.graph import knn_graph_shared, sql_knn_shared, und_edges
from sql_engine_spark.registry import _REGISTRY, register

# ---------------------------------------------------------------------------
# IVF cell-balance audit
# ---------------------------------------------------------------------------

_BAL_K = 4


def _sql_balance() -> str:
    from sql_engine_spark.queries.similarity import _dot

    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id, e, n, list_transform(e, x -> x / n) AS nv
            FROM (SELECT vec_id, e,
                         sqrt(list_reduce(list_transform(e, x -> x * x),
                                          (a, b) -> a + b)) AS n
                  FROM v)
        ),
        c0 AS (
            SELECT c.vec_id AS cent_id, c.nv AS ce FROM nrm c
            WHERE c.vec_id >= 10
            ORDER BY c.vec_id LIMIT {_BAL_K}
        ),
        a AS (
            SELECT vec_id, cent_id FROM (
                SELECT c.vec_id, t.cent_id,
                       row_number() OVER (PARTITION BY c.vec_id
                           ORDER BY {_dot('c.e', 't.ce')} DESC, t.cent_id) AS rn
                FROM nrm c CROSS JOIN c0 t
                WHERE c.vec_id >= 10
            ) WHERE rn = 1
        ),
        g AS (
            SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
            FROM a GROUP BY cent_id
        ),
        tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n FROM g)
        SELECT cent_id, n_vectors,
               CAST(n_vectors AS DOUBLE) / CAST(n AS DOUBLE) AS share,
               CAST(n_vectors AS DOUBLE) / CAST(n AS DOUBLE)
                   * CAST({_BAL_K} AS DOUBLE) AS load_factor
        FROM g CROSS JOIN tot
    """


@register(
    "ann_ivf_balance_audit",
    oracle=_sql_balance(),
    doc=f"IVF cell-balance audit (k={_BAL_K} seed centroids — the "
    "deterministic smallest-id normalized corpus vectors, the "
    "ann_ivf_kmeans_topk seeding convention): assign EVERY corpus "
    "vector to its argmax-cosine cell (map-side literal-centroid "
    "expression, ties to the smaller centroid id — mirrored "
    "argmax-for-argmax in the oracle) and report per-cell counts, "
    "shares, and the load factor share*k (1.0 = perfectly balanced). "
    "THE capacity-planning audit for IVF at scale: a load factor of "
    "3 means one probe touches 3x the expected candidates, and the "
    "nprobe recall/cost model (ann_ivf_nprobe_sweep) silently "
    "degrades — this is the number that says whether to re-train or "
    "re-seed. One corpus pass, integer counts, one division.",
)
def ann_ivf_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import _assign_cell

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    seeds = (
        corpus.select("vec_id", "embedding").orderBy("vec_id").limit(_BAL_K).collect()
    )
    cents = []
    for r in seeds:
        e = [float(x) for x in r.embedding]
        acc = 0.0
        for x in e:
            acc += x * x
        n = math.sqrt(acc)
        cents.append((int(r.vec_id), [x / n for x in e]))
    g = (
        corpus.select(
            "vec_id", _assign_cell("embedding", cents).alias("cent_id")
        )
        .groupBy("cent_id")
        .agg(F.count("*").cast("long").alias("n_vectors"))
    )
    tot = g.agg(F.sum("n_vectors").cast("long").alias("n"))
    share = F.col("n_vectors").cast("double") / F.col("n").cast("double")
    return g.crossJoin(F.broadcast(tot)).select(
        "cent_id",
        "n_vectors",
        share.alias("share"),
        (share * F.lit(float(_BAL_K))).alias("load_factor"),
    )


# ---------------------------------------------------------------------------
# Near-dup cluster purity vs exact-dup truth
# ---------------------------------------------------------------------------


@register(
    "curation_cluster_purity",
    oracle=None,  # composed below from the CC oracle
    doc="Purity / inverse purity / their harmonic F of the MinHash-LSH "
    "connected-component clustering against the EXACT-duplicate truth "
    "grouping (md5(text), representative = min doc_id): purity = "
    "(sum over clusters of the majority truth-group count) / n, "
    "inverse purity the transpose, F their harmonic mean (the "
    "classic extrinsic cluster evaluation, Zhao & Karypis 2004 — "
    "homogeneity without log-based V-measure, per the libm-free "
    "house rule). Singleton docs are their own cluster AND their own "
    "truth group via the coalesce spine, so the metric covers the "
    "whole corpus. Integer majority counts, two divisions — the "
    "quality gate on dedup_connected_components' clusters before a "
    "keep-best pass trusts them.",
)
def curation_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.dedup import dedup_connected_components

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("__key")
    )
    # truth group id: min doc_id per content key
    tg = docs.groupBy("__key").agg(F.min("doc_id").alias("tg"))
    truth = docs.join(tg, "__key").select("doc_id", "tg")
    cc = dedup_connected_components(spark, sf_dir)
    lab = _persist(
        truth.join(cc, "doc_id", "left").select(
            "doc_id",
            "tg",
            F.coalesce("cluster_id", "doc_id").alias("cl"),
        )
    )
    cell = lab.groupBy("cl", "tg").agg(F.count("*").cast("long").alias("c"))
    cell = _persist(cell)
    # One row per document by construction — the cached footer count,
    # not a per-build Spark job (review finding; r8 verdict #3).
    from sql_engine_spark.io import table_row_count

    n = table_row_count(sf_dir, "documents")
    pur = (
        cell.groupBy("cl")
        .agg(F.max("c").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("s_p"))
    )
    inv = (
        cell.groupBy("tg")
        .agg(F.max("c").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("s_i"))
    )
    dims = cell.agg(
        F.countDistinct("cl").cast("long").alias("n_clusters"),
        F.countDistinct("tg").cast("long").alias("n_truth_groups"),
    )
    j = dims.crossJoin(F.broadcast(pur)).crossJoin(F.broadcast(inv))
    p = F.col("s_p").cast("double") / F.lit(float(n))
    ip = F.col("s_i").cast("double") / F.lit(float(n))
    return j.select(
        F.lit(n).cast("long").alias("n_docs"),
        "n_clusters",
        "n_truth_groups",
        p.alias("purity"),
        ip.alias("inverse_purity"),
        (F.lit(2.0) * p * ip / (p + ip)).alias("f_purity"),
    )


def _fix_purity_oracle() -> None:
    cc = _REGISTRY["dedup_connected_components"].oracle

    def render(sf_dir: str) -> str:
        from sql_engine_spark.io import table_row_count

        n = table_row_count(sf_dir, "documents")
        return f"""
        WITH cc AS ({cc}),
        docs AS (SELECT doc_id, md5(text) AS key FROM documents),
        tg AS (
            SELECT key, CAST(MIN(doc_id) AS BIGINT) AS tg
            FROM docs GROUP BY key
        ),
        lab AS (
            SELECT d.doc_id, t.tg,
                   COALESCE(c.cluster_id, d.doc_id) AS cl
            FROM docs d
            JOIN tg t USING (key)
            LEFT JOIN cc c ON c.doc_id = d.doc_id
        ),
        cell AS (
            SELECT cl, tg, CAST(COUNT(*) AS BIGINT) AS c
            FROM lab GROUP BY cl, tg
        ),
        pur AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS s_p FROM (
                SELECT cl, MAX(c) AS mx FROM cell GROUP BY cl
            )
        ),
        inv AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS s_i FROM (
                SELECT tg, MAX(c) AS mx FROM cell GROUP BY tg
            )
        ),
        dims AS (
            SELECT CAST(COUNT(DISTINCT cl) AS BIGINT) AS n_clusters,
                   CAST(COUNT(DISTINCT tg) AS BIGINT) AS n_truth_groups
            FROM cell
        )
        SELECT CAST({n} AS BIGINT) AS n_docs,
               dims.n_clusters, dims.n_truth_groups,
               CAST(s_p AS DOUBLE) / CAST({n}.0 AS DOUBLE) AS purity,
               CAST(s_i AS DOUBLE) / CAST({n}.0 AS DOUBLE) AS inverse_purity,
               2.0 * (CAST(s_p AS DOUBLE) / CAST({n}.0 AS DOUBLE))
                   * (CAST(s_i AS DOUBLE) / CAST({n}.0 AS DOUBLE))
                   / (CAST(s_p AS DOUBLE) / CAST({n}.0 AS DOUBLE)
                      + CAST(s_i AS DOUBLE) / CAST({n}.0 AS DOUBLE))
                   AS f_purity
        FROM dims CROSS JOIN pur CROSS JOIN inv
        """

    _REGISTRY["curation_cluster_purity"].oracle = render


_fix_purity_oracle()


# ---------------------------------------------------------------------------
# kNN component-size histogram
# ---------------------------------------------------------------------------


@register(
    "graph_component_size_histogram",
    oracle=None,  # composed below (needs the shared kNN CTE + CC rounds)
    doc="Connected-component size histogram of the shared kNN graph "
    "(3 rounds of min-label propagation — the dedup_connected_"
    "components loop over the similarity edges; fixed rounds keep it "
    "oracle-hashable, and isolated vectors join via the embeddings "
    "spine as singletons): (component_size, n_components, n_nodes). "
    "The macro-structure read next to graph_degree_histogram's "
    "micro view — a giant component emerging in an embedding kNN "
    "graph is the global signature of near-duplicate mass "
    "(percolation), and the histogram is what capacity-plans "
    "per-component work. Edge-sized joins per round; the histogram "
    "runs on the bounded label relation.",
)
def graph_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    cc = connected_components_fixed(und, "a", "b", iterations=3)
    spine = load(spark, sf_dir, "embeddings").select("vec_id")
    lab = spine.join(
        cc.withColumnRenamed("node", "vec_id"), "vec_id", "left"
    ).select("vec_id", F.coalesce("label", "vec_id").alias("comp"))
    sizes = lab.groupBy("comp").agg(F.count("*").cast("long").alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("component_size"))
        .agg(F.count("*").cast("long").alias("n_components"))
        .select(
            "component_size",
            "n_components",
            (F.col("component_size") * F.col("n_components"))
            .cast("long")
            .alias("n_nodes"),
        )
    )


def _fix_component_oracle() -> None:
    from sql_engine_spark.queries.dedup import _sql_cc_iter

    _REGISTRY["graph_component_size_histogram"].oracle = f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        cc_edges AS (
            SELECT a AS src, b AS dst FROM und
            UNION ALL
            SELECT b AS src, a AS dst FROM und
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM cc_edges),
        {_sql_cc_iter('l0', 'l1')},
        {_sql_cc_iter('l1', 'l2')},
        {_sql_cc_iter('l2', 'l3')},
        lab AS (
            SELECT e.vec_id, COALESCE(l.label, e.vec_id) AS comp
            FROM embeddings e LEFT JOIN l3 l ON l.node = e.vec_id
        ),
        sizes AS (
            SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz FROM lab GROUP BY comp
        )
        SELECT sz AS component_size,
               CAST(COUNT(*) AS BIGINT) AS n_components,
               CAST(sz * COUNT(*) AS BIGINT) AS n_nodes
        FROM sizes GROUP BY sz
    """


_fix_component_oracle()


# ---------------------------------------------------------------------------
# Per-source shingle Simpson diversity
# ---------------------------------------------------------------------------


@register(
    "text_shingle_simpson_by_source",
    oracle=None,  # composed below
    doc="Simpson diversity of the 3-gram shingle distribution per "
    "source, off the SHARED hashed-shingle relation (operators/dedup."
    "shingle_hs_shared — one scan, no re-tokenization): lambda = "
    "sum_s (n_s/N)^2 (the repeat-probability; 1/lambda is the "
    "effective shingle count), entirely rational — the log-free "
    "content-diversity reading (Shannon would need ln, banned by the "
    "house rule; Simpson is the standard substitute, as in "
    "agg_simpson_diversity). A source whose effective shingle count "
    "collapses is template/boilerplate mass — the same signal "
    "text_repetition reads per document, here per SOURCE for mixture "
    "planning. Integer counts; the square-share fold crosses engines "
    "via exact integer sums.",
)
def text_shingle_simpson_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import shingle_hs_shared

    hs = shingle_hs_shared(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("__id"), "source"
    )
    dv = hs.select("__id", F.explode("__hs").alias("dig")).join(src, "__id")
    per = dv.groupBy("source", "dig").agg(
        F.count("*").cast("long").alias("n_s")
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_distinct_shingles"),
        F.sum("n_s").cast("long").alias("n_total"),
        F.sum(F.col("n_s") * F.col("n_s")).cast("long").alias("s2"),
    )
    lam = F.col("s2").cast("double") / (
        F.col("n_total").cast("double") * F.col("n_total").cast("double")
    )
    return agg.select(
        "source",
        "n_distinct_shingles",
        "n_total",
        lam.alias("simpson_lambda"),
        (F.lit(1.0) / lam).alias("effective_shingles"),
    )


def _fix_simpson_oracle() -> None:
    from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens

    toks = sql_tokens("text")
    _REGISTRY["text_shingle_simpson_by_source"].oracle = f"""
        WITH docs AS (
            SELECT doc_id, source, {sql_shingles(toks, 3)} AS sh FROM documents
        ),
        dv AS (
            SELECT source, md5(s) AS dig
            FROM (
                SELECT doc_id, source, unnest(list_distinct(sh)) AS s
                FROM docs
            )
        ),
        per AS (
            SELECT source, dig, CAST(COUNT(*) AS BIGINT) AS n_s
            FROM dv GROUP BY source, dig
        ),
        agg AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
                   CAST(SUM(n_s) AS BIGINT) AS n_total,
                   CAST(SUM(n_s * n_s) AS BIGINT) AS s2
            FROM per GROUP BY source
        )
        SELECT source, n_distinct_shingles, n_total,
               CAST(s2 AS DOUBLE)
                   / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE))
                   AS simpson_lambda,
               1.0 / (CAST(s2 AS DOUBLE)
                   / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)))
                   AS effective_shingles
        FROM agg
    """


_fix_simpson_oracle()


# ---------------------------------------------------------------------------
# SELECT * EXCEPT (engine surface)
# ---------------------------------------------------------------------------

_SSE_SPARK = """
    SELECT * EXCEPT (text) FROM {documents} WHERE n_chars % 7 = 0
"""


@register(
    "select_star_except",
    oracle="SELECT * EXCLUDE (text) FROM documents WHERE n_chars % 7 = 0",
    doc="Star expansion with column exclusion — Spark 4's `SELECT * "
    "EXCEPT (cols)` run as the GENUINE clause (the resolver expansion "
    "is the feature under test, not a hand-written projection), "
    "exact-matched against DuckDB's equivalent `* EXCLUDE`. The "
    "everyday lakehouse idiom for 'everything but the wide payload "
    "column' — exactly the projection a 100 TB scan wants, since the "
    "excluded column never leaves the parquet reader (column "
    "pruning). The reference expands `*` only in full "
    "(planner/mod.rs:362-423).",
)
def select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "documents").createOrReplaceTempView("__sse_documents")
    return spark.sql(_SSE_SPARK.format(documents="__sse_documents"))
