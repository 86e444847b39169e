"""Round-8 graph set 2: structural diagnostics over the SHARED kNN
similarity graph (operators/graph.knn_graph_shared — one materialized
build per process, SURVEY 7.6) — hubness audit, global transitivity,
rich-club coefficient, k-truss edge support — plus the Davies-Bouldin
cluster-validity index over the embeddings table.

All integer-exact where the quantity is a count ratio (transitivity,
rich-club, truss support, in-degree moments) and DECIMAL-exact (dsum)
where corpus-sized double sums cross engines; sqrt only, no libm
transcendentals. The graph members exist because ANN graphs at 100 TB
fail in exactly these ways: hub in-degrees blow up wedge work (the
hubness audit is the capacity-planning input for WEDGE_CAP), and
truss/transitivity shifts are the cheap monitors of a drifting
embedding space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.graph import (
    knn_graph_shared,
    sql_knn_shared,
    sql_triangle_corner_counts,
    triangle_triples_shared,
    und_edges,
)
from sql_engine_spark.registry import register

_UND_SQL = (
    "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn"
)


# ---------------------------------------------------------------------------
# Hubness audit (k-occurrence skew)
# ---------------------------------------------------------------------------


@register(
    "graph_hubness_audit",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        nodes AS (SELECT vec_id FROM embeddings),
        indeg AS (
            SELECT n.vec_id,
                   CAST(COUNT(k.dst) AS BIGINT) AS d
            FROM nodes n LEFT JOIN knn k ON k.dst = n.vec_id
            GROUP BY n.vec_id
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(d) AS BIGINT) AS s1,
                   CAST(SUM(d * d) AS BIGINT) AS s2,
                   CAST(SUM((d * d) * d) AS BIGINT) AS s3,
                   CAST(MAX(d) AS BIGINT) AS max_d,
                   CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_orphans
            FROM indeg
        ),
        m AS (
            SELECT n, s1, max_d, n_orphans,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                   CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3
            FROM s
        )
        SELECT n AS n_nodes, s1 AS n_edges, max_d AS max_in_degree,
               n_orphans, mu AS mean_in_degree,
               r2 - mu * mu AS var_in_degree,
               (r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu)
                   / ((r2 - mu * mu) * sqrt(r2 - mu * mu)) AS skew_in_degree
        FROM m
    """,
    doc="Hubness audit of the directed kNN graph: the IN-degree "
    "(k-occurrence) distribution's max / orphan count / mean / "
    "variance / skewness. Positive k-occurrence skew is THE "
    "high-dimensional ANN pathology (Radovanovic, Nanopoulos & "
    "Ivanovic, JMLR 2010: hubs appear in disproportionately many "
    "top-k lists) and the direct capacity-planning input for the "
    "wedge family's WEDGE_CAP (operators/graph.py): wedge volume per "
    "center grows as in-degree^2, so this one-aggregate audit is what "
    "a 100 TB deployment watches to know the cap must engage. All "
    "moments from exact integer power sums (in-degree <= tables*k "
    "makes d^3 safely BIGINT), closed form in one shared double "
    "order; nodes never entering any top-k list count as degree 0 "
    "via the left join against the embeddings spine.",
)
def graph_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    nodes = load(spark, sf_dir, "embeddings").select("vec_id")
    indeg = (
        nodes.join(
            g.groupBy("dst").agg(F.count("*").cast("long").alias("d0")),
            nodes.vec_id == F.col("dst"),
            "left",
        )
        .select(F.coalesce("d0", F.lit(0)).cast("long").alias("d"))
    )
    s = indeg.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
        F.sum((F.col("d") * F.col("d")) * F.col("d")).cast("long").alias("s3"),
        F.max("d").cast("long").alias("max_d"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0)).cast("long").alias(
            "n_orphans"
        ),
    )
    nD = F.col("n").cast("double")
    m = s.select(
        "n",
        "s1",
        "max_d",
        "n_orphans",
        (F.col("s1").cast("double") / nD).alias("mu"),
        (F.col("s2").cast("double") / nD).alias("r2"),
        (F.col("s3").cast("double") / nD).alias("r3"),
    )
    mu, r2, r3 = F.col("mu"), F.col("r2"), F.col("r3")
    return m.select(
        F.col("n").alias("n_nodes"),
        F.col("s1").alias("n_edges"),
        F.col("max_d").alias("max_in_degree"),
        "n_orphans",
        mu.alias("mean_in_degree"),
        (r2 - mu * mu).alias("var_in_degree"),
        (
            (r3 - F.lit(3.0) * mu * r2 + F.lit(2.0) * mu * mu * mu)
            / ((r2 - mu * mu) * F.sqrt(r2 - mu * mu))
        ).alias("skew_in_degree"),
    )


# ---------------------------------------------------------------------------
# Global transitivity
# ---------------------------------------------------------------------------


@register(
    "graph_transitivity_global",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_triangle_corner_counts(_UND_SQL)},
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri_tri),
        w AS (
            SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
                   CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM tri_deg
        ),
        e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM tri_und)
        SELECT w.n_nodes, e.n_edges, t.n_triangles, w.n_wedges,
               3.0 * CAST(t.n_triangles AS DOUBLE)
                   / CAST(w.n_wedges AS DOUBLE) AS transitivity
        FROM t, w, e
    """,
    doc="Global transitivity (Newman's clustering ratio): C = 3T / W "
    "with T the exact triangle count (degree-ordered enumeration, "
    "operators/graph.triangle_triples — each triangle once at its "
    "minimum corner, O(m^1.5) wedge volume) and W = sum C(deg, 2) the "
    "open+closed wedge count from the same degree relation. The "
    "wedge-weighted counterpart of graph_clustering_coefficient's "
    "per-node AVERAGE — the two diverge exactly when hubs exist "
    "(transitivity weights a hub's C(D,2) wedges fully), so the pair "
    "read together is the standard hub-structure probe. Integer-exact "
    "counts, one double division.",
)
def graph_transitivity_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    # Triangles from the shared materialized relation; the degree/edge
    # aggregates below stay on the (cheap) undirected edge set.
    tri = triangle_triples_shared(spark, sf_dir)
    both = und.select(F.col("a").alias("u")).unionAll(
        und.select(F.col("b").alias("u"))
    )
    deg = both.groupBy("u").agg(F.count("*").cast("long").alias("deg"))
    t = tri.agg(F.count("*").cast("long").alias("n_triangles"))
    w = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("n_wedges"),
        F.count("*").cast("long").alias("n_nodes"),
    )
    e = und.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        w.crossJoin(t)
        .crossJoin(e)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            (
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("transitivity"),
        )
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient
# ---------------------------------------------------------------------------

_RC_KS = [1, 2, 3, 4]


@register(
    "graph_rich_club",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS ({_UND_SQL}),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT a AS u FROM und UNION ALL SELECT b AS u FROM und
            ) GROUP BY u
        ),
        ks(k) AS (VALUES {", ".join(f"({k})" for k in _RC_KS)}),
        nk AS (
            SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_k
            FROM ks JOIN deg ON deg.deg > ks.k GROUP BY ks.k
        ),
        ek AS (
            SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_k
            FROM ks
            JOIN und ON TRUE
            JOIN deg da ON da.u = und.a AND da.deg > ks.k
            JOIN deg db ON db.u = und.b AND db.deg > ks.k
            GROUP BY ks.k
        )
        SELECT nk.k AS k, nk.n_k, COALESCE(ek.e_k, 0) AS e_k,
               CASE WHEN nk.n_k >= 2 THEN
                   2.0 * CAST(COALESCE(ek.e_k, 0) AS DOUBLE)
                       / (CAST(nk.n_k AS DOUBLE) * (CAST(nk.n_k AS DOUBLE) - 1.0))
               ELSE CAST(NULL AS DOUBLE) END AS phi
        FROM nk LEFT JOIN ek ON nk.k = ek.k
    """,
    doc="Rich-club coefficient phi(k) (Zhou & Mondragon 2004) of the "
    "kNN graph for k in 1..4: among nodes of degree > k, the realized "
    "fraction of possible edges — phi rising with k means high-degree "
    "vectors preferentially interconnect, i.e. a dense semantic core "
    "(near-duplicate mass) rather than isolated hubs. One bounded "
    "degree grid (broadcast) against the degree relation and the edge "
    "relation with both endpoint degrees attached — edge-sized work "
    "per k, integer counts, one double ratio.",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    both = und.select(F.col("a").alias("u")).unionAll(
        und.select(F.col("b").alias("u"))
    )
    deg = _persist(both.groupBy("u").agg(F.count("*").cast("long").alias("deg")))
    ks = F.broadcast(
        spark.createDataFrame([(k,) for k in _RC_KS], "k INT")
    )
    nk = (
        ks.join(deg, deg.deg > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_k"))
    )
    ed = und.join(
        deg.select(F.col("u").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("u").alias("b"), F.col("deg").alias("db")), "b")
    ek = (
        ed.crossJoin(ks)
        .where((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("e_k"))
    )
    nD = F.col("n_k").cast("double")
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            "n_k",
            F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
            F.when(
                F.col("n_k") >= 2,
                F.lit(2.0)
                * F.coalesce("e_k", F.lit(0)).cast("double")
                / (nD * (nD - F.lit(1.0))),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("phi"),
        )
    )


# ---------------------------------------------------------------------------
# k-truss edge support
# ---------------------------------------------------------------------------


@register(
    "graph_ktruss_support",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_triangle_corner_counts(_UND_SQL)},
        sides AS (
            SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri_tri
            UNION ALL
            SELECT least(x, z) AS a, greatest(x, z) AS b FROM tri_tri
            UNION ALL
            SELECT least(y, z) AS a, greatest(y, z) AS b FROM tri_tri
        ),
        sup AS (
            SELECT u.a, u.b,
                   CAST(COALESCE(s.c, 0) AS BIGINT) AS support
            FROM tri_und u
            LEFT JOIN (
                SELECT a, b, COUNT(*) AS c FROM sides GROUP BY a, b
            ) s ON s.a = u.a AND s.b = u.b
        ),
        hist AS (
            SELECT support, CAST(COUNT(*) AS BIGINT) AS n_edges
            FROM sup GROUP BY support
        )
        SELECT support, n_edges,
               CAST(SUM(n_edges) OVER (ORDER BY support DESC) AS BIGINT)
                   AS n_edges_ge
        FROM hist
    """,
    doc="k-truss edge-support histogram: each edge's triangle support "
    "(the number of triangles containing it) from the exact "
    "degree-ordered triangle enumeration — unpivot each triangle's "
    "three sides into canonical (a, b) form, count per edge, left-join "
    "back so triangle-free edges report support 0. n_edges_ge is the "
    "descending cumulative (edges in the (s+2)-truss have support >= "
    "s), computed over the BOUNDED support-value relation. The truss "
    "profile is the standard dense-core/cohesion summary (Cohen 2008); "
    "in an embedding kNN graph its mass at high support tracks "
    "near-duplicate clusters. Edge-sized joins, integer-exact "
    "throughout.",
)
def graph_ktruss_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    tri = triangle_triples_shared(spark, sf_dir)
    sides = (
        tri.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .unionAll(
            tri.select(
                F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
            )
        )
        .unionAll(
            tri.select(
                F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")
            )
        )
    )
    sup = und.join(
        sides.groupBy("a", "b").agg(F.count("*").alias("c")), ["a", "b"], "left"
    ).select(F.coalesce("c", F.lit(0)).cast("long").alias("support"))
    hist = sup.groupBy("support").agg(F.count("*").cast("long").alias("n_edges"))
    w = Window.orderBy(F.desc("support")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return hist.select(
        "support",
        "n_edges",
        F.sum("n_edges").over(w).cast("long").alias("n_edges_ge"),
    )


# ---------------------------------------------------------------------------
# Davies-Bouldin cluster-validity index
# ---------------------------------------------------------------------------


@register(
    "emb_davies_bouldin",
    oracle=f"""
        WITH ex AS (
            SELECT vec_id, label, i AS dim, CAST(v AS DOUBLE) AS x
            FROM (
                SELECT vec_id, label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ),
        cent AS (
            SELECT label, dim, {sql_dsum('x')} / COUNT(*) AS mu
            FROM ex GROUP BY label, dim
        ),
        dist AS (
            SELECT e.vec_id, e.label,
                   sqrt({sql_dsum('(e.x - c.mu) * (e.x - c.mu)')}) AS dist
            FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
            GROUP BY e.vec_id, e.label
        ),
        scatter AS (
            SELECT label, {sql_dsum('dist')} / CAST(COUNT(*) AS DOUBLE) AS s
            FROM dist GROUP BY label
        ),
        sep AS (
            SELECT a.label AS li, b.label AS lj,
                   sqrt({sql_dsum('(a.mu - b.mu) * (a.mu - b.mu)')}) AS m
            FROM cent a JOIN cent b
              ON a.dim = b.dim AND a.label <> b.label
            GROUP BY a.label, b.label
        ),
        r AS (
            SELECT sep.li AS label, MAX((si.s + sj.s) / sep.m) AS r_i
            FROM sep
            JOIN scatter si ON si.label = sep.li
            JOIN scatter sj ON sj.label = sep.lj
            GROUP BY sep.li
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
               {sql_dsum('r_i')} / CAST(COUNT(*) AS DOUBLE) AS davies_bouldin
        FROM r
    """,
    doc="Davies-Bouldin index (Davies & Bouldin 1979) of the label "
    "clustering in embedding space: S_i = mean Euclidean distance of "
    "members to their label centroid, M_ij = centroid separation, "
    "DB = mean_i max_j (S_i + S_j) / M_ij — lower = tighter, "
    "better-separated label clusters; the scalar quality number read "
    "next to emb_label_centroid_outliers' review queue and "
    "emb_knn_label_accuracy. Centroids from one exploded (label, dim) "
    "DECIMAL-exact aggregate (bounded relation); per-vector distances "
    "via the dim-keyed join with dsum (order-independent, so every "
    "sqrt input crosses engines bit-identically); the R_ij algebra "
    "runs on the bounded label-pair matrix.",
)
def emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ex = _persist(
        emb.select(
            "vec_id",
            "label",
            F.posexplode("embedding").alias("i0", "v"),
        ).select(
            "vec_id",
            "label",
            (F.col("i0") + 1).alias("dim"),
            F.col("v").cast("double").alias("x"),
        )
    )
    cent = _persist(
        ex.groupBy("label", "dim").agg((dsum(F.col("x")) / F.count("*")).alias("mu"))
    )
    dev = (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(dsum(dev)).alias("dist"))
    )
    scatter = dist.groupBy("label").agg(
        (dsum(F.col("dist")) / F.count("*").cast("double")).alias("s")
    )
    a = cent.select(
        F.col("label").alias("li"), "dim", F.col("mu").alias("mu_a")
    )
    b = cent.select(
        F.col("label").alias("lj"), "dim", F.col("mu").alias("mu_b")
    )
    dd = (F.col("mu_a") - F.col("mu_b")) * (F.col("mu_a") - F.col("mu_b"))
    sep = (
        a.join(b, "dim")
        .where(F.col("li") != F.col("lj"))
        .groupBy("li", "lj")
        .agg(F.sqrt(dsum(dd)).alias("m"))
    )
    r = (
        sep.join(
            scatter.select(F.col("label").alias("li"), F.col("s").alias("si")),
            "li",
        )
        .join(
            scatter.select(F.col("label").alias("lj"), F.col("s").alias("sj")),
            "lj",
        )
        .groupBy("li")
        .agg(F.max((F.col("si") + F.col("sj")) / F.col("m")).alias("r_i"))
    )
    return r.agg(
        F.count("*").cast("long").alias("n_clusters"),
        (dsum(F.col("r_i")) / F.count("*").cast("double")).alias("davies_bouldin"),
    )
