"""Round-7 self-audit operators: MinHash estimator error, per-node
clustering coefficients, a Holt linear forecast verified against a
genuine recursive oracle, and a dedup survivorship-bias audit.

The round-6/7 theme continued: operators that audit the repo's OWN
pipelines (estimator bias, keep-heuristic bias) with exact arithmetic,
composed from the documented bucketed machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_davg
from sql_engine_spark.io import load
from sql_engine_spark.operators import dedup as D
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.graph import sql_knn_shared
from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens, tokens
from sql_engine_spark.queries.dedup import (
    _MINHASH_PARAMS,
    _sql_cc_iter,
    _sql_minhash_lsh,
)
from sql_engine_spark.registry import register

_MH_K = _MINHASH_PARAMS["shingle_k"]
_MH_H = _MINHASH_PARAMS["num_hashes"]
_MH_W = 32 // _MH_H


@register(
    "dedup_minhash_estimate_error",
    oracle=f"""
        WITH pairs AS ({_sql_minhash_lsh(3, 8, 4, 0.2)}),
        docs AS (
            SELECT doc_id AS id,
                   list_distinct({sql_shingles(sql_tokens('text'), _MH_K)})
                       AS shset
            FROM documents
        ),
        sigs AS (
            SELECT id,
                   list_transform(range(0, {_MH_H}), j ->
                       list_aggregate(list_transform(
                           list_transform(shset, s -> md5(s)),
                           h -> substring(h, j * {_MH_W} + 1, {_MH_W})),
                           'min')) AS sig
            FROM docs
        )
        SELECT p.id_a, p.id_b, p.jaccard,
               CAST(len(list_filter(range(0, {_MH_H}),
                        j -> sa.sig[j + 1] = sb.sig[j + 1])) AS DOUBLE)
                   / {_MH_H}.0 AS minhash_est,
               (CAST(len(list_filter(range(0, {_MH_H}),
                         j -> sa.sig[j + 1] = sb.sig[j + 1])) AS DOUBLE)
                    / {_MH_H}.0) - p.jaccard AS err
        FROM pairs p
        JOIN sigs sa ON p.id_a = sa.id
        JOIN sigs sb ON p.id_b = sb.id
    """,
    doc="MinHash estimator-error audit: for every verified LSH pair, the "
    "signature-agreement Jaccard estimate (matching lanes / 8) next to "
    "the EXACT shingle Jaccard, and their difference — the per-pair "
    "view of the estimator bias Broder's analysis bounds at "
    "~1/sqrt(k), plus the one-permutation lane-collision bias the "
    "operator's own docstring warns about "
    "(operators/dedup.py:minhash_signature). An owner reads this "
    "before trusting signature agreement as a THRESHOLD (skipping the "
    "verify join at 100 TB): if |err| mass sits near the operating "
    "point, the verify join stays. Both estimate and truth are exact "
    "rationals; the audit adds one signature projection and two "
    "id-keyed joins over the existing pair relation.",
)
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.dedup import _shared_pairs

    hs = D.shingle_hs_shared(spark, sf_dir)
    pairs = _shared_pairs(spark, sf_dir)
    # Signatures derive from the SAME shared digest relation the pair
    # pipeline scans (lane mins are order-independent over the set).
    sigs = hs.select(
        F.col("__id").alias("id"),
        D.minhash_signature("__hs", _MH_H).alias("sig"),
    )
    est = (
        F.expr(
            f"size(filter(sequence(0, {_MH_H - 1}), "
            f"j -> element_at(sa_sig, j + 1) = element_at(sb_sig, j + 1)))"
        ).cast("double")
        / F.lit(float(_MH_H))
    )
    return (
        pairs.join(
            sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sa_sig")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sb_sig")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "jaccard",
            est.alias("minhash_est"),
            (est - F.col("jaccard")).alias("err"),
        )
    )


_CC_UND = """
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn
"""


@register(
    "graph_clustering_coefficient",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS ({_CC_UND}),
        adj AS (
            SELECT a AS node, b AS nb FROM und
            UNION ALL
            SELECT b AS node, a AS nb FROM und
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM adj GROUP BY node
        ),
        wedges AS (
            SELECT x.node AS center, x.nb AS a, y.nb AS b
            FROM adj x JOIN adj y ON x.node = y.node AND x.nb < y.nb
        ),
        closed AS (
            SELECT w.center, CAST(COUNT(*) AS BIGINT) AS triangles
            FROM wedges w JOIN und e ON w.a = e.a AND w.b = e.b
            GROUP BY w.center
        )
        SELECT d.node, d.degree,
               COALESCE(c.triangles, 0) AS triangles,
               CASE WHEN d.degree >= 2
                    THEN CAST(2 * COALESCE(c.triangles, 0) AS DOUBLE)
                         / (CAST(d.degree AS DOUBLE)
                            * CAST(d.degree - 1 AS DOUBLE))
                    ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
        FROM deg d LEFT JOIN closed c ON d.node = c.center
    """,
    doc="Per-node local clustering coefficient over the kNN graph "
    "(Watts & Strogatz 1998): per-node triangles over C(deg,2) "
    "— the node-level refinement of graph_triangle_count's global "
    "number, and the community-tightness signal dedup cluster audits "
    "read (a near-dup neighborhood with coefficient ~1 is one "
    "syndicated family; ~0 is a hub stitching unrelated docs). "
    "Triangle counts come from DEGREE-ORDERED wedge enumeration "
    "(operators/graph.triangle_corner_counts — Suri & Vassilvitskii): "
    "each triangle is enumerated ONCE at its minimum-(degree, id) "
    "corner and redistributed to all three corners relationally, so "
    "total wedge volume is O(m^1.5) even with in-degree hubs, where "
    "the r7 spelling's per-center C(deg,2) enumeration was "
    "sum(deg^2). EXACT — the result (and the naive-spelling DuckDB "
    "oracle) is unchanged; the orientation only schedules the "
    "enumeration. Coefficient is an exact rational with the deg<2 "
    "case pinned to 0 in both engines.",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import (
        knn_graph_shared,
        triangle_corner_counts_shared,
        und_both_dirs,
        und_edges,
    )

    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    adj = und_both_dirs(und, out_src="node", out_dst="nb")
    deg = adj.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    # Triangle counts from the shared materialized relation (operators/
    # graph.triangle_triples_shared) — no per-consumer re-enumeration.
    closed = triangle_corner_counts_shared(spark, sf_dir).select(
        F.col("node").alias("center"), F.col("n_triangles").alias("triangles")
    )
    t = F.coalesce("triangles", F.lit(0).cast("long"))
    return deg.join(closed, deg.node == closed.center, "left").select(
        "node",
        "degree",
        t.alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            (2 * t).cast("double")
            / (F.col("degree").cast("double") * (F.col("degree") - 1).cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


_HOLT_H = 7


@register(
    "events_holt_forecast",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT c, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
            FROM daily
        ),
        holt AS (
            SELECT CAST(1 AS BIGINT) AS i,
                   CAST(c AS DOUBLE) AS l,
                   (SELECT CAST(c AS DOUBLE) FROM idx WHERE i = 2)
                       - CAST(c AS DOUBLE) AS b
            FROM idx WHERE i = 1
            UNION ALL
            SELECT x.i,
                   0.5 * CAST(x.c AS DOUBLE) + 0.5 * (h.l + h.b),
                   0.5 * ((0.5 * CAST(x.c AS DOUBLE) + 0.5 * (h.l + h.b)) - h.l)
                       + 0.5 * h.b
            FROM holt h JOIN idx x ON x.i = h.i + 1
        ),
        last AS (
            SELECT l, b FROM holt ORDER BY i DESC LIMIT 1
        )
        SELECT CAST(h AS BIGINT) AS horizon,
               l + CAST(h AS DOUBLE) * b AS forecast
        FROM last CROSS JOIN range(1, {_HOLT_H} + 1) t(h)
    """,
    doc="Holt linear-trend forecast of the daily event count, 7 days "
    "ahead, with alpha = beta = 0.5 — the EXACT-HALVING operating "
    "point (multiplying by 0.5 is lossless in binary; the only "
    "roundings are the shared-order additions), the same device as "
    "events_ewma_half, so the recursion is bit-reproducible. The "
    "corpus collapses to the bounded day relation in one aggregate; "
    "the level/trend recursion folds that MODEL-SIZED series on the "
    "driver (the documented bounded-collect posture — centroids, BPE "
    "argmax — days, not events), while the oracle runs a genuine "
    "WITH RECURSIVE: two independent spellings of the recursion, one "
    "bit-identical answer.",
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    series = [r.c for r in daily.orderBy("d").collect()]  # bounded: days
    l = float(series[0])
    b = float(series[1]) - float(series[0])
    for y in series[1:]:
        l_new = 0.5 * float(y) + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        l = l_new
    rows = [(h, l + float(h) * b) for h in range(1, _HOLT_H + 1)]
    return spark.createDataFrame(rows, "horizon long, forecast double")


@register(
    "curation_survivorship_audit",
    oracle=f"""
        WITH cc_pairs AS (
            SELECT id_a, id_b FROM ({_sql_minhash_lsh(3, 8, 4, 0.2)})
        ),
        cc_edges AS (
            SELECT id_a AS src, id_b AS dst FROM cc_pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM cc_pairs
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM cc_edges),
        {_sql_cc_iter('l0', 'l1')},
        {_sql_cc_iter('l1', 'l2')},
        {_sql_cc_iter('l2', 'l3')},
        toks AS (
            SELECT doc_id,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct({sql_tokens('text')})) AS DOUBLE)
                       / CAST(len({sql_tokens('text')}) AS DOUBLE) AS ttr
            FROM documents
        ),
        labeled AS (
            SELECT t.doc_id, COALESCE(l.label, t.doc_id) AS cluster_id,
                   t.n_tokens, t.ttr
            FROM toks t LEFT JOIN l3 l ON l.node = t.doc_id
        ),
        flagged AS (
            SELECT doc_id, cluster_id, n_tokens, ttr,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY n_tokens DESC, doc_id) = 1
                       AS keep,
                   CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                       AS cluster_size
            FROM labeled
        )
        SELECT keep,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_davg('CAST(n_tokens AS DOUBLE)')} AS avg_tokens,
               {sql_davg('ttr')} AS avg_ttr
        FROM flagged WHERE cluster_size > 1
        GROUP BY keep
    """,
    doc="Dedup survivorship-bias audit: within true duplicate clusters "
    "(size > 1), the kept canonicals vs the dropped members compared "
    "on an INDEPENDENT quality axis — type-token ratio — that the "
    "keep-longest heuristic does not optimize. dedup_keep_best picks "
    "by length; if the dropped side systematically wins on TTR, the "
    "canonical-selection rule is trading away lexical quality and "
    "should move to a composite score (the survivorship bias every "
    "keep-one-per-cluster pass silently bakes into the corpus). "
    "Recomputes the documented keep_best pipeline and adds one "
    "cluster-keyed size window + a 2-row DECIMAL-mean aggregate.",
)
def curation_survivorship_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.functions.numeric import davg

    from sql_engine_spark.queries.dedup import _shared_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = _shared_pairs(spark, sf_dir)
    cc = D.connected_components_fixed(pairs, "id_a", "id_b", iterations=3)
    toks = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(tokens("text"))).cast("double")
            / F.size(tokens("text")).cast("double")
        ).alias("ttr"),
    )
    labeled = toks.join(
        cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("label", "doc_id").alias("cluster_id"),
        "n_tokens",
        "ttr",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    flagged = labeled.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        "ttr",
        (F.row_number().over(w) == 1).alias("keep"),
        F.count("*")
        .over(Window.partitionBy("cluster_id"))
        .cast("long")
        .alias("cluster_size"),
    )
    return (
        flagged.where(F.col("cluster_size") > 1)
        .groupBy("keep")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            davg(F.col("n_tokens").cast("double")).alias("avg_tokens"),
            davg("ttr").alias("avg_ttr"),
        )
    )
