"""Round-7 search & linkage set: hybrid lexical+vector retrieval with
reciprocal-rank fusion, edit-distance fuzzy dedup inside
sorted-neighborhood blocks, Jaccard link prediction on the kNN graph,
market-basket co-purchase projection of the order/part bipartite
graph, and a deterministic source-interleaved training order — the
retrieval/feed layer over the engine's existing index pipelines.

Scale/determinism posture: every ranking reuses the salted two-level
top-k or the bucketed two-level rank (no corpus-wide single-task
sorts); RRF terms are single divisions summed in a pinned two-term
order; Levenshtein is exact integer; Jaccard denominators are exact
integer inclusion-exclusion. No libm transcendentals anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.vectors import dot, l2_norm
from sql_engine_spark.io import load
from sql_engine_spark.operators import retrieval as R
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import (
    bucketed_running_sum,
    hex_prefix_bucket,
)
from sql_engine_spark.operators.graph import sql_capped_adjacency
from sql_engine_spark.operators.graph import sql_knn_shared
from sql_engine_spark.operators.similarity import two_level_topk
from sql_engine_spark.operators.textprep import sql_tokens
from sql_engine_spark.queries.retrieval import _BM25_QUERIES
from sql_engine_spark.registry import register

_RRF_K = 60
_HYB_K = 10

_KNN_UND = (
    "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn"
)


@register(
    "ann_hybrid_rrf",
    oracle=f"""
        WITH bm25 AS (
            SELECT * FROM ({R.sql_bm25_topk(_BM25_QUERIES, k=_HYB_K)})
        ),
        exemplar AS (
            SELECT query_id, doc_id AS ex_id FROM bm25 WHERE rank = 1
        ),
        v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        q AS (
            SELECT ex.query_id, ex.ex_id, v.e
            FROM exemplar ex JOIN v ON v.vec_id = ex.ex_id
        ),
        vec_scored AS (
            SELECT q.query_id, c.vec_id AS doc_id,
                   list_reduce(list_transform(list_zip(q.e, c.e),
                                              p -> p[1] * p[2]),
                               (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(q.e, x -> x * x),
                                       (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(c.e, x -> x * x),
                                         (x, y) -> x + y))) AS cosine
            FROM q JOIN v c ON c.vec_id <> q.ex_id
        ),
        vec_rank AS (
            SELECT query_id, doc_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, doc_id) AS BIGINT) AS vrank
            FROM vec_scored
            QUALIFY vrank <= {_HYB_K}
        ),
        fused AS (
            SELECT COALESCE(t.query_id, s.query_id) AS query_id,
                   COALESCE(t.doc_id, s.doc_id) AS doc_id,
                   t.rank AS text_rank, s.vrank AS vec_rank,
                   COALESCE(CAST(1.0 AS DOUBLE)
                            / ({_RRF_K}.0 + CAST(t.rank AS DOUBLE)),
                            CAST(0.0 AS DOUBLE))
                   + COALESCE(CAST(1.0 AS DOUBLE)
                              / ({_RRF_K}.0 + CAST(s.vrank AS DOUBLE)),
                              CAST(0.0 AS DOUBLE)) AS rrf_score
            FROM bm25 t FULL JOIN vec_rank s
              ON t.query_id = s.query_id AND t.doc_id = s.doc_id
        )
        SELECT query_id, doc_id, text_rank, vec_rank, rrf_score,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
        FROM fused
        QUALIFY rank <= {_HYB_K}
    """,
    doc="Hybrid search with reciprocal-rank fusion (Cormack et al. "
    "SIGIR 2009): per literal query, the BM25-family lexical top-10 "
    "and a 'more-like-this' vector leg (cosine top-10 around the "
    "lexical rank-1 exemplar — vec_id/doc_id share the id space) are "
    "fused by RRF(d) = sum 1/(60 + rank_leg(d)) and re-ranked. RRF "
    "needs only RANKS, which both legs produce deterministically, so "
    "the fusion sidesteps score-scale mismatch — the reason "
    "production hybrid search fuses this way. Each RRF term is one "
    "IEEE division and the two-term sum has a pinned order; the "
    "fused candidate relation is <= 2k rows per query, so the final "
    "window is bounded. Corpus work: the BM25 pipeline + ONE "
    "broadcast-exemplar cosine pass.",
)
def ann_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # Lexical leg from the process-shared materialized first-pass
    # ranking (r13; r12 read the shared index but still re-ranked per
    # invocation). Identical rows — the shared table IS this pipeline's
    # output, written once and scanned. The persist is gone with it:
    # both consumers scan a k-rows-per-query parquet file.
    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    bm25 = bm25_ranked_shared(spark, sf_dir, k=_HYB_K)
    exemplar = bm25.where(F.col("rank") == 1).select(
        "query_id", F.col("doc_id").alias("ex_id")
    )
    v = emb.select("vec_id", "embedding")
    q = F.broadcast(
        exemplar.join(v, exemplar["ex_id"] == v["vec_id"]).select(
            "query_id",
            "ex_id",
            F.col("embedding").alias("__qv"),
            l2_norm("embedding").alias("__qn"),
        )
    )
    c = v.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("__cv"),
        l2_norm("embedding").alias("__cn"),
    )
    vec_scored = (
        q.crossJoin(c)
        .where(F.col("doc_id") != F.col("ex_id"))
        .withColumn("cosine", dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
    )
    vec_rank = two_level_topk(
        vec_scored, score_col="cosine", k=_HYB_K, query_col="query_id",
        id_col="doc_id",
    ).select("query_id", "doc_id", F.col("rank").alias("vrank"))
    t, s = bm25.alias("t"), vec_rank.alias("s")
    fused = t.join(
        s,
        (F.col("t.query_id") == F.col("s.query_id"))
        & (F.col("t.doc_id") == F.col("s.doc_id")),
        "full_outer",
    ).select(
        F.coalesce(F.col("t.query_id"), F.col("s.query_id")).alias("query_id"),
        F.coalesce(F.col("t.doc_id"), F.col("s.doc_id")).alias("doc_id"),
        F.col("t.rank").alias("text_rank"),
        F.col("s.vrank").alias("vec_rank"),
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("t.rank").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("s.vrank").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _HYB_K)
        .select("query_id", "doc_id", "text_rank", "vec_rank", "rrf_score", "rank")
    )


_ED_PREFIX = 120
_ED_WINDOW = 3
_ED_KEYTOK = 5
_ED_THRESH = 40


@register(
    "dedup_edit_distance",
    oracle=f"""
        WITH base AS (
            SELECT doc_id AS id,
                   md5(array_to_string(({sql_tokens('text')})[1:{_ED_KEYTOK}], ' '))
                       AS key,
                   substring(text, 1, {_ED_PREFIX}) AS pfx
            FROM documents
        ),
        r AS (
            SELECT id, pfx,
                   CAST(row_number() OVER (
                       ORDER BY concat_ws('|', key,
                                          lpad(CAST(id AS VARCHAR), 12, '0'))
                   ) AS BIGINT) AS rnk
            FROM base
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist,
               levenshtein(a.pfx, b.pfx) <= {_ED_THRESH} AS is_near_dup
        FROM r a JOIN r b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {_ED_WINDOW}
    """,
    doc="Edit-distance fuzzy dedup inside sorted-neighborhood blocks "
    "(Hernandez & Stolfo 1995 blocking + exact Levenshtein verify): "
    "candidates are each record's 3 successors in blocking-key order "
    "(O(n*w), never O(n^2)); the verify is levenshtein on the "
    f"{_ED_PREFIX}-char prefix — the bounded-cost spelling that keeps "
    "the O(len^2) DP off full documents (the standard record-linkage "
    "trade; full-text verify belongs behind a length-ratio prefilter)."
    " The global blocking order is the bucketed two-level rank, same "
    "machinery as dedup_sorted_neighborhood; Spark and DuckDB "
    "levenshtein agree exactly (classic DP, integer). Emits every "
    "candidate pair with its distance + verdict so downstream sweeps "
    "can re-threshold without re-running the DP.",
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents")
    base = (
        docs.select(
            F.col("doc_id").alias("__id"),
            F.substring("text", 1, _ED_PREFIX).alias("__pfx"),
            F.md5(
                F.array_join(F.slice(tokens("text"), 1, _ED_KEYTOK), " ")
            ).alias("__key"),
        )
        .withColumn(
            "__ord",
            F.concat_ws(
                "|", F.col("__key"), F.lpad(F.col("__id").cast("string"), 12, "0")
            ),
        )
    )
    ranked = _persist(
        bucketed_running_sum(
            base.withColumn("__one", F.lit(1).cast("long")),
            part_cols=[],
            order_col="__ord",
            value_col="__one",
            bucket=hex_prefix_bucket("__key", 32),
            out_col="__rnk",
        ).drop("__one", "__ord", "__key")
    )
    right = ranked.select(
        F.col("__id").alias("__id_b"),
        F.col("__pfx").alias("__pfx_b"),
        F.col("__rnk").alias("__prnk"),
    )
    pairs = ranked.select(
        "__id",
        "__pfx",
        F.explode(F.expr(f"sequence(__rnk + 1, __rnk + {_ED_WINDOW})")).alias(
            "__prnk"
        ),
    ).join(right, "__prnk")
    dist = F.levenshtein(F.col("__pfx"), F.col("__pfx_b"))
    return pairs.select(
        F.col("__id").alias("id_a"),
        F.col("__id_b").alias("id_b"),
        dist.cast("long").alias("edit_dist"),
        (dist <= F.lit(_ED_THRESH)).alias("is_near_dup"),
    )


_JLP_TOPK = 3


@register(
    "graph_jaccard_linkpred",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_capped_adjacency()},
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adjw GROUP BY node
        ),
        wedges AS (
            SELECT x.nb AS a, y.nb AS b
            FROM adj x JOIN adj y ON x.node = y.node AND x.nb < y.nb
        ),
        cn AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
            FROM wedges GROUP BY a, b
        ),
        scored AS (
            SELECT c.a, c.b, c.common_neighbors,
                   da.d + db.d - c.common_neighbors AS union_size,
                   CAST(c.common_neighbors AS DOUBLE)
                   / CAST(da.d + db.d - c.common_neighbors AS DOUBLE)
                       AS jaccard
            FROM cn c
            JOIN deg da ON da.node = c.a
            JOIN deg db ON db.node = c.b
            WHERE c.common_neighbors >= 2
        )
        SELECT a, b, common_neighbors, union_size, jaccard,
               CAST(row_number() OVER (PARTITION BY a
                    ORDER BY jaccard DESC, b) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= {_JLP_TOPK}
    """,
    doc="Jaccard-coefficient link prediction on the kNN graph "
    "(Liben-Nowell & Kleinberg 2003): score(a,b) = |N(a) n N(b)| / "
    "|N(a) u N(b)|, the normalized cousin of graph_common_neighbors "
    "that stops high-degree hubs from dominating — and unlike "
    "Adamic-Adar it needs no log, so the score is an exact-integer "
    "ratio (inclusion-exclusion union) with ONE final division, "
    "hash-stable cross-engine (house rule: no libm in hashed "
    "outputs). Wedge enumeration is DEGREE-CAPPED at the WEDGE_CAP "
    "strongest neighbors per center (operators/graph.capped_adjacency, "
    "mirrored in the oracle; inert at test scale — max degree 13 at "
    "sf0.1 < cap 32) so hub in-degree cannot go quadratic at 100x; "
    "the Jaccard DENOMINATOR keeps TRUE degrees (uncapped mirror), "
    "so reported scores are exact whenever the pair's wedges survive "
    "the cap.",
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import capped_adjacency, knn_graph_shared, und_edges

    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    adjw = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = adjw.groupBy("node").agg(F.count("*").cast("long").alias("d"))
    adj = _persist(capped_adjacency(g))
    x, y = adj.alias("x"), adj.alias("y")
    wedges = x.join(
        y, (F.col("x.node") == F.col("y.node")) & (F.col("x.nb") < F.col("y.nb"))
    ).select(F.col("x.nb").alias("a"), F.col("y.nb").alias("b"))
    cn = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("common_neighbors")
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("__db"))
    scored = (
        cn.where(F.col("common_neighbors") >= 2)
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            (F.col("__da") + F.col("__db") - F.col("common_neighbors")).alias(
                "union_size"
            ),
            (
                F.col("common_neighbors").cast("double")
                / (F.col("__da") + F.col("__db") - F.col("common_neighbors")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("jaccard"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _JLP_TOPK)
        .select("a", "b", "common_neighbors", "union_size", "jaccard", "rank")
    )


_COP_TOPK = 20


@register(
    "graph_copurchase_projection",
    oracle=f"""
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
            FROM po a JOIN po b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        counted AS (
            SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_coorders
            FROM pairs GROUP BY part_a, part_b
        )
        SELECT part_a, part_b, n_coorders
        FROM counted
        ORDER BY n_coorders DESC, part_a, part_b
        LIMIT {_COP_TOPK}
    """,
    doc="Bipartite co-purchase projection (market-basket): project the "
    "order/part bipartite graph onto part-part edges weighted by "
    "co-order count, top-20 pairs — the 'frequently bought together' "
    "primitive and the 2-itemset counting core of Apriori (Agrawal & "
    "Srikant 1994). Pair enumeration is the per-order self-join: "
    "C(basket, 2) pairs per order with basket size bounded by the "
    "order's line count (never corpus^2) — the same "
    "bounded-by-construction argument as the kNN wedge ops; at 100 "
    "TB a pathological mega-basket would need a basket-size cap, the "
    "documented knob. Final top-k is a TakeOrdered, no global sort.",
)
def graph_copurchase_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Both self-join sides alias one relation — persist so the lineitem
    # scan + distinct runs once, not once per side (r13, guide §1.2;
    # runtime exchange reuse is not structural).
    po = _persist(li.select("l_orderkey", "l_partkey").distinct())
    a = po.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = po.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "k").where(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_coorders"))
        .orderBy(F.desc("n_coorders"), F.asc("part_a"), F.asc("part_b"))
        .limit(_COP_TOPK)
    )


_ILV_HEAD = 100


@register(
    "curation_interleave_sources",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   md5(CAST(doc_id AS VARCHAR)) AS k
            FROM documents
        ),
        r AS (
            SELECT doc_id, source,
                   CAST(row_number() OVER (PARTITION BY source
                        ORDER BY k, doc_id) AS BIGINT) AS src_rank
            FROM keyed
        ),
        head AS (
            SELECT doc_id, source, src_rank
            FROM r
            ORDER BY src_rank, source, doc_id
            LIMIT {_ILV_HEAD}
        )
        SELECT CAST(row_number() OVER (ORDER BY src_rank, source, doc_id)
                    AS BIGINT) AS position,
               doc_id, source, src_rank
        FROM head
    """,
    doc="Deterministic source-interleaved training order: each source's "
    "documents are shuffled by a content-id hash (md5 — stable across "
    "engines, reruns, partitionings), then the streams merge "
    "round-robin by (per-source rank, source) — the data-loader order "
    "that keeps every batch source-balanced WITHOUT a global corpus "
    "shuffle key. The per-source rank is the bucketed two-level rank "
    "(partitioned, parallel); the emitted head is a top-100 "
    "TakeOrdered over (rank, source) — at scale the full order is "
    "never materialized, readers seek into it by rank range. The "
    "window over the 100-row head is bounded.",
)
def curation_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("__k")
    ).withColumn(
        "__ord",
        F.concat_ws(
            "|", F.col("__k"), F.lpad(F.col("doc_id").cast("string"), 12, "0")
        ),
    )
    ranked = bucketed_running_sum(
        keyed.withColumn("__one", F.lit(1).cast("long")),
        part_cols=["source"],
        order_col="__ord",
        value_col="__one",
        bucket=hex_prefix_bucket("__k", 32),
        out_col="src_rank",
    )
    head = (
        ranked.select("doc_id", "source", F.col("src_rank").cast("long").alias("src_rank"))
        .orderBy("src_rank", "source", "doc_id")
        .limit(_ILV_HEAD)
    )
    w = Window.orderBy("src_rank", "source", "doc_id")
    return head.select(
        F.row_number().over(w).cast("long").alias("position"),
        "doc_id",
        "source",
        "src_rank",
    )
