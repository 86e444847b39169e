"""Round-6 pipeline compositions: the incremental-ingest flagship, the
curation yield funnel, bounded-depth graph reachability (the recursive-
CTE capability Spark lacks natively, unrolled), a streaming RFM view,
and audience-overlap analysis.

Every composition reuses the documented bucketed pipelines (Bloom/
MinHash ingest dedup, Gopher quality, matview merges) — the point is
that the audited pieces COMPOSE without new scale hazards: each added
stage is an id-keyed join or a bounded aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators import dedup as D
from sql_engine_spark.operators import text as T
from sql_engine_spark.queries.dedup import (
    _MINHASH_PARAMS,
    _shared_pairs,
    _sql_minhash_lsh,
)
from sql_engine_spark.registry import _REGISTRY, register

_NEW_MOD = 10
_NEW_REM = 7


@register(
    "pipeline_incremental_ingest",
    oracle=None,  # spliced below (composes the gopher oracle)
    doc="Incremental-ingest flagship: admit an incoming batch (every "
    f"10th doc, remainder {_NEW_REM}) against the standing corpus — "
    "exact-dup gate (md5 anti join; at scale the Bloom-gated variant "
    "dedup_bloom_ingest fronts this), near-dup gate (MinHash band "
    "join ACROSS the batch/corpus boundary only — "
    "dedup_minhash_incremental's device, O(batch) against a stored "
    "signature table), and the Gopher quality gate — emitting the "
    "per-doc admission record with each gate's verdict. This is the "
    "nightly-ingest composition a production corpus runs; every stage "
    "is an id-keyed join or map work, so the composition adds no "
    "scale hazard over its audited parts.",
)
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("__h", F.md5("text"))
    is_new = F.col("doc_id") % _NEW_MOD == _NEW_REM
    new_docs = docs.where(is_new)
    corpus = docs.where(~is_new)

    exact_dup = (
        new_docs.join(
            corpus.select(F.col("__h").alias("__ch")).distinct(),
            new_docs.__h == F.col("__ch"),
            "left",
        )
        .select("doc_id", F.col("__ch").isNotNull().alias("exact_dup"))
    )
    pairs = D.minhash_lsh_pairs_split(
        docs, "doc_id", "text", is_new, **_MINHASH_PARAMS
    )
    near_ids = pairs.select(F.col("new_id").alias("id")).distinct()
    quality = T.gopher_quality(new_docs, "text", "doc_id").select(
        "doc_id", F.col("pass_gopher").alias("quality_ok")
    )
    out = (
        new_docs.select("doc_id", "source")
        .join(exact_dup, "doc_id")
        .join(
            near_ids.select(F.col("id").alias("doc_id"), F.lit(True).alias("__nd")),
            "doc_id",
            "left",
        )
        .join(quality, "doc_id")
        .select(
            "doc_id",
            "source",
            "exact_dup",
            F.coalesce("__nd", F.lit(False)).alias("near_dup"),
            "quality_ok",
        )
    )
    return out.withColumn(
        "admitted",
        ~F.col("exact_dup") & ~F.col("near_dup") & F.col("quality_ok"),
    )


def _incremental_ingest_oracle() -> str:
    gopher = _REGISTRY["text_gopher_quality"].oracle
    t = _MINHASH_PARAMS["threshold"]
    return f"""
        WITH newdocs AS (
            SELECT doc_id, source, md5(text) AS h FROM documents
            WHERE doc_id % {_NEW_MOD} = {_NEW_REM}
        ),
        corpus_h AS (
            SELECT DISTINCT md5(text) AS h FROM documents
            WHERE doc_id % {_NEW_MOD} <> {_NEW_REM}
        ),
        allpairs AS ({_sql_minhash_lsh(3, 8, 4, t)}),
        cross_pairs AS (
            SELECT id_a, id_b FROM allpairs
            WHERE (id_a % {_NEW_MOD} = {_NEW_REM})
               <> (id_b % {_NEW_MOD} = {_NEW_REM})
        ),
        near_ids AS (
            SELECT id_a AS id FROM cross_pairs
            UNION
            SELECT id_b AS id FROM cross_pairs
        ),
        quality AS (SELECT doc_id, pass_gopher FROM ({gopher}))
        SELECT n.doc_id, n.source,
               EXISTS (SELECT 1 FROM corpus_h c WHERE c.h = n.h) AS exact_dup,
               EXISTS (SELECT 1 FROM near_ids i
                       WHERE i.id = n.doc_id
                         AND i.id % {_NEW_MOD} = {_NEW_REM}) AS near_dup,
               q.pass_gopher AS quality_ok,
               NOT EXISTS (SELECT 1 FROM corpus_h c WHERE c.h = n.h)
                   AND NOT EXISTS (SELECT 1 FROM near_ids i
                                   WHERE i.id = n.doc_id
                                     AND i.id % {_NEW_MOD} = {_NEW_REM})
                   AND q.pass_gopher AS admitted
        FROM newdocs n JOIN quality q USING (doc_id)
    """


_REGISTRY["pipeline_incremental_ingest"].oracle = _incremental_ingest_oracle()


@register(
    "curation_funnel_report",
    oracle=None,  # spliced below
    doc="Curation yield funnel per source: raw -> language gate -> "
    "Gopher quality gate -> near-dup gate, with cumulative survivor "
    "counts and the final yield fraction — the attrition report every "
    "curation run publishes next to its dataset card (FineWeb/RefinedWeb "
    "style). Gates reuse the shipped pipelines (Gopher flags are map "
    "work; the dup-loser set is the MinHash pair relation's id_b side, "
    "canonical keep-first); the report itself is one conditional-count "
    "aggregate per source.",
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    quality = T.gopher_quality(docs, "text", "doc_id").select(
        "doc_id", "pass_gopher"
    )
    pairs = _shared_pairs(spark, sf_dir)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    base = (
        docs.select("doc_id", "source", "lang")
        .join(quality, "doc_id")
        .join(losers.withColumn("__dup", F.lit(True)), "doc_id", "left")
        .select(
            "source",
            (F.col("lang") != "zh").alias("s1"),
            F.col("pass_gopher").alias("s2"),
            F.coalesce("__dup", F.lit(False)).alias("dup"),
        )
    )
    c1 = F.col("s1")
    c2 = c1 & F.col("s2")
    c3 = c2 & ~F.col("dup")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    g = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_raw"),
        one(c1).alias("n_after_lang"),
        one(c2).alias("n_after_quality"),
        one(c3).alias("n_after_dedup"),
    )
    return g.withColumn(
        "yield_frac",
        F.col("n_after_dedup").cast("double") / F.col("n_raw").cast("double"),
    )


def _funnel_oracle() -> str:
    gopher = _REGISTRY["text_gopher_quality"].oracle
    t = _MINHASH_PARAMS["threshold"]
    return f"""
        WITH quality AS (SELECT doc_id, pass_gopher FROM ({gopher})),
        losers AS (
            SELECT DISTINCT id_b AS doc_id FROM ({_sql_minhash_lsh(3, 8, 4, t)})
        ),
        base AS (
            SELECT d.source,
                   d.lang <> 'zh' AS s1,
                   q.pass_gopher AS s2,
                   EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
                       AS dup
            FROM documents d JOIN quality q USING (doc_id)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_after_lang,
               CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_after_quality,
               CAST(SUM(CASE WHEN s1 AND s2 AND NOT dup THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_after_dedup,
               CAST(SUM(CASE WHEN s1 AND s2 AND NOT dup THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS yield_frac
        FROM base GROUP BY source
    """


_REGISTRY["curation_funnel_report"].oracle = _funnel_oracle()


_SEED_MAX = 5
_MAX_HOPS = 3


@register(
    "graph_reachability_3hop",
    oracle=f"""
        WITH RECURSIVE knn AS ({{knn}}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        adj AS (
            SELECT a AS node, b AS nb FROM und
            UNION ALL
            SELECT b AS node, a AS nb FROM und
        ),
        seeds AS (
            SELECT DISTINCT node FROM adj WHERE node < {_SEED_MAX}
        ),
        walk AS (
            SELECT node, 0 AS hops FROM seeds
            UNION ALL
            SELECT adj.nb AS node, walk.hops + 1 AS hops
            FROM walk JOIN adj ON walk.node = adj.node
            WHERE walk.hops < {_MAX_HOPS}
        )
        SELECT node, CAST(MIN(hops) AS BIGINT) AS min_hops
        FROM walk GROUP BY node
    """,
    doc="Bounded-depth reachability over the kNN graph: min-hop "
    "distance (<= 3) from a seed set — the recursive-CTE capability "
    "Spark SQL lacks natively, expressed as the standard unrolled "
    "frontier iteration (3 edge-sized joins + a min aggregate, the "
    "same fixed-round device as label propagation and k-core "
    "peeling); the DuckDB oracle IS a genuine WITH RECURSIVE, so the "
    "unrolling is verified against the real recursion. Frontiers are "
    "node relations keyed on node id; no adjacency materialization "
    "beyond the mirrored edge list.",
)
def graph_reachability_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.graph import knn_graph_shared, und_both_dirs, und_edges

    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g)
    adj = _persist(
        und_both_dirs(und, out_src="node", out_dst="nb")
    )
    frontier = (
        adj.select("node").distinct().where(F.col("node") < _SEED_MAX)
        .withColumn("hops", F.lit(0))
    )
    reach = frontier
    for r in range(1, _MAX_HOPS + 1):
        # Dedupe the frontier each hop: without the distinct() it is a
        # bag of PATHS (rows multiply by average degree per hop — seeds
        # x deg^3 by hop 3 on a hubby kNN graph); with it the frontier
        # is capped at |reachable nodes|. hops is constant within a
        # round, so the dedup is exact — min(hops) downstream is
        # unchanged.
        frontier = (
            adj.join(frontier.select("node"), "node")
            .select(F.col("nb").alias("node"))
            .distinct()
            .withColumn("hops", F.lit(r))
        )
        reach = reach.unionAll(frontier)
    return reach.groupBy("node").agg(F.min("hops").cast("long").alias("min_hops"))


def _fix_reach_oracle() -> None:
    from sql_engine_spark.operators.graph import sql_knn_shared

    q = _REGISTRY["graph_reachability_3hop"]
    q.oracle = q.oracle.replace(
        "{knn}", sql_knn_shared()
    )


_fix_reach_oracle()


@register(
    "streaming_rfm_segments",
    oracle=None,  # spliced below: the batch RFM oracle
    doc="Streaming RFM: per-user (last-seen, count, decimal-exact value "
    "sum) maintained across event micro-batches through the idempotent "
    "matview — all three statistics are MERGEABLE (max / sum / decimal "
    "sum), which is what makes per-user state O(users) and per-trigger "
    "cost O(batch)+O(view). The drained view feeds the identical "
    "relative-threshold segmentation as events_rfm_segments, to which "
    "it converges EXACTLY (the segments are a pure function of the "
    "final merged statistics). Maintained by the shared events replay "
    "fleet (streaming/fleet.py); per-view state untouched.",
)
def streaming_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_rfm_segments")
    u = view.read(spark)
    anchor = u.agg(F.max("last_ts").alias("amax"))
    g = u.agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_users"),
        F.sum("val_dec").cast("double").alias("total_value"),
    )
    per = u.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("amax").cast("date"), F.col("last_ts").cast("date"))
        .cast("long")
        .alias("recency_days"),
        F.col("cnt").alias("frequency"),
        F.col("val_dec").cast("double").alias("monetary"),
    )
    freq_hot = F.col("frequency") * F.col("n_users") > F.col("n_events")
    mon_hot = (
        F.col("monetary") * F.col("n_users").cast("double") > F.col("total_value")
    )
    return per.crossJoin(F.broadcast(g)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.when(freq_hot & mon_hot, "champion")
        .when(mon_hot, "big_spender")
        .when(freq_hot, "frequent")
        .otherwise("casual")
        .alias("segment"),
    )


_REGISTRY["streaming_rfm_segments"].oracle = _REGISTRY[
    "events_rfm_segments"
].oracle

from sql_engine_spark.streaming.fleet import register_fleet_view  # noqa: E402

_RFM_DEC = "decimal(27,6)"

register_fleet_view(
    "streaming_rfm_segments",
    table="events",
    partial_of=lambda b: (
        b.groupBy("user_id").agg(
            F.max("ts").alias("last_ts"),
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("value").cast(_RFM_DEC)).alias("val_dec"),
        )
    ),
    combine=lambda cur, partial: (
        cur.unionByName(partial)
        .groupBy("user_id")
        .agg(
            F.max("last_ts").alias("last_ts"),
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("val_dec").cast(_RFM_DEC).alias("val_dec"),
        )
    ),
)


@register(
    "events_user_overlap_jaccard",
    oracle="""
        WITH tu AS (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        sizes AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM tu GROUP BY event_type
        ),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM tu a JOIN tu b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT type_a, type_b, n_common,
               CAST(n_common AS DOUBLE)
                   / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON type_a = sa.event_type
        JOIN sizes sb ON type_b = sb.event_type
    """,
    doc="Audience overlap between event types: Jaccard similarity of "
    "the user sets per type pair — the segment-overlap matrix behind "
    "cross-sell analysis and feature-audience planning. The corpus "
    "work is ONE distinct over (type, user); the pair join runs on "
    "that distinct relation keyed by user (per-user fan-out bounded "
    "by the type count), intersection and union sizes are exact "
    "integers via inclusion-exclusion.",
)
def events_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = tu.alias("a")
    b = tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "streaming_funnel_live",
    oracle="""
        WITH ft AS (
            SELECT user_id, event_type, MIN(ts) AS first_ts
            FROM events GROUP BY user_id, event_type
        ),
        p AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'view' THEN first_ts END) AS t_view,
                   MAX(CASE WHEN event_type = 'click' THEN first_ts END) AS t_click,
                   MAX(CASE WHEN event_type = 'purchase' THEN first_ts END)
                       AS t_purchase
            FROM ft GROUP BY user_id
        )
        SELECT CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_viewed,
               CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
               CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                             AND t_purchase >= t_click
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM p
    """,
    doc="Streaming first-touch funnel: the per-(user, event_type) "
    "FIRST-SEEN timestamp relation is maintained across micro-batches "
    "through the idempotent matview (min is mergeable — the same "
    "argument as the RFM view), and the ordered funnel view -> click "
    "-> purchase (each step's first touch at or after the previous "
    "step's) evaluates over the drained view, converging EXACTLY to "
    "the batch answer. View state is users x types; per-trigger cost "
    "O(batch) + O(view). The live companion to events_user_funnel's "
    "batch counts. Maintained by the shared events replay fleet "
    "(streaming/fleet.py); per-view state untouched.",
)
def streaming_funnel_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_funnel_live")
    ft = view.read(spark)
    p = ft.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", F.col("first_ts"))
        ).alias("t_view"),
        F.max(
            F.when(F.col("event_type") == "click", F.col("first_ts"))
        ).alias("t_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("first_ts"))
        ).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    vc = viewed & (F.col("t_click") >= F.col("t_view"))
    full = vc & (F.col("t_purchase") >= F.col("t_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return p.agg(
        one(viewed).alias("n_viewed"),
        one(vc).alias("n_view_click"),
        one(full).alias("n_full_funnel"),
    )


register_fleet_view(
    "streaming_funnel_live",
    table="events",
    partial_of=lambda b: (
        b.groupBy("user_id", "event_type").agg(F.min("ts").alias("first_ts"))
    ),
    combine=lambda cur, partial: (
        cur.unionByName(partial)
        .groupBy("user_id", "event_type")
        .agg(F.min("first_ts").alias("first_ts"))
    ),
)
