"""Round-8 extras, second set: b-bit MinHash audit, gaps-and-islands
activity streaks, merge-on-read positional deletes, and video
scene-cut detection over the multimodal frame plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators import dedup as D
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.textprep import shingles, sql_shingles, sql_tokens, tokens
from sql_engine_spark.queries.dedup import _MINHASH_PARAMS, _sql_minhash_lsh
from sql_engine_spark.registry import register

_MH_K = _MINHASH_PARAMS["shingle_k"]
_MH_H = _MINHASH_PARAMS["num_hashes"]
_MH_W = 32 // _MH_H


@register(
    "dedup_minhash_bbit_audit",
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
        ),
        bits AS (
            SELECT id,
                   list_transform(sig, lane ->
                       (instr('0123456789abcdef',
                              substring(lane, {_MH_W}, 1)) - 1) % 2) AS b
            FROM sigs
        ),
        matched AS (
            SELECT p.id_a, p.id_b, p.jaccard,
                   CAST(len(list_filter(range(0, {_MH_H}),
                            j -> sa.sig[j + 1] = sb.sig[j + 1])) AS BIGINT)
                       AS full_matches,
                   CAST(len(list_filter(range(0, {_MH_H}),
                            j -> ba.b[j + 1] = bb.b[j + 1])) AS BIGINT)
                       AS bit_matches
            FROM pairs p
            JOIN sigs sa ON p.id_a = sa.id
            JOIN sigs sb ON p.id_b = sb.id
            JOIN bits ba ON p.id_a = ba.id
            JOIN bits bb ON p.id_b = bb.id
        )
        SELECT id_a, id_b, jaccard, full_matches, bit_matches,
               CAST(full_matches AS DOUBLE) / {_MH_H}.0 AS minhash_est,
               2.0 * (CAST(bit_matches AS DOUBLE) / {_MH_H}.0) - 1.0
                   AS bbit_est,
               (2.0 * (CAST(bit_matches AS DOUBLE) / {_MH_H}.0) - 1.0)
                   - jaccard AS bbit_err
        FROM matched
    """,
    doc="b-bit MinHash audit (Li & Koenig 2010, b=1): for every "
    "verified LSH pair, the 1-BIT signature estimate 2*A - 1 (A = "
    "fraction of lanes whose minhash PARITY bits agree — an unbiased "
    "Jaccard estimator when unrelated lanes collide with prob 1/2) "
    "next to the full-lane estimate and the exact Jaccard. The point "
    "of b-bit hashing is state: 1 bit/lane instead of 16 — a 64x "
    "smaller signature for ~sqrt((1+J)/(2J))x more lanes at equal "
    "variance, the right trade for 1e12-document sketch storage. "
    "Parities derive from the lane mins the existing signatures "
    "already carry (last hex nibble % 2, spelled identically in both "
    "engines); the audit adds two id-keyed joins over the verified "
    "pair relation. Read next to dedup_minhash_estimate_error: same "
    "pairs, 16-bit vs 1-bit lanes.",
)
def dedup_minhash_bbit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.dedup import _shared_pairs

    pairs = _shared_pairs(spark, sf_dir)
    # Signatures derive from the SAME shared digest relation the pair
    # pipeline scans (lane mins are order-independent over the set).
    sigs = _persist(
        D.shingle_hs_shared(spark, sf_dir)
        .select(
            F.col("__id").alias("id"),
            D.minhash_signature("__hs", _MH_H).alias("sig"),
        )
        .withColumn(
            "b",
            F.expr(
                f"transform(sig, lane -> (instr('0123456789abcdef', "
                f"substring(lane, {_MH_W}, 1)) - 1) % 2)"
            ),
        )
    )
    full_m = F.expr(
        f"CAST(size(filter(sequence(0, {_MH_H - 1}), "
        f"j -> sa.sig[j] = sb.sig[j])) AS BIGINT)"
    )
    bit_m = F.expr(
        f"CAST(size(filter(sequence(0, {_MH_H - 1}), "
        f"j -> sa.b[j] = sb.b[j])) AS BIGINT)"
    )
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    m = (
        pairs.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            "jaccard",
            full_m.alias("full_matches"),
            bit_m.alias("bit_matches"),
        )
    )
    a_frac = F.col("bit_matches").cast("double") / F.lit(float(_MH_H))
    return m.select(
        "id_a",
        "id_b",
        "jaccard",
        "full_matches",
        "bit_matches",
        (F.col("full_matches").cast("double") / F.lit(float(_MH_H))).alias(
            "minhash_est"
        ),
        (F.lit(2.0) * a_frac - F.lit(1.0)).alias("bbit_est"),
        (F.lit(2.0) * a_frac - F.lit(1.0) - F.col("jaccard")).alias("bbit_err"),
    )


@register(
    "events_activity_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
            FROM events
        ),
        isl AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id
                            ORDER BY d) AS BIGINT) AS island
            FROM days
        ),
        streaks AS (
            SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS n_active_days,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM streaks GROUP BY user_id
    """,
    doc="Per-user activity streaks — the classic GAPS-AND-ISLANDS "
    "pattern: distinct active days per user, islands identified by "
    "the constant (day - row_number) within each consecutive run, "
    "then per-user longest streak / streak count — the engagement "
    "metric behind 'N-day streak' product features and a standard "
    "SQL-interview shape the engine should express natively. One "
    "corpus aggregate to the (user, day) relation; the window "
    "partitions on user_id (corpus-cardinality key, day-bounded "
    "partitions — no skew funnel).",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "island", F.col("d") - F.row_number().over(w).cast("long")
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.max("len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


_MOR_SHARD = 50


@register(
    "scan_mor_position_deletes",
    oracle="""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents WHERE lang <> 'zh'
        GROUP BY lang
    """,
    doc="Merge-on-read positional deletes (the Iceberg/Delta MOR model, "
    "the read-side twin of maintenance_delete_plan's copy-on-write): "
    "a DELETE writes only a (shard, position) delete relation; every "
    "subsequent read anti-joins data positions against it. Here the "
    f"delete file marks lang='zh' rows by (doc_id div {_MOR_SHARD}, "
    "row_number within shard ordered by doc_id), and the MOR read "
    "reconstructs positions the same way and anti-joins — the oracle "
    "is the PLAIN FILTER, so the gate proves the positional "
    "round-trip is semantically exactly DELETE WHERE. Both position "
    "windows partition on the shard key (bounded rows per shard); "
    "the anti-join is shard+position keyed. At scale the positions "
    "come from file row offsets, not a window — the join shape is "
    "identical.",
)
def scan_mor_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn(
        "__shard", F.expr(f"doc_id div {_MOR_SHARD}")
    )
    w = Window.partitionBy("__shard").orderBy("doc_id")
    positioned = _persist(
        docs.withColumn("__pos", F.row_number().over(w).cast("long"))
    )
    delete_file = positioned.where(F.col("lang") == "zh").select(
        "__shard", "__pos"
    )
    mor_read = positioned.join(delete_file, ["__shard", "__pos"], "left_anti")
    return mor_read.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


_CUT_THR = 38  # 60-bit digests: mean inter-frame distance 30, sd ~3.9


@register(
    "multimodal_video_scene_cuts",
    oracle=f"""
        WITH frames AS (
            SELECT doc_id,
                   CAST(idx AS INT) AS frame_idx,
                   md5(text || '|' || CAST(idx AS VARCHAR)) AS frame_digest
            FROM (
                SELECT doc_id, text,
                       unnest(range(0,
                           greatest(1, octet_length(CAST(text AS BLOB)) // 16),
                           10)) AS idx
                FROM documents
            )
        ),
        sigs AS (
            SELECT doc_id, frame_idx,
                   list_reduce(list_transform(range(1, 16),
                       i -> CAST(instr('0123456789abcdef',
                            substring(frame_digest, i, 1)) - 1 AS BIGINT)),
                       (a, b) -> a * 16 + b) AS sig
            FROM frames
        ),
        lagged AS (
            SELECT doc_id, frame_idx, sig,
                   lag(sig) OVER (PARTITION BY doc_id
                                  ORDER BY frame_idx) AS prev_sig
            FROM sigs
        )
        SELECT doc_id, frame_idx,
               CAST(bit_count(xor(sig, prev_sig)) AS BIGINT) AS hamming_prev
        FROM lagged
        WHERE prev_sig IS NOT NULL
          AND bit_count(xor(sig, prev_sig)) >= {_CUT_THR}
    """,
    doc="Video scene-cut detection over the frame-sampling plumbing: "
    "consecutive sampled frames per video compare by the Hamming "
    "distance of their 60-bit frame fingerprints; a jump >= "
    f"{_CUT_THR} bits (mean 30, sd ~3.9 for unrelated frames) marks "
    "a cut — the shot-boundary primitive video curation pipelines "
    "run before per-scene dedup/captioning. The frame DECODE is the "
    "documented deterministic fake (codecs absent in this container "
    "— the real kernel swaps in per PLANS.md realcodec note); "
    "everything Spark-side is real and oracle-checked: mapInPandas "
    "frame emission, per-video lag window (frame-bounded "
    "partitions), fingerprint fold, popcount fence.",
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    frames = sample_frames(docs, id_col="doc_id", binary_col="payload", every_n=10)
    sigs = frames.select(
        "doc_id",
        "frame_idx",
        F.conv(F.substring("frame_digest", 1, 15), 16, 10)
        .cast("long")
        .alias("sig"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagged = sigs.withColumn("prev_sig", F.lag("sig").over(w))
    dist = F.bit_count(F.col("sig").bitwiseXOR(F.col("prev_sig"))).cast("long")
    return (
        lagged.where(F.col("prev_sig").isNotNull())
        .withColumn("hamming_prev", dist)
        .where(F.col("hamming_prev") >= _CUT_THR)
        .select("doc_id", "frame_idx", "hamming_prev")
    )


_GREEDY_HOPS = 3


@register(
    "ann_graph_greedy_search",
    oracle=None,  # composed below (needs the shared kNN CTE)
    doc="Graph-based ANN query (the NSW/HNSW search primitive — "
    "Malkov & Yashunin 2016 — the fourth index paradigm next to the "
    "repo's LSH, IVF and PQ families): greedy best-first walk over "
    "the UNDIRECTED corpus kNN graph — start at a fixed entry point "
    f"(min corpus id), take {_GREEDY_HOPS} hops, each moving to the "
    "neighbor (or staying put) with the best cosine to the query, "
    "ties to the smallest id. Audited in-row against the exact "
    "brute-force top-1: regret = best_cosine - found_cosine and the "
    "hit flag, so the relation IS the search-quality report (greedy "
    "search on a k=5 graph with one entry point plateaus sometimes — "
    "that is the measured trade; production adds beam width and "
    "layers). Each hop is one edge join keyed by the 10 query "
    "cursors + a query-partitioned argmax over degree-bounded "
    "candidate lists; the walk composes the SHARED graph relation "
    "(no rebuild). Oracle unrolls the identical hops.",
)
def ann_graph_greedy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.vectors import dot, l2_norm
    from sql_engine_spark.operators.graph import knn_graph_shared, und_both_dirs, und_edges
    from sql_engine_spark.operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g).where((F.col("a") >= 10) & (F.col("b") >= 10))
    adj = _persist(und_both_dirs(und, out_src="node", out_dst="nb"))
    vq = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        l2_norm("embedding").alias("__qn"),
    )
    vc = _persist(
        emb.where(F.col("vec_id") >= 10).select(
            F.col("vec_id").alias("__cid"),
            F.col("embedding").alias("__cv"),
            l2_norm("embedding").alias("__cn"),
        )
    )

    def scored(cands: DataFrame) -> DataFrame:
        # (query_id, cand) -> + cosine(query, cand)
        return (
            cands.join(vc, cands["cand"] == vc["__cid"])
            .join(F.broadcast(vq), "query_id")
            .select(
                "query_id",
                "cand",
                (dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                    "cosine"
                ),
            )
        )

    entry = vc.agg(F.min("__cid").alias("cand"))
    state = scored(
        vq.select("query_id").crossJoin(F.broadcast(entry))
    ).select("query_id", F.col("cand").alias("cur"), F.col("cosine").alias("cur_cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand"))
    for _ in range(_GREEDY_HOPS):
        # No .distinct() on the candidate list (r12, guide §2.4 remove
        # shuffles outright): adj rows are unique (und_edges dedupes),
        # so duplicates cannot arise — and even if they could, the
        # row_number() == 1 argmax below is insensitive to duplicate
        # candidate rows (ties break to the same (cosine, cand) row).
        # The distinct was one full-width shuffle per hop on a
        # ~60-row relation.
        cands = (
            state.join(adj, state["cur"] == adj["node"])
            .select("query_id", F.col("nb").alias("cand"))
            .unionByName(state.select("query_id", F.col("cur").alias("cand")))
        )
        state = (
            scored(cands)
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(
                "query_id",
                F.col("cand").alias("cur"),
                F.col("cosine").alias("cur_cos"),
            )
        )
    brute1 = (
        brute_force_topk(
            emb.where(F.col("vec_id") < 10),
            emb.where(F.col("vec_id") >= 10),
            id_col="vec_id",
            vec_col="embedding",
            k=1,
        )
        .select(
            "query_id",
            F.col("neighbor_id").alias("brute_id"),
            F.col("cosine").alias("brute_cosine"),
        )
    )
    return state.join(brute1, "query_id").select(
        "query_id",
        F.col("cur").alias("found_id"),
        F.col("cur_cos").alias("found_cosine"),
        "brute_id",
        "brute_cosine",
        (F.col("brute_cosine") - F.col("cur_cos")).alias("regret"),
        (F.col("cur") == F.col("brute_id")).alias("hit"),
    )


def _fix_greedy_oracle() -> None:
    from sql_engine_spark.operators.graph import sql_knn_shared
    from sql_engine_spark.queries.similarity import _BRUTE_ORACLE
    from sql_engine_spark.registry import _REGISTRY

    cos = """
        list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]),
                    (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
    """
    rounds = []
    prev = "s0"
    for r in range(1, _GREEDY_HOPS + 1):
        cur = f"s{r}"
        rounds.append(
            f"""cand_{r} AS (
            SELECT DISTINCT query_id, cand FROM (
                SELECT s.query_id, a.nb AS cand
                FROM {prev} s JOIN adj a ON a.node = s.cur
                UNION ALL
                SELECT query_id, cur AS cand FROM {prev}
            )
        ),
        {cur} AS (
            SELECT query_id, cand AS cur, cosine AS cur_cos FROM (
                SELECT x.query_id, x.cand, {cos} AS cosine,
                       row_number() OVER (PARTITION BY x.query_id
                           ORDER BY {cos} DESC, x.cand) AS rk
                FROM cand_{r} x
                JOIN v c ON c.vec_id = x.cand
                JOIN v q ON q.vec_id = x.query_id
            ) WHERE rk = 1
        )"""
        )
        prev = cur
    rounds_sql = ",\n        ".join(rounds)
    _REGISTRY["ann_graph_greedy_search"].oracle = f"""
        WITH knn AS ({sql_knn_shared()}),
        v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn WHERE src >= 10 AND dst >= 10
        ),
        adj AS (
            SELECT a AS node, b AS nb FROM und
            UNION ALL
            SELECT b AS node, a AS nb FROM und
        ),
        entry AS (SELECT MIN(vec_id) AS eid FROM v WHERE vec_id >= 10),
        s0 AS (
            SELECT q.vec_id AS query_id, e.eid AS cur, {cos} AS cur_cos
            FROM v q CROSS JOIN entry e JOIN v c ON c.vec_id = e.eid
            WHERE q.vec_id < 10
        ),
        {rounds_sql},
        brute AS ({_BRUTE_ORACLE}),
        brute1 AS (
            SELECT query_id, neighbor_id AS brute_id, cosine AS brute_cosine
            FROM brute WHERE rank = 1
        )
        SELECT s.query_id, s.cur AS found_id, s.cur_cos AS found_cosine,
               b.brute_id, b.brute_cosine,
               b.brute_cosine - s.cur_cos AS regret,
               s.cur = b.brute_id AS hit
        FROM {prev} s JOIN brute1 b ON s.query_id = b.query_id
    """


_fix_greedy_oracle()
