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
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", **_MINHASH_PARAMS)
    sigs = _persist(
        docs.withColumn("__t", tokens("text"))
        .select(
            F.col("doc_id").alias("id"),
            F.array_distinct(shingles("__t", _MH_K)).alias("__shset"),
        )
        .select(
            "id",
            D.minhash_signature(
                "transform(__shset, s -> md5(s))", _MH_H
            ).alias("sig"),
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
