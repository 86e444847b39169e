"""Round-7 engine-surface operators: bucketed co-located joins (the
pay-the-shuffle-once layout), GROUPING SETS with grouping flags, a
time-RANGE window frame, deterministic audio VAD segmentation over the
binary-payload plumbing, and a streaming bitmap-distinct matview that
converges exactly to its batch twin.

Reference parity note: the reference engine (dylan-p-wong/sql-engine)
rejects everything beyond single-SELECT (src/planner/mod.rs:202-207)
and has no DDL, window, or streaming surface; these extend SURVEY.md
§2.5's capability matrix.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.registry import _REGISTRY, register

_HEXVAL = "(instr('0123456789abcdef', {ch}) - 1)"


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc="Co-located bucketed join: orders and lineitem are WRITTEN as "
    "hash-bucketed, bucket-sorted tables on the join key (8 buckets, "
    "one file per bucket, sinks.write_bucketed), then sort-merge-"
    "joined with ZERO Exchange nodes — the pre-shuffled layout every "
    "warehouse uses for fact tables joined repeatedly: at 100 TB the "
    "join shuffle is paid ONCE at ingest, and every subsequent join "
    "(this one included) moves nothing across the network; the "
    "remaining per-task Sorts are narrow in-bucket sorts (Spark's "
    "scan does not propagate the written sort order), spill-bounded "
    "by bucket size. The oracle is the plain parquet join — same "
    "answer, different physical plan; a plan-shape test pins the "
    "absent exchanges. Table names carry the dataset tag so "
    "concurrent scale factors never collide.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.sinks import write_bucketed

    tag = re.sub(r"\W", "_", os.path.basename(os.path.normpath(sf_dir)))
    t_o, t_l = f"r7_bkt_orders_{tag}", f"r7_bkt_lineitem_{tag}"
    # Relative table paths resolve under spark.sql.warehouse.dir.
    wh = "r7_bucketed"
    # Pre-repartition to the bucket layout so each bucket lands in ONE
    # file: Spark only elides the join-side Sorts on bucket-SORTED scans
    # when files-per-bucket == 1 (multi-file buckets force a merge sort).
    write_bucketed(
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .repartition(8, "o_orderkey"),
        t_o,
        os.path.join(wh, t_o),
        bucket_by=["o_orderkey"],
        num_buckets=8,
        sort_by=["o_orderkey"],
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(8, "l_orderkey"),
        t_l,
        os.path.join(wh, t_l),
        bucket_by=["l_orderkey"],
        num_buckets=8,
        sort_by=["l_orderkey"],
    )
    o = spark.table(t_o)
    li = spark.table(t_l)
    # The merge hint keeps Catalyst from broadcasting the (locally tiny)
    # orders side: the point is the bucketed SortMergeJoin with no
    # Exchange and no Sort — at 100 TB neither side broadcasts anyway.
    return (
        o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "agg_grouping_sets_id",
    oracle=f"""
        SELECT lang, source,
               CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_dsum('CAST(n_chars AS DOUBLE)')} AS total_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())
    """,
    doc="GROUPING SETS with grouping flags: per-lang totals, per-source "
    "totals, and the grand total in ONE pass — the exact-slice "
    "companion to rollup_agg/cube_agg (a rollup implies the nesting "
    "lang > source; grouping sets states the two independent slices "
    "explicitly, which is what report generators actually want). "
    "GROUPING(col) disambiguates 'NULL because aggregated away' from "
    "a NULL data value — without it the grand-total row is "
    "indistinguishable from a null-lang group. Spark expands the sets "
    "into one Expand + one hash aggregate (map-side combinable, no "
    "extra scan per set); sums through DECIMAL.",
)
def agg_grouping_sets_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.numeric import dsum

    docs = load(spark, sf_dir, "documents")
    return docs.groupingSets([["lang"], ["source"], []], "lang", "source").agg(
        F.grouping("lang").cast("long").alias("g_lang"),
        F.grouping("source").cast("long").alias("g_source"),
        F.count("*").cast("long").alias("n_docs"),
        dsum(F.col("n_chars").cast("double")).alias("total_chars"),
    )


_RANGE_S = 3600


@register(
    "window_range_1h",
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id,
                   epoch_us(ts) // 1000000 AS es,
                   value
            FROM events
        )
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
                   AS sum_value_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY es
                     RANGE BETWEEN {_RANGE_S} PRECEDING AND CURRENT ROW)
    """,
    doc="Time-RANGE window frame: per event, the count and value sum of "
    "the SAME USER's events in the trailing hour — the value-based "
    "frame (RANGE BETWEEN 3600 PRECEDING on epoch seconds) that ROWS "
    "frames cannot express when event spacing is irregular (a ROWS "
    "frame counts rows, not time). Epochs are computed tz-free "
    "(timestampdiff from the NTZ epoch / epoch_us div — both floor), "
    "and the in-frame value sum goes through DECIMAL so frame-"
    "iteration order cannot move the double. The window partitions on "
    "user_id — corpus-cardinality key, frames bounded by per-user "
    "hourly activity.",
)
def window_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        .cast("long")
        .alias("es"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-_RANGE_S, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("sum_value_1h"),
    )


_VAD_FRAME_B64 = 64  # base64 chars of payload per PCM frame


def _vad_frames_sql(b64: str, frame_expr: str) -> str:
    """Frame 'energy nibble' >= 8 = voice: first hex digit of
    md5(payload-digest || '-' || frame). Deterministic fake PCM — the
    container has no soundfile (see operators/multimodal), so the
    energy values are derived, but every Spark-side shape (frame
    explode, per-file windows, island segmentation) is the real
    pipeline."""
    digest = f"md5({b64})"
    h = f"md5(concat({digest}, '-', CAST({frame_expr} AS VARCHAR)))"
    return f"({_HEXVAL.format(ch=f'substring({h}, 1, 1)')}) >= 8"


@register(
    "multimodal_audio_vad",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, to_base64(CAST(text AS BLOB)) AS b64
            FROM documents
        ),
        frames AS (
            SELECT doc_id,
                   unnest(range(1, CAST(ceil(length(b64) / {_VAD_FRAME_B64}.0)
                                        AS BIGINT) + 1)) AS f
            FROM p
        ),
        voiced AS (
            SELECT fr.doc_id, fr.f,
                   {_vad_frames_sql('p.b64', 'fr.f')} AS voice
            FROM frames fr JOIN p USING (doc_id)
        ),
        islands AS (
            SELECT doc_id, f,
                   f - row_number() OVER (PARTITION BY doc_id ORDER BY f)
                       AS grp
            FROM voiced WHERE voice
        ),
        runs AS (
            SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS run_len
            FROM islands GROUP BY doc_id, grp
        ),
        tot AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(SUM(CASE WHEN voice THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_voice
            FROM voiced GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_frames, t.n_voice,
               CAST(COALESCE(COUNT(r.grp), 0) AS BIGINT) AS n_segments,
               CAST(COALESCE(MAX(r.run_len), 0) AS BIGINT) AS longest_run
        FROM tot t LEFT JOIN runs r USING (doc_id)
        GROUP BY t.doc_id, t.n_frames, t.n_voice
    """,
    doc="Voice-activity segmentation over binary audio payloads: frame "
    "the payload, threshold per-frame energy, and report voiced-"
    "segment count + longest run per file via gaps-and-islands — the "
    "speech-data curation primitive (silence trimming, segment-level "
    "sampling). The decode is the documented deterministic fake "
    "(operators/multimodal: no soundfile in this container; energies "
    "derive from the payload digest identically in both engines), but "
    "the Spark-side plumbing is the real shape: binary column in, "
    "frame explode bounded by payload size, PER-FILE island windows "
    "(frames per file are bounded, so the window partition never "
    "funnels the corpus), two bounded aggregates out.",
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.multimodal import with_binary_payload

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    b64 = "regexp_replace(base64(payload), '[\\r\\n]', '')"
    p = docs.select(
        "doc_id",
        F.expr(b64).alias("__b64"),
        F.expr(f"md5({b64})").alias("__pd"),
    )
    frames = p.select(
        "doc_id",
        "__pd",
        F.explode(
            F.expr(
                f"sequence(1, CAST(ceil(length(__b64) / {_VAD_FRAME_B64}.0) "
                f"AS BIGINT))"
            )
        ).alias("f"),
    )
    hx = _HEXVAL.format(
        ch="substring(md5(concat(__pd, '-', CAST(f AS STRING))), 1, 1)"
    )
    voiced = frames.select(
        "doc_id", "f", F.expr(f"({hx}) >= 8").alias("voice")
    )
    w = Window.partitionBy("doc_id").orderBy("f")
    islands = voiced.where("voice").select(
        "doc_id", "f", (F.col("f") - F.row_number().over(w)).alias("grp")
    )
    runs = islands.groupBy("doc_id", "grp").agg(
        F.count("*").cast("long").alias("run_len")
    )
    tot = voiced.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum(F.when(F.col("voice"), 1).otherwise(0)).cast("long").alias("n_voice"),
    )
    return (
        tot.join(runs, "doc_id", "left")
        .groupBy("doc_id", "n_frames", "n_voice")
        .agg(
            F.coalesce(F.count("grp"), F.lit(0)).cast("long").alias("n_segments"),
            F.coalesce(F.max("run_len"), F.lit(0)).cast("long").alias(
                "longest_run"
            ),
        )
    )


@register(
    "streaming_bitmap_distinct",
    oracle=None,  # spliced below: the batch bitmap-distinct oracle
    doc="Streaming exact distinct-user counts per event type via the "
    "word-bitmap aggregate maintained through the idempotent matview: "
    "per batch, (type, user div 64) words with bit_or bits; merge = "
    "bit_or again — IDEMPOTENT and associative, so replayed batches "
    "and shard-merges are free, which is exactly why the bitmap "
    "spelling (agg_bitmap_exact_distinct) beats COUNT(DISTINCT) as "
    "streaming state: per-type-and-word state is O(active id range / "
    "64), per-trigger cost O(batch)+O(view), and the drained view's "
    "popcount-sum converges EXACTLY to the batch oracle.",
)
def streaming_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    # Drained via the shared replay fleet (streaming/fleet.py, r8
    # verdict #7); the spec below registers at import.
    view = fleet_view(spark, sf_dir, "bitmap_distinct")
    return (
        view.read(spark)
        .groupBy("event_type")
        .agg(F.sum(F.bit_count("bits")).cast("long").alias("n_users"))
    )


def _bitmap_partial(b: DataFrame) -> DataFrame:
    return b.groupBy(
        "event_type", (F.col("user_id") / 64).cast("long").alias("w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT)))"
        ).alias("bits")
    )


def _bitmap_combine(cur: DataFrame, partial: DataFrame) -> DataFrame:
    return (
        cur.unionByName(partial)
        .groupBy("event_type", "w")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def _register_bitmap_fleet() -> None:
    from sql_engine_spark.streaming.fleet import register_fleet_view

    register_fleet_view(
        "bitmap_distinct", partial_of=_bitmap_partial, combine=_bitmap_combine
    )


_register_bitmap_fleet()


_REGISTRY["streaming_bitmap_distinct"].oracle = _REGISTRY[
    "agg_bitmap_exact_distinct"
].oracle
