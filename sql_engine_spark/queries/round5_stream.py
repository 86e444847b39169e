"""Round-5 streaming operators: deterministic reservoir, stateful EWMA,
matview-maintained histogram and source-drift monitors.

Split from queries/round5.py along domain lines (round-6 refactor);
semantics, registry keys, and oracles unchanged.
"""



from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.text import hashed_linear_score, sql_hashed_linear_score
from sql_engine_spark.registry import register
from sql_engine_spark.queries.round5_events import _EWMA_W, _HIST_BINS, _HIST_HI, _HIST_LO  # noqa: F401
from sql_engine_spark.queries.round5_curation import _RESERVOIR_K  # noqa: F401
from sql_engine_spark.operators.textprep import shingles, sql_shingles, sql_tokens, tokens  # noqa: F401,E501


@register(
    "streaming_reservoir_sample",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, lang,
                   md5('rsv1|' || CAST(doc_id AS VARCHAR)) AS hkey
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang, hkey,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY hkey, doc_id) AS BIGINT)
                       AS rank
            FROM h
        )
        SELECT doc_id, lang, hkey, rank FROM r WHERE rank <= {_RESERVOIR_K}
    """,
    doc="Streaming bottom-k-hash reservoir per language, maintained "
    "incrementally across micro-batches through the idempotent "
    "materialized view (streaming/matview.py): each batch contributes "
    "its own bottom-k, the merge keeps the k smallest of view+batch — "
    "legal precisely because bottom-k sketches are MERGEABLE (the "
    "property pinned in tests/test_r5_ops.py), so the drained stream "
    "converges to the batch reservoir EXACTLY (same oracle as "
    "sample_reservoir_per_key). View state is langs x k rows; "
    "per-trigger cost O(batch) + O(view). Maintained by the shared "
    "documents replay fleet (streaming/fleet.py): one ingest stream "
    "updates every documents-sourced view, per-view state untouched.",
)
def streaming_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_reservoir_sample")
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return view.read(spark).withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def _rsv_bottom_k(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= _RESERVOIR_K)
        .select("doc_id", "lang", "hkey")
    )


from sql_engine_spark.streaming.fleet import register_fleet_view  # noqa: E402

register_fleet_view(
    "streaming_reservoir_sample",
    table="documents",
    partial_of=lambda b: _rsv_bottom_k(
        b.select(
            "doc_id",
            "lang",
            F.md5(
                F.concat(F.lit("rsv1|"), F.col("doc_id").cast("string"))
            ).alias("hkey"),
        )
    ),
    combine=lambda cur, partial: _rsv_bottom_k(cur.unionByName(partial)),
)


@register(
    "streaming_ewma_half",
    oracle=f"""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM events
        )
        SELECT event_id, user_id, ts,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                           (a, x) -> a * 0.5 + x)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(vals, x -> CAST(1.0 AS DOUBLE))),
                           (a, x) -> a * 0.5 + x) AS ewma
        FROM w
    """,
    doc="Streaming per-user EWMA (streaming/ewma.py): the batch "
    "events_ewma_half window maintained ONLINE across micro-batches — "
    "state per user is the trailing 15 readings (constant size, "
    "sharded by user), every batch emits its events' smoothed values "
    "immediately. The fold is the IDENTICAL JVM "
    "aggregate(collect_list(value) OVER ...) halving expression as the "
    "batch query over (carried state UNION batch), so the drained "
    "stream converges to the batch window — and the batch oracle — "
    "BIT-exactly. Runs on the exactly-once foreachBatch batch-state "
    "runner (streaming/batchstate.py): zero Python in the row path "
    "(the retired pandas-state spelling paid the measured ~7x Arrow "
    "floor of scripts/pandas_state_floor.py on every emitted row).",
)
def streaming_ewma_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: the events replay is drained ONCE per (process, dataset) by
    # the batch-state fleet (streaming/batchstate.py) — this twin and
    # streaming_asof_enrich paid separate availableNow scheduler +
    # 4-trigger replays over the IDENTICAL source. Per-view exactly-once
    # state protocol unchanged; drain cost priced in shared_builds.
    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.batchstate import batchstate_fleet_view

    with _state_partitions(spark):
        res = batchstate_fleet_view(spark, sf_dir, "ewma_half")
    return res.select("event_id", "user_id", "ts", "ewma")


def _register_ewma_fleet_spec() -> None:
    from sql_engine_spark.queries.streaming import N_CHUNKS
    from sql_engine_spark.streaming.batchstate import register_batchstate_view
    from sql_engine_spark.streaming.ewma import ewma_batchstate_step

    register_batchstate_view(
        "ewma_half",
        table="events",
        order_cols=["ts", "event_id"],
        n_chunks=N_CHUNKS,
        make_step=lambda: ewma_batchstate_step(_EWMA_W),
    )


_register_ewma_fleet_spec()


@register(
    "streaming_histogram",
    oracle=f"""
        SELECT event_type,
               CAST(least(FLOOR((value - {_HIST_LO})
                          * {_HIST_BINS} / ({_HIST_HI} - {_HIST_LO})),
                          {_HIST_BINS - 1}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE value >= {_HIST_LO} AND value <= {_HIST_HI}
        GROUP BY 1, 2
    """,
    doc="Streaming histogram: the fixed-bin value histogram maintained "
    "incrementally across micro-batches through the idempotent "
    "materialized view (streaming/matview.py) — per-batch partial bin "
    "counts merge by addition (counts are a trivially mergeable "
    "sketch), view state is (type x bins) rows, per-trigger cost "
    "O(batch)+O(view). Converges exactly to the one-shot batch "
    "histogram (agg_histogram_fixed_bins' counting side), retry-safe "
    "under foreachBatch's at-least-once redelivery. Maintained by the "
    "shared events replay fleet (streaming/fleet.py): one ingest "
    "stream updates every events-sourced view, per-view state "
    "untouched; bin counts are batch-composition-insensitive.",
)
def streaming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_histogram")
    return view.read(spark).select("event_type", "bin", "n")


def _hist_bin_col() -> F.Column:
    return F.least(
        F.floor(
            (F.col("value") - F.lit(_HIST_LO))
            * F.lit(_HIST_BINS)
            / F.lit(_HIST_HI - _HIST_LO)
        ),
        F.lit(_HIST_BINS - 1),
    ).cast("long")


register_fleet_view(
    "streaming_histogram",
    table="events",
    partial_of=lambda b: (
        b.where((F.col("value") >= _HIST_LO) & (F.col("value") <= _HIST_HI))
        .groupBy("event_type", _hist_bin_col().alias("bin"))
        .agg(F.count("*").cast("long").alias("n"))
    ),
    combine=lambda cur, partial: (
        cur.unionByName(partial)
        .groupBy("event_type", "bin")
        .agg(F.sum("n").cast("long").alias("n"))
    ),
)


@register(
    "streaming_source_drift",
    oracle=f"""
        WITH toks AS (
            SELECT source, w
            FROM (SELECT source, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        per_source AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS nsw
            FROM toks GROUP BY source, w
        ),
        source_totals AS (
            SELECT source, CAST(SUM(nsw) AS BIGINT) AS ns
            FROM per_source GROUP BY source
        ),
        corpus AS (
            SELECT w, CAST(SUM(nsw) AS BIGINT) AS nw FROM per_source GROUP BY w
        ),
        corpus_total AS (SELECT CAST(SUM(nw) AS BIGINT) AS n FROM corpus),
        sums AS (
            SELECT s.source, t.ns, ct.n,
                   SUM(abs(CAST(s.nsw AS DECIMAL(19,0)) * CAST(ct.n AS DECIMAL(19,0))
                           - CAST(c.nw AS DECIMAL(19,0)) * CAST(t.ns AS DECIMAL(19,0))))
                       AS a,
                   CAST(SUM(c.nw) AS BIGINT) AS b
            FROM per_source s
            JOIN source_totals t USING (source)
            JOIN corpus c USING (w)
            CROSS JOIN corpus_total ct
            GROUP BY s.source, t.ns, ct.n
        )
        SELECT source, ns AS n_tokens,
               CAST(a AS DOUBLE)
                   / (2.0 * CAST(ns AS DOUBLE) * CAST(n AS DOUBLE))
               + (1.0 - CAST(b AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0
                   AS tv_distance
        FROM sums
    """,
    doc="Streaming drift monitor: the per-(source, word) count relation "
    "is maintained across document micro-batches through the "
    "idempotent matview (counts merge by addition — the same "
    "mergeable-sketch argument as streaming_histogram), and the "
    "total-variation computation of text_source_drift_tv runs over "
    "the drained view — converging EXACTLY to the batch TV since the "
    "exact-integer sums are a pure function of the final counts. "
    "View state is vocabulary-sized; per-trigger cost O(batch) + "
    "O(view). Maintained by the shared documents replay fleet "
    "(streaming/fleet.py); per-view state untouched.",
)
def streaming_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_source_drift")
    per_source = view.read(spark)
    source_totals = per_source.groupBy("source").agg(
        F.sum("nsw").cast("long").alias("ns")
    )
    corpus = per_source.groupBy("w").agg(F.sum("nsw").cast("long").alias("nw"))
    corpus_total = corpus.agg(F.sum("nw").cast("long").alias("n"))
    D19 = "decimal(19,0)"
    term = F.abs(
        F.col("nsw").cast(D19) * F.col("n").cast(D19)
        - F.col("nw").cast(D19) * F.col("ns").cast(D19)
    )
    sums = (
        per_source.join(source_totals, "source")
        .join(corpus, "w")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source", "ns", "n")
        .agg(F.sum(term).alias("a"), F.sum("nw").cast("long").alias("b"))
    )
    return sums.select(
        "source",
        F.col("ns").alias("n_tokens"),
        (
            F.col("a").cast("double")
            / (2.0 * F.col("ns").cast("double") * F.col("n").cast("double"))
            + (1.0 - F.col("b").cast("double") / F.col("n").cast("double")) / 2.0
        ).alias("tv_distance"),
    )


register_fleet_view(
    "streaming_source_drift",
    table="documents",
    partial_of=lambda b: (
        b.select("source", F.explode(tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("nsw"))
    ),
    combine=lambda cur, partial: (
        cur.unionByName(partial)
        .groupBy("source", "w")
        .agg(F.sum("nsw").cast("long").alias("nsw"))
    ),
)
