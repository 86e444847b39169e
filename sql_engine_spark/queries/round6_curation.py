"""Round-6 curation & text operators: target-mixture reweighting,
lexical diversity, co-occurrence lift, parquet-footer layout audits,
and a streaming change-point monitor.

Everything stays log-free and engine-exact: integer counting, single
shared-order double divisions, and (for the streaming twin) the
idempotent-matview replay that converges bit-exactly to its batch
oracle. The reference engine (dylan-p-wong/sql-engine) has none of
this surface; these extend the LLM-data-pipeline family of SURVEY.md
§2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import TABLES, load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register


@register(
    "curation_mixture_reweight",
    oracle="""
        WITH s AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS src_bytes
            FROM documents GROUP BY source
        ),
        t AS (
            SELECT CAST(SUM(src_bytes) AS BIGINT) AS total_bytes,
                   CAST(COUNT(*) AS BIGINT) AS n_sources
            FROM s
        )
        SELECT source, n_docs, src_bytes,
               CAST(src_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE)
                   AS current_share,
               CAST(total_bytes AS DOUBLE)
                   / CAST(n_sources * src_bytes AS DOUBLE) AS sample_weight
        FROM s CROSS JOIN t
    """,
    doc="Target-mixture reweighting: per-source sampling weights that "
    "move the corpus byte mixture to the UNIFORM target — weight = "
    "target_share / current_share = total / (n_sources * src_bytes), "
    "the knob every pretraining mixture spec turns (the DoReMi / "
    "Pile-style domain-weight baseline before learned weights). Pure "
    "integer aggregation (one bounded per-source pass) with two "
    "shared-order double divisions at the end; applying the weights "
    "is the existing curation_mixture_sample/importance machinery.",
)
def curation_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("src_bytes"),
    )
    t = s.agg(
        F.sum("src_bytes").cast("long").alias("total_bytes"),
        F.count("*").cast("long").alias("n_sources"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "src_bytes",
        (
            F.col("src_bytes").cast("double") / F.col("total_bytes").cast("double")
        ).alias("current_share"),
        (
            F.col("total_bytes").cast("double")
            / (F.col("n_sources") * F.col("src_bytes")).cast("double")
        ).alias("sample_weight"),
    )


@register(
    "text_lexical_diversity",
    oracle=f"""
        WITH wc AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
            GROUP BY doc_id, w
        ),
        d AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax,
                   CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs
            FROM wc GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_types,
               CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
               CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_ratio,
               CASE WHEN n_tokens < 2 THEN NULL
                    ELSE CAST(rep_pairs AS DOUBLE)
                         / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
               END AS simpson_repeat
        FROM d
    """,
    doc="Per-document lexical diversity: type-token ratio, hapax ratio, "
    "and the Simpson repeat probability sum c(c-1)/(n(n-1)) — the "
    "log-free diversity triple (Shannon entropy needs libm log, which "
    "is not cross-engine bit-stable; Simpson's index is an exact "
    "rational). Low TTR + high repeat probability is the boilerplate/"
    "template-spam signature text_repetition catches at the n-gram "
    "level — this is the word-level complement. One tokenize + one "
    "(doc, word) count + one per-doc aggregate; all integers until "
    "three final shared-order divisions.",
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    d = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias(
            "n_hapax"
        ),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("rep_pairs"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / F.col("n_tokens").cast("double")).alias(
            "ttr"
        ),
        (F.col("n_hapax").cast("double") / F.col("n_types").cast("double")).alias(
            "hapax_ratio"
        ),
        F.when(
            F.col("n_tokens") >= 2,
            F.col("rep_pairs").cast("double")
            / (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double"),
        ).alias("simpson_repeat"),
    )


_COOC_TOPW = 20
_COOC_MIN_DF = 3


@register(
    "text_cooccurrence_lift",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, unnest({sql_tokens('text')}) AS w FROM documents
        ),
        cnt AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w
            WHERE w <> '' GROUP BY w
        ),
        tw AS (
            SELECT w FROM (
                SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rk
                FROM cnt
            ) WHERE rk <= {_COOC_TOPW}
        ),
        dw AS (
            SELECT DISTINCT doc_id, w FROM w
            WHERE w IN (SELECT w FROM tw)
        ),
        df AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dw GROUP BY w
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        pairs AS (
            SELECT a.w AS w_a, b.w AS w_b, CAST(COUNT(*) AS BIGINT) AS df_ab
            FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
            GROUP BY a.w, b.w
        )
        SELECT w_a, w_b, df_ab,
               CAST(df_ab * n.n AS DOUBLE)
                   / CAST(fa.df * fb.df AS DOUBLE) AS lift
        FROM pairs
        JOIN df fa ON w_a = fa.w
        JOIN df fb ON w_b = fb.w
        CROSS JOIN n
        WHERE df_ab >= {_COOC_MIN_DF}
    """,
    doc="Word co-occurrence LIFT over the top-20 corpus words: "
    "lift(a,b) = N * df(a,b) / (df(a) * df(b)) — the log-free PMI "
    "surrogate (PMI = log2(lift); the ordering is identical and the "
    "ratio is an exact single division, so the oracle hashes). The "
    "pair join is restricted to the TOP-K vocabulary, so the per-doc "
    "self-join fan-out is bounded by C(20,2) regardless of corpus "
    "size; document frequencies are distinct-presence counts, all "
    "exact integers. The topical-association signal feeding phrase "
    "mining and near-duplicate template detection.",
)
def text_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = _persist(
        docs.select("doc_id", F.explode(tokens("text")).alias("w")).where(
            F.col("w") != ""
        )
    )
    cnt = w.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    from pyspark.sql import Window

    tw = (
        cnt.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))),
        )
        .where(F.col("rk") <= _COOC_TOPW)
        .select("w")
    )
    dw = _persist(w.join(F.broadcast(tw), "w").select("doc_id", "w").distinct())
    df = dw.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").cast("long").alias("n"))
    a = dw.alias("a")
    b = dw.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w_a"), F.col("b.w").alias("w_b"))
        .agg(F.count("*").cast("long").alias("df_ab"))
        .where(F.col("df_ab") >= _COOC_MIN_DF)
    )
    fa = df.select(F.col("w").alias("w_a"), F.col("df").alias("df_a"))
    fb = df.select(F.col("w").alias("w_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(fa), "w_a")
        .join(F.broadcast(fb), "w_b")
        .crossJoin(F.broadcast(n))
        .select(
            "w_a",
            "w_b",
            "df_ab",
            (
                (F.col("df_ab") * F.col("n")).cast("double")
                / (F.col("df_a") * F.col("df_b")).cast("double")
            ).alias("lift"),
        )
    )


def _footer_stats_oracle(sf_dir: str) -> str:
    """Callable oracle: per-table parquet layout stats straight from
    DuckDB's parquet_metadata() (one row per column chunk — fold to
    distinct row groups first). The SQL is deterministic per sf-dir."""
    parts = []
    for t in TABLES:
        parts.append(f"""
        SELECT '{t}' AS table_name, n_row_groups, n_rows,
               min_rg_rows, max_rg_rows,
               CAST(n_rows AS DOUBLE) / CAST(n_row_groups AS DOUBLE)
                   AS rows_per_group
        FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_row_groups,
                   CAST(SUM(rg_rows) AS BIGINT) AS n_rows,
                   CAST(MIN(rg_rows) AS BIGINT) AS min_rg_rows,
                   CAST(MAX(rg_rows) AS BIGINT) AS max_rg_rows
            FROM (
                SELECT DISTINCT row_group_id,
                       row_group_num_rows AS rg_rows
                FROM parquet_metadata('{sf_dir}/{t}.parquet')
            )
        )""")
    return " UNION ALL ".join(parts)


@register(
    "scan_footer_stats",
    oracle=_footer_stats_oracle,
    doc="Table-layout audit from parquet FOOTERS: per table, row-group "
    "count, total rows, min/max/avg rows per row group — the metadata "
    "a compaction planner (Delta OPTIMIZE, Iceberg rewrite_data_files) "
    "reads before deciding what to rewrite, and the direct input to "
    "maxPartitionBytes tuning. Footer metadata is read DRIVER-SIDE "
    "with pyarrow (zero row reads, no Spark job — the zonemap "
    "discipline, operators/zonemap.py); at 100k files this is a "
    "~100k-row metadata relation, never a data scan. Oracle is a "
    "callable rendering DuckDB's parquet_metadata() for the same "
    "files.",
)
def scan_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for t in TABLES:
        md = pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata
        rg = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        rows.append(
            (
                t,
                md.num_row_groups,
                sum(rg),
                min(rg),
                max(rg),
                float(sum(rg)) / float(md.num_row_groups),
            )
        )
    return spark.createDataFrame(
        rows,
        "table_name string, n_row_groups long, n_rows long, "
        "min_rg_rows long, max_rg_rows long, rows_per_group double",
    )


@register(
    "streaming_cusum_alarm",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM daily
        ),
        c AS (
            SELECT day, cnt,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rk,
                   CAST(SUM(cnt) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM daily
        ),
        s AS (
            SELECT day, cnt, d * cum - rk * n AS dev_scaled
            FROM c CROSS JOIN tot
        )
        SELECT day, cnt, dev_scaled,
               abs(dev_scaled) = MAX(abs(dev_scaled)) OVER () AS is_changepoint
        FROM s
    """,
    doc="Streaming change-point monitor: the per-day count relation is "
    "maintained across event micro-batches through the idempotent "
    "matview (counts merge by addition), and the exact integer CUSUM "
    "split statistic of events_changepoint_cusum runs over the "
    "drained view — converging EXACTLY to the batch answer since "
    "dev_scaled is a pure function of the final day counts. View "
    "state is calendar-sized; per-trigger cost O(batch) + O(view).",
)
def streaming_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window

    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.matview import IdempotentMatView
    from sql_engine_spark.streaming.source import table_stream

    view = IdempotentMatView(
        tempfile.mkdtemp(prefix="cusum_view_"),
        partial_of=lambda b: (
            b.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
                F.count("*").cast("long").alias("cnt")
            )
        ),
        combine=lambda cur, partial: (
            cur.unionByName(partial)
            .groupBy("day")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        ),
    )
    with _state_partitions(spark):
        stream = table_stream(spark, sf_dir, "events", ["event_id"], 4)
        q = (
            stream.select("ts")
            .writeStream.outputMode("append")
            .foreachBatch(view.merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    daily = view.read(spark)
    tot = daily.agg(
        F.sum("cnt").cast("long").alias("n"), F.count("*").cast("long").alias("d")
    )
    w = Window.orderBy("day")
    c = daily.select(
        "day",
        "cnt",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    )
    s = c.crossJoin(F.broadcast(tot)).select(
        "day",
        "cnt",
        (F.col("d") * F.col("cum") - F.col("rk") * F.col("n")).alias("dev_scaled"),
    )
    wmax = Window.partitionBy()
    return s.select(
        "day",
        "cnt",
        "dev_scaled",
        (F.abs("dev_scaled") == F.max(F.abs("dev_scaled")).over(wmax)).alias(
            "is_changepoint"
        ),
    )
