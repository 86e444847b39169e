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
    # Top-K vocabulary through the salted two-level rank (r11 window
    # sweep): word TYPES grow with the corpus (Heaps), so a bare global
    # row_number would funnel a corpus-growing relation through one
    # task. Bit-identical to the single-window spelling.
    from sql_engine_spark.operators.similarity import two_level_topk

    tw = two_level_topk(
        cnt.withColumn("__q", F.lit(1)),
        score_col="c",
        k=_COOC_TOPW,
        rank_col="rk",
        query_col="__q",
        id_col="w",
    ).select("w")
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
    "state is calendar-sized; per-trigger cost O(batch) + O(view). "
    "Maintained by the shared events replay fleet (streaming/"
    "fleet.py); per-view state untouched.",
)
def streaming_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_cusum_alarm")
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


from sql_engine_spark.streaming.fleet import register_fleet_view  # noqa: E402

register_fleet_view(
    "streaming_cusum_alarm",
    table="events",
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


# --- manual HyperLogLog -----------------------------------------------------
# Cross-engine hex-digit value: instr('0123456789abcdef', ch) - 1 runs
# unchanged in Spark SQL and DuckDB (the SimHash voting primitive,
# operators/dedup.py:_HEX_BIT_SETS).
_HEXVAL = "(instr('0123456789abcdef', {ch}) - 1)"

_HLL_M = 64  # 2^6 buckets
_HLL_SPAN = 13  # hex digits scanned for the leading-zero count (52 bits)
_HLL_RMAX = 4 * _HLL_SPAN + 1  # rho when all scanned bits are zero


def _sql_hll_parts(h: str) -> tuple[str, str]:
    """(bucket, rho) expressions over an md5-hex column `h` — identical
    text in both engines. Bucket = first 8 bits mod 64; rho = 1-based
    position of the first set bit in the next 52 bits, computed with
    string ops (TRIM(LEADING '0')) and integer compares — no log2."""
    d0 = _HEXVAL.format(ch=f"substring({h}, 1, 1)")
    d1 = _HEXVAL.format(ch=f"substring({h}, 2, 1)")
    bucket = f"(({d0} * 16 + {d1}) % {_HLL_M})"
    tail = f"substring({h}, 3, {_HLL_SPAN})"
    stripped = f"trim(LEADING '0' FROM {tail})"
    zeros = f"({_HLL_SPAN} - length({stripped}))"
    first = _HEXVAL.format(ch=f"substring({stripped}, 1, 1)")
    rho = (
        f"(CASE WHEN length({stripped}) = 0 THEN {_HLL_RMAX} "
        f"ELSE {zeros} * 4 + (CASE WHEN {first} >= 8 THEN 1 "
        f"WHEN {first} >= 4 THEN 2 WHEN {first} >= 2 THEN 3 ELSE 4 END) END)"
    )
    return bucket, rho


_HLL_ALPHA = "(0.7213 / (1.0 + 1.079 / 64.0))"
_HLL_P53 = 9007199254740992.0  # 2^53


def _hll_oracle() -> str:
    bucket, rho = _sql_hll_parts("h")
    return f"""
        WITH hx AS (
            SELECT DISTINCT lang, md5(text) AS h FROM documents
        ),
        br AS (
            SELECT lang, {bucket} AS bucket, {rho} AS rho FROM hx
        ),
        regs AS (
            SELECT lang, bucket, CAST(MAX(rho) AS BIGINT) AS r
            FROM br GROUP BY lang, bucket
        ),
        z AS (
            SELECT lang,
                   CAST(SUM(1::BIGINT << (53 - r)) AS BIGINT)
                       + ({_HLL_M} - CAST(COUNT(*) AS BIGINT))
                         * (1::BIGINT << 53) AS z_num
            FROM regs GROUP BY lang
        ),
        exact AS (
            SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact
            FROM documents GROUP BY lang
        )
        SELECT lang, n_exact,
               ({_HLL_ALPHA} * 4096.0) * {_HLL_P53}
                   / CAST(z_num AS DOUBLE) AS hll_estimate,
               (({_HLL_ALPHA} * 4096.0) * {_HLL_P53} / CAST(z_num AS DOUBLE))
                   / CAST(n_exact AS DOUBLE) AS est_over_exact
        FROM exact JOIN z USING (lang)
    """


@register(
    "approx_hll_manual",
    oracle=_hll_oracle(),
    doc="HyperLogLog from first principles (Flajolet et al. 2007), "
    "bit-identical in BOTH engines — unlike approx_hll_mergeable_"
    "rollup (engine sketch + tolerance claim), every intermediate here "
    "is shared arithmetic so the ESTIMATE ITSELF is oracle-hashed: "
    "md5 buckets (first 8 bits mod 64), rho from the next 52 bits via "
    "TRIM(LEADING '0') + integer compares (no log2 anywhere), "
    "registers = per-(lang, bucket) MAX rho (order-free, mergeable — "
    "the whole point of HLL at 100 TB), and the raw estimator "
    "alpha*m^2/Z with Z as an EXACT scaled integer (sum of "
    "1<<(53-rho), empty buckets contributing 1<<53). Raw estimator by "
    "design — the small-range linear-counting correction needs libm "
    "log and is deliberately omitted; est_over_exact documents the "
    "resulting bias against the exact NDV.",
)
def approx_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket, rho = _sql_hll_parts("h")
    hx = docs.select("lang", F.md5("text").alias("h")).distinct()
    br = hx.select(
        "lang", F.expr(bucket).alias("bucket"), F.expr(rho).alias("rho")
    )
    regs = br.groupBy("lang", "bucket").agg(F.max("rho").cast("long").alias("r"))
    z = regs.groupBy("lang").agg(
        (
            F.sum(F.expr("shiftleft(1L, 53 - CAST(r AS INT))"))
            + (F.lit(_HLL_M) - F.count("*")) * F.expr("shiftleft(1L, 53)")
        )
        .cast("long")
        .alias("z_num")
    )
    exact = docs.groupBy("lang").agg(
        F.countDistinct("text").cast("long").alias("n_exact")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(64.0))
    est = (alpha * F.lit(4096.0)) * F.lit(_HLL_P53) / F.col("z_num").cast("double")
    return exact.join(z, "lang").select(
        "lang",
        "n_exact",
        est.alias("hll_estimate"),
        (est / F.col("n_exact").cast("double")).alias("est_over_exact"),
    )


_FH_BUCKETS = 16


@register(
    "text_feature_hashing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, w FROM (
                SELECT doc_id, unnest({sql_tokens('text')}) AS w FROM documents
            ) WHERE w <> ''
        ),
        hashed AS (
            SELECT doc_id,
                   ({_HEXVAL.format(ch="substring(md5(w), 1, 1)")})
                       % {_FH_BUCKETS} AS bucket,
                   CASE WHEN {_HEXVAL.format(ch="substring(md5(w), 2, 1)")} >= 8
                        THEN 1 ELSE -1 END AS sign
            FROM toks
        )
        SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
               CAST(SUM(sign) AS BIGINT) AS weight
        FROM hashed GROUP BY doc_id, bucket
        HAVING SUM(sign) <> 0
    """,
    doc="Feature hashing (the 'hashing trick', Weinberger et al. 2009): "
    "each token maps to one of 16 buckets by md5, with a second md5 "
    "bit supplying the +-1 sign that makes collisions unbiased — the "
    "vocabulary-free featurizer for streaming classifiers (quality "
    "models, spam filters) where a fitted vocabulary would itself be "
    "corpus-sized state. Output is the SPARSE (doc, bucket, weight) "
    "relation — the scalable representation; densifying to arrays is "
    "a bounded per-doc pivot when a consumer needs it. One tokenize + "
    "one (doc, bucket) aggregate; md5 via the shared hex-digit "
    "primitive, zero-weight features dropped identically in both "
    "engines.",
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("w")).where(
        F.col("w") != ""
    )
    b = _HEXVAL.format(ch="substring(md5(w), 1, 1)")
    sgn = _HEXVAL.format(ch="substring(md5(w), 2, 1)")
    hashed = toks.select(
        "doc_id",
        F.expr(f"({b}) % {_FH_BUCKETS}").cast("long").alias("bucket"),
        F.expr(f"CASE WHEN {sgn} >= 8 THEN 1 ELSE -1 END").alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .where(F.col("weight") != 0)
    )


@register(
    "events_bounce_rate",
    oracle=None,  # assigned below: composes the sessionize oracle CTE
    doc="Per-day session quality: session count, single-event (bounce) "
    "sessions, bounce rate, and mean session duration — the "
    "engagement dashboard row. Composes the existing sessionization "
    "(30-min gap, lag + running sum, one user-keyed shuffle) and adds "
    "only a day-keyed bounded aggregate; rates are single shared-"
    "order double divisions over exact integer counts.",
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.events import events_sessionize

    sess = events_sessionize(spark, sf_dir)
    day = F.col("session_start").cast("date").alias("day")
    g = sess.groupBy(day).agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.sum("duration_s").cast("long").alias("total_duration_s"),
    )
    return g.select(
        "day",
        "n_sessions",
        "n_bounces",
        (
            F.col("n_bounces").cast("double") / F.col("n_sessions").cast("double")
        ).alias("bounce_rate"),
        (
            F.col("total_duration_s").cast("double")
            / F.col("n_sessions").cast("double")
        ).alias("avg_duration_s"),
    )


def _bounce_oracle() -> str:
    from sql_engine_spark.registry import _REGISTRY

    sess_oracle = _REGISTRY["events_sessionize"].oracle
    return f"""
        WITH sess AS ({sess_oracle})
        SELECT CAST(session_start AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
               CAST(SUM(duration_s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS avg_duration_s
        FROM sess GROUP BY 1
    """


# events_sessionize is registered by the time this module loads
# (queries/__init__ imports events first); splice its oracle in.
from sql_engine_spark.registry import _REGISTRY as _REG  # noqa: E402

_REG["events_bounce_rate"].oracle = _bounce_oracle()


@register(
    "curation_budget_waterfill",
    oracle="""
        WITH s AS (
            SELECT source, CAST(SUM(n_chars) AS BIGINT) AS avail
            FROM documents GROUP BY source
        ),
        t AS (
            SELECT CAST(SUM(avail) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(FLOOR(SUM(avail) / 2) AS BIGINT) AS budget
            FROM s
        ),
        r AS (
            SELECT source, avail,
                   CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT)
                       AS rk,
                   CAST(SUM(avail) OVER (ORDER BY avail, source
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM s
        ),
        -- the unique water level theta = (budget - cum_j) / (m - j) for
        -- the largest j whose sources all fit whole: avail_j*(m-j) <=
        -- budget - cum_j (exact integer test, no division)
        lvl AS (
            SELECT MAX(rk) AS j FROM r CROSS JOIN t
            WHERE avail * (t.m - rk) <= t.budget - cum
        ),
        theta AS (
            SELECT CAST(t.budget - COALESCE(rj.cum, 0) AS DOUBLE)
                       / CAST(t.m - COALESCE(lvl.j, 0) AS DOUBLE) AS theta,
                   t.budget, t.m
            FROM t
            LEFT JOIN lvl ON TRUE
            LEFT JOIN r rj ON rj.rk = lvl.j
        )
        SELECT r.source, r.avail,
               CASE WHEN CAST(r.avail AS DOUBLE) <= theta.theta
                    THEN CAST(r.avail AS DOUBLE) ELSE theta.theta END
                   AS allocated,
               CAST(r.avail AS DOUBLE) > theta.theta AS capped
        FROM r CROSS JOIN theta
    """,
    doc="Water-filling token-budget allocation across sources: spend a "
    "corpus-half budget so every source keeps ALL its tokens up to a "
    "common water level theta, and only sources above the level are "
    "capped AT it — the max-min-fair allocation (classic water-filling "
    "/ progressive filling) used when a training mixture must cap "
    "dominant domains without starving small ones (the principled "
    "version of the fixed per-source cap in curation_source_cap). The "
    "level is found EXACTLY with integer cross-multiplication over the "
    "ascending cumulative-sum relation (source-cardinality — bounded), "
    "no search loop, no division until the final shared-order theta; "
    "sum(allocated) = budget by construction.",
)
def curation_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.sum("n_chars").cast("long").alias("avail"))
    t = s.agg(
        F.sum("avail").cast("long").alias("total"),
        F.count("*").cast("long").alias("m"),
        F.floor(F.sum("avail") / 2).cast("long").alias("budget"),
    )
    w = Window.orderBy("avail", "source")
    r = s.select(
        "source",
        "avail",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("avail")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    )
    rt = r.crossJoin(F.broadcast(t))
    lvl = rt.where(
        F.col("avail") * (F.col("m") - F.col("rk"))
        <= F.col("budget") - F.col("cum")
    ).agg(F.max("rk").alias("j"))
    rj = r.select(F.col("rk").alias("__jrk"), F.col("cum").alias("jcum"))
    theta = (
        t.crossJoin(F.broadcast(lvl))
        .join(F.broadcast(rj), F.col("__jrk") == F.col("j"), "left")
        .select(
            (
                (F.col("budget") - F.coalesce("jcum", F.lit(0))).cast("double")
                / (F.col("m") - F.coalesce("j", F.lit(0))).cast("double")
            ).alias("theta")
        )
    )
    return r.crossJoin(F.broadcast(theta)).select(
        "source",
        "avail",
        F.when(
            F.col("avail").cast("double") <= F.col("theta"),
            F.col("avail").cast("double"),
        )
        .otherwise(F.col("theta"))
        .alias("allocated"),
        (F.col("avail").cast("double") > F.col("theta")).alias("capped"),
    )
