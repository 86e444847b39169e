"""Round-8 vectors/diagnostics set: sampled silhouette, TextRank
keywords, cost-sensitive threshold selection, and PACF via
Durbin-Levinson (Spark folds the bounded ACF vector on the driver —
the Markov-removal posture — while the oracle unrolls the IDENTICAL
recursion as generated SQL, so every double op crosses engines in the
same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.functions.vectors import dot, sql_dot
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.graph import pagerank_fixed, sql_pagerank_fixed, und_both_dirs
from sql_engine_spark.operators.similarity import derived_sample_hex
from sql_engine_spark.queries.round8_quality import _CONFUSION_SQL, _confusion_cells
from sql_engine_spark.registry import _REGISTRY, register

# ---------------------------------------------------------------------------
# Sampled silhouette
# ---------------------------------------------------------------------------

_SIL_TARGET = 100


@register(
    "emb_silhouette_sampled",
    oracle=None,  # composed below (needs the derived sample threshold)
    doc="Mean silhouette per label (Rousseeuw 1987) on a DERIVED "
    f"deterministic sample (~{_SIL_TARGET} vectors at any corpus size "
    "via the md5-prefix device, operators/similarity."
    "derived_sample_hex — silhouette is inherently pairwise, so the "
    "production posture is a fixed-size audit sample, never the "
    "corpus): a(i) = mean Euclidean distance to same-label sample "
    "members, b(i) = min over other labels of the mean distance, "
    "s(i) = (b-a)/max(a,b). Distances spell as "
    "sqrt(dot(a,a) - 2 dot(a,b) + dot(b,b)) — three sequential "
    "zip_with folds, bit-identical to the oracle's list_reduce — and "
    "all means cross engines via dsum. Completes the cluster-validity "
    "pair with emb_davies_bouldin (DB reads centroids; silhouette "
    "reads the sample's actual pairwise geometry).",
)
def emb_silhouette_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.io import table_row_count

    emb = load(spark, sf_dir, "embeddings")
    # Footer-metadata count via the process-local cache — no Spark job
    # per build (r8 verdict #3); the oracle derives from the same footer.
    thr = derived_sample_hex(
        table_row_count(sf_dir, "embeddings"), target_train_rows=_SIL_TARGET
    )
    s = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    if thr is not None:
        s = s.where(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, len(thr))
            < F.lit(thr)
        )
    s = _persist(s.withColumn("nn", dot("e", "e")))
    a = s.select(
        F.col("vec_id").alias("i"),
        F.col("label").alias("li"),
        F.col("e").alias("ea"),
        F.col("nn").alias("na"),
    )
    b = s.select(
        F.col("vec_id").alias("j"),
        F.col("label").alias("lj"),
        F.col("e").alias("eb"),
        F.col("nn").alias("nb"),
    )
    pairs = a.join(b, F.col("i") != F.col("j")).select(
        "i",
        "li",
        "lj",
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("na") - F.lit(2.0) * dot("ea", "eb") + F.col("nb"),
            )
        ).alias("dist"),
    )
    md = pairs.groupBy("i", "li", "lj").agg(
        (dsum(F.col("dist")) / F.count("*").cast("double")).alias("mean_d")
    )
    ai = md.where(F.col("li") == F.col("lj")).select(
        "i", "li", F.col("mean_d").alias("a")
    )
    bi = (
        md.where(F.col("li") != F.col("lj"))
        .groupBy("i")
        .agg(F.min("mean_d").alias("b"))
    )
    sil = ai.join(bi, "i").select(
        "li",
        ((F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))).alias(
            "s"
        ),
    )
    return (
        sil.groupBy(F.col("li").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            (dsum(F.col("s")) / F.count("*").cast("double")).alias(
                "mean_silhouette"
            ),
        )
    )


def _fix_silhouette_oracle() -> None:
    import duckdb  # noqa: F401 — oracle renders lazily; threshold needs n_rows

    def render(sf_dir: str) -> str:
        import os

        import pyarrow.parquet as pq

        n = pq.read_metadata(
            os.path.join(sf_dir, "embeddings.parquet")
        ).num_rows
        thr = derived_sample_hex(n, target_train_rows=_SIL_TARGET)
        pred = (
            f"WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, {len(thr)})"
            f" < '{thr}'"
            if thr is not None
            else ""
        )
        return f"""
        WITH s AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings {pred}
        ),
        sn AS (SELECT vec_id, label, e, {sql_dot('e', 'e')} AS nn FROM s),
        pairs AS (
            SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
                   sqrt(greatest(CAST(0.0 AS DOUBLE),
                        a.nn - 2.0 * {sql_dot('a.e', 'b.e')} + b.nn)) AS dist
            FROM sn a JOIN sn b ON a.vec_id <> b.vec_id
        ),
        md AS (
            SELECT i, li, lj,
                   {sql_dsum('dist')} / CAST(COUNT(*) AS DOUBLE) AS mean_d
            FROM pairs GROUP BY i, li, lj
        ),
        ai AS (SELECT i, li, mean_d AS a FROM md WHERE li = lj),
        bi AS (SELECT i, MIN(mean_d) AS b FROM md WHERE li <> lj GROUP BY i),
        sil AS (
            SELECT ai.li, (bi.b - ai.a) / greatest(ai.a, bi.b) AS s
            FROM ai JOIN bi ON ai.i = bi.i
        )
        SELECT li AS label, CAST(COUNT(*) AS BIGINT) AS n_sampled,
               {sql_dsum('s')} / CAST(COUNT(*) AS DOUBLE) AS mean_silhouette
        FROM sil GROUP BY li
        """

    _REGISTRY["emb_silhouette_sampled"].oracle = render


_fix_silhouette_oracle()


# ---------------------------------------------------------------------------
# TextRank keywords
# ---------------------------------------------------------------------------

_TR_VOCAB = 150
_TR_MINLEN = 4
_TR_WINDOW = 2
_TR_MINCO = 2
_TR_TOPK = 20


@register(
    "text_textrank_keywords",
    oracle=rf"""
        WITH pos AS (
            SELECT doc_id, tok, CAST(p AS BIGINT) AS p
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
                       generate_subscripts(string_split_regex(lower(trim(text)), '\s+'), 1) AS p
                FROM documents
            ) WHERE len(tok) >= {_TR_MINLEN}
        ),
        vocab AS (
            SELECT tok FROM (
                SELECT tok, COUNT(*) AS n,
                       row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
                FROM pos GROUP BY tok
            ) WHERE rk <= {_TR_VOCAB}
        ),
        vp AS (
            SELECT pos.doc_id, pos.tok, pos.p
            FROM pos JOIN vocab USING (tok)
        ),
        co AS (
            SELECT a.tok AS w1, b.tok AS w2, CAST(COUNT(*) AS BIGINT) AS n
            FROM vp a JOIN vp b
              ON a.doc_id = b.doc_id
             AND b.p - a.p BETWEEN 1 AND {_TR_WINDOW}
             AND a.tok <> b.tok
            GROUP BY a.tok, b.tok
        ),
        und AS (
            SELECT least(w1, w2) AS a, greatest(w1, w2) AS b,
                   CAST(SUM(n) AS BIGINT) AS n
            FROM co GROUP BY 1, 2
        ),
        edges0 AS (SELECT a, b FROM und WHERE n >= {_TR_MINCO}),
        ranked AS ({sql_pagerank_fixed(
            "SELECT tok AS node FROM vocab",
            "SELECT a AS src, b AS dst FROM edges0 "
            "UNION ALL SELECT b AS src, a AS dst FROM edges0",
        )})
        SELECT node AS keyword, pagerank,
               CAST(row_number() OVER (ORDER BY pagerank DESC, node)
                    AS BIGINT) AS rank
        FROM ranked
        QUALIFY rank <= {_TR_TOPK}
    """,
    doc="TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): "
    f"corpus co-occurrence graph over the top-{_TR_VOCAB} content "
    f"tokens (length >= {_TR_MINLEN}, frequency-ranked with "
    "deterministic ties), an undirected edge where two vocab tokens "
    f"co-occur within a +-{_TR_WINDOW} window at least {_TR_MINCO} "
    "times, then THREE fixed PageRank rounds (the shared "
    "operators/graph.pagerank_fixed machinery — DECIMAL-exact "
    f"contribution sums) and the top-{_TR_TOPK} by rank. Scale shape: "
    "position pairs join within a bounded window (each token meets "
    f"<= {_TR_WINDOW} successors), the graph is vocab-bounded "
    f"({_TR_VOCAB} nodes), and PageRank state is one row per node.",
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents")
    pos = _persist(
        docs.select(
            "doc_id", F.posexplode(tokens("text")).alias("p0", "tok")
        )
        .where(F.length("tok") >= _TR_MINLEN)
        .select("doc_id", "tok", (F.col("p0") + 1).cast("long").alias("p"))
    )
    # Vocab cut through the salted two-level rank (r11 window sweep):
    # token TYPES grow with the corpus (Heaps), so a bare global
    # row_number would funnel a corpus-growing relation through one
    # task. Bit-identical to the single-window spelling.
    from sql_engine_spark.operators.similarity import two_level_topk

    vocab = two_level_topk(
        pos.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .withColumn("__q", F.lit(1)),
        score_col="n",
        k=_TR_VOCAB,
        rank_col="rk",
        query_col="__q",
        id_col="tok",
    ).select("tok")
    vp = _persist(
        pos.join(F.broadcast(vocab), "tok").select("doc_id", "tok", "p")
    )
    # Banded position join (r12, guide §2.3 shuffle fewer bytes /
    # §1.2 choose the distributed algorithm): joining on doc_id alone
    # is per-doc QUADRATIC in vocab positions before the window filter
    # prunes — a cliff for long documents at scale. Successors within
    # (pa, pa + W] live in position cells pa DIV W or pa DIV W + 1, so
    # exploding the left side to those two cells and equi-joining on
    # (doc_id, cell) bounds the join output at O(positions x W) while
    # the exact window predicate keeps the pair set identical.
    a = vp.select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.col("p").alias("pa"),
        F.explode(
            F.array(
                F.expr(f"p div {_TR_WINDOW}"),
                F.expr(f"p div {_TR_WINDOW}") + 1,
            )
        ).alias("__cell"),
    )
    b = vp.select(
        "doc_id",
        F.col("tok").alias("w2"),
        F.col("p").alias("pb"),
        F.expr(f"p div {_TR_WINDOW}").alias("__cell"),
    )
    co = (
        a.join(b, ["doc_id", "__cell"])
        .where(
            (F.col("pb") - F.col("pa")).between(1, _TR_WINDOW)
            & (F.col("w1") != F.col("w2"))
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n"))
    )
    und = (
        co.groupBy(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
        .agg(F.sum("n").cast("long").alias("n"))
        .where(F.col("n") >= _TR_MINCO)
        .select("a", "b")
    )
    edges = und_both_dirs(und)
    ranked = pagerank_fixed(
        vocab.select(F.col("tok").alias("node")), edges, iterations=3
    )
    wr = Window.orderBy(F.desc("pagerank"), F.asc("node"))
    return (
        ranked.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= _TR_TOPK)
        .select(F.col("node").alias("keyword"), "pagerank", "rank")
    )


# ---------------------------------------------------------------------------
# Cost-sensitive threshold selection
# ---------------------------------------------------------------------------

_COST_RATIOS = ["0.5", "1.0", "2.0", "5.0", "10.0"]


@register(
    "quality_cost_curve",
    oracle=f"""
        WITH {_CONFUSION_SQL},
        ratios(cost_ratio) AS (
            VALUES {", ".join(f"(CAST({r} AS DOUBLE))" for r in _COST_RATIOS)}
        ),
        costed AS (
            SELECT r.cost_ratio, c.threshold, c.fp, c.fn,
                   CAST(c.fp AS DOUBLE) + r.cost_ratio * CAST(c.fn AS DOUBLE)
                       AS cost,
                   CAST(c.tp + c.fp + c.fn + c.tn AS BIGINT) AS n
            FROM ratios r CROSS JOIN cells c
        ),
        best AS (
            SELECT cost_ratio, threshold, fp, fn, cost, n,
                   row_number() OVER (PARTITION BY cost_ratio
                                      ORDER BY cost, threshold) AS rk
            FROM costed
        )
        SELECT cost_ratio, CAST(threshold AS BIGINT) AS best_threshold,
               CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
               cost / CAST(n AS DOUBLE) AS expected_cost_per_row
        FROM best WHERE rk = 1
    """,
    doc="Cost-sensitive threshold selection over the confusion-cell "
    "grid: for each false-negative/false-positive cost ratio c in "
    f"{_COST_RATIOS}, the grid threshold minimizing fp + c*fn (ties "
    "to the smallest threshold) with its expected cost per row — the "
    "operating-point chooser that turns the sweep family's metrics "
    "into a decision (Drummond & Holte's cost-curve posture without "
    "the plot). Reuses the one-pass exact-integer cells; the argmin "
    "runs on a bounded (ratios x thresholds) relation.",
)
def quality_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cells = _confusion_cells(spark, sf_dir)
    ratios = F.broadcast(
        cells.sparkSession.createDataFrame(
            [(float(r),) for r in _COST_RATIOS], "cost_ratio double"
        )
    )
    costed = ratios.crossJoin(cells).select(
        "cost_ratio",
        "threshold",
        "fp",
        "fn",
        (
            F.col("fp").cast("double")
            + F.col("cost_ratio") * F.col("fn").cast("double")
        ).alias("cost"),
        (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))
        .cast("long")
        .alias("n"),
    )
    w = Window.partitionBy("cost_ratio").orderBy("cost", "threshold")
    return (
        costed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "cost_ratio",
            F.col("threshold").cast("long").alias("best_threshold"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
            (F.col("cost") / F.col("n").cast("double")).alias(
                "expected_cost_per_row"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PACF via Durbin-Levinson
# ---------------------------------------------------------------------------

_PACF_LAGS = 5


def _mul(a, b):
    return None if a is None or b is None else a * b


def _sub(a, b):
    return None if a is None or b is None else a - b


def _div(a, b):
    # DuckDB yields NULL on x/0.0 where IEEE gives inf/nan — mirror it.
    return None if a is None or b is None or b == 0.0 else a / b


def _dl_python(rho: list) -> list:
    """Durbin-Levinson recursion -> [phi_11, phi_22, ...]. The EXACT
    op order here is mirrored symbolically by _dl_sql below — keep
    the two in lockstep. None mirrors SQL NULL (a lag with no day
    pair, or a constant series with zero variance) and propagates
    through the recursion exactly as NULL does through the oracle's
    generated expressions."""
    phis = {}
    pacf = []
    for k in range(1, len(rho) + 1):
        if k == 1:
            phi_kk = rho[0]
        else:
            num = rho[k - 1]
            for j in range(1, k):
                num = _sub(num, _mul(phis[(k - 1, j)], rho[k - 1 - j]))
            den = 1.0
            for j in range(1, k):
                den = _sub(den, _mul(phis[(k - 1, j)], rho[j - 1]))
            phi_kk = _div(num, den)
        phis[(k, k)] = phi_kk
        for j in range(1, k):
            phis[(k, j)] = _sub(
                phis[(k - 1, j)], _mul(phi_kk, phis[(k - 1, k - j)])
            )
        pacf.append(phi_kk)
    return pacf


def _dl_sql(lags: int) -> str:
    """Expression-level unroll of _dl_python over columns rho_1..rho_N
    of a 1-row relation `acf` — identical association order."""
    ctes = []
    prev = "acf"
    for k in range(1, lags + 1):
        if k == 1:
            phi_kk = "rho_1"
        else:
            num = f"rho_{k}"
            for j in range(1, k):
                num = f"({num} - (phi_{k - 1}_{j} * rho_{k - j}))"
            den = "CAST(1.0 AS DOUBLE)"
            for j in range(1, k):
                den = f"({den} - (phi_{k - 1}_{j} * rho_{j}))"
            phi_kk = f"({num} / {den})"
        # phi_k_k must exist before sibling columns reference it:
        # materialize in two steps.
        ctes.append(
            f"dl_{k}a AS (SELECT *, {phi_kk} AS phi_{k}_{k} FROM {prev})"
        )
        sib = ", ".join(
            f"(phi_{k - 1}_{j} - phi_{k}_{k} * phi_{k - 1}_{k - j})"
            f" AS phi_{k}_{j}"
            for j in range(1, k)
        )
        ctes.append(
            f"dl_{k} AS (SELECT *{', ' + sib if sib else ''} FROM dl_{k}a)"
        )
        prev = f"dl_{k}"
    sel = ", ".join(f"phi_{k}_{k} AS pacf_{k}" for k in range(1, lags + 1))
    return ",\n        ".join(ctes) + f",\n        dl_out AS (SELECT {sel} FROM {prev})"


@register(
    "events_pacf",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        mu AS (
            SELECT CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
            FROM daily
        ),
        g0 AS (
            SELECT {sql_ssum(
                "(CAST(daily.c AS DOUBLE) - CAST(mu.s AS DOUBLE) / CAST(mu.n AS DOUBLE))"
                " * (CAST(daily.c AS DOUBLE) - CAST(mu.s AS DOUBLE) / CAST(mu.n AS DOUBLE))"
            )} AS g FROM daily CROSS JOIN mu
        ),
        lagset(lag) AS (VALUES {", ".join(f"({k})" for k in range(1, _PACF_LAGS + 1))}),
        gk AS (
            SELECT l.lag,
                   {sql_ssum(
                       "(CAST(a.c AS DOUBLE) - CAST(mu.s AS DOUBLE) / CAST(mu.n AS DOUBLE))"
                       " * (CAST(b.c AS DOUBLE) - CAST(mu.s AS DOUBLE) / CAST(mu.n AS DOUBLE))"
                   )} AS gk
            FROM daily a
            CROSS JOIN mu
            JOIN lagset l ON TRUE
            JOIN daily b ON b.d = a.d + l.lag
            GROUP BY l.lag
        ),
        acf AS (
            SELECT {", ".join(
                f"MAX(CASE WHEN lag = {k} THEN gk END) / (SELECT g FROM g0)"
                f" AS rho_{k}"
                for k in range(1, _PACF_LAGS + 1)
            )}
            FROM gk
        ),
        {_dl_sql(_PACF_LAGS)},
        rows(lag) AS (VALUES {", ".join(f"({k})" for k in range(1, _PACF_LAGS + 1))})
        SELECT CAST(rows.lag AS BIGINT) AS lag,
               CASE {" ".join(
                   f"WHEN rows.lag = {k} THEN (SELECT rho_{k} FROM acf)"
                   for k in range(1, _PACF_LAGS + 1)
               )} END AS acf,
               CASE {" ".join(
                   f"WHEN rows.lag = {k} THEN (SELECT pacf_{k} FROM dl_out)"
                   for k in range(1, _PACF_LAGS + 1)
               )} END AS pacf
        FROM rows
    """,
    doc=f"Partial autocorrelation of the daily event-count series at "
    f"lags 1-{_PACF_LAGS} via the Durbin-Levinson recursion — the "
    "AR-order diagnostic (PACF cuts off at p for an AR(p) process) "
    "read next to agg_autocorr_daily's raw ACF. Autocovariances use "
    "the stationary estimator (global mean, gamma_0 denominator) "
    "over the BOUNDED day relation with ssum-shared folds; the "
    "recursion itself is a fold over <= 5 doubles, so Spark runs it "
    "on the DRIVER (the bounded-collect posture of "
    "events_markov_removal — model-sized state, never corpus data) "
    "while the oracle unrolls the IDENTICAL recursion symbolically "
    "(generated CTE chain, same association order), keeping the "
    "comparison exact.",
)
def events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _persist(
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d")
        ).agg(F.count("*").cast("long").alias("c"))
    )
    mu = daily.agg(
        F.sum("c").cast("long").alias("s"), F.count("*").cast("long").alias("n")
    )
    cD = F.col("c").cast("double")
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    g0 = (
        daily.crossJoin(F.broadcast(mu))
        .agg(ssum((cD - mean) * (cD - mean)).alias("g"))
        .collect()[0]
        .g
    )
    lags = F.broadcast(
        spark.createDataFrame([(k,) for k in range(1, _PACF_LAGS + 1)], "lag long")
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    meana = F.col("s").cast("double") / F.col("n").cast("double")
    gk_rows = (
        a.crossJoin(F.broadcast(mu))
        .crossJoin(lags)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            ssum(
                (F.col("ca").cast("double") - meana)
                * (F.col("cb").cast("double") - meana)
            ).alias("gk")
        )
        .collect()
    )
    gk = {r.lag: r.gk for r in gk_rows}
    # A lag with no (d, d+k) day pair has NO gk row (-> SQL NULL), and
    # a constant series has g0 == 0 (-> NULL via DuckDB's x/0.0):
    # carry None so both engines emit the same NULL rows.
    rho = [
        _div(gk.get(k), g0) for k in range(1, _PACF_LAGS + 1)
    ]
    pacf = _dl_python(rho)
    return spark.createDataFrame(
        [(k, rho[k - 1], pacf[k - 1]) for k in range(1, _PACF_LAGS + 1)],
        "lag long, acf double, pacf double",
    )
