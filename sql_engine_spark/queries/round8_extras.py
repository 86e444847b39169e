"""Round-8 extras: degree assortativity, l-diversity, the KMV distinct
sketch, SemDeDup-style cell dedup, copy-on-write delete planning, and
the Theta forecast — filling remaining gaps across the graph / privacy /
sketch / curation / lakehouse / forecasting families.

All follow the established house contracts: exact-integer or
decimal-exact reductions feeding fixed-order double expressions (+ sqrt
only); bounded relations (day series, shard manifests, LSH cells) carry
the per-item algebra; corpus passes are single aggregates or bucketed
joins. Reference parity: none of this surface exists in the reference
(SURVEY.md §2) — these extend the LLM-data-pipeline families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import _REGISTRY, register


@register(
    "graph_assortativity",
    oracle=None,  # composed below (needs the shared kNN CTE)
    doc="Degree assortativity of the kNN graph (Newman 2002): the "
    "Pearson correlation of (degree(u), degree(v)) over all DIRECTED "
    "orientations of the undirected edge set — positive means "
    "popular vectors neighbor popular vectors (hub cores: the "
    "SemDeDup template-cluster signature), negative means hub-and-"
    "spoke. All five moment sums are EXACT INTEGERS over the "
    "edge-sized relation (degrees are cap-bounded, so products fit "
    "BIGINT comfortably; at extreme edge counts the sums go through "
    "the DECIMAL detour); r assembles once with fixed-order double "
    "ops + sqrt. Companion number to graph_degree_histogram (the "
    "marginal) and graph_mutual_knn_rate (the reciprocity).",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared, und_edges

    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g)
    both = _persist(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            und.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
    )
    deg = both.groupBy("u").agg(F.count("*").cast("long").alias("du"))
    e = (
        both.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("du").alias("dv")), "v"
        )
    )
    m = e.agg(
        F.count("*").cast("long").alias("m_directed"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("s_xy"),
        F.sum("du").cast("long").alias("s_x"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("s_xx"),
    )
    # Both orientations are present, so the x and y marginals are
    # identical (s_y = s_x, s_yy = s_xx) — the correlation reduces to
    # (M*s_xy - s_x^2) / (M*s_xx - s_x^2).
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("m_directed") * d("s_xy") - d("s_x") * d("s_x")) / (
        d("m_directed") * d("s_xx") - d("s_x") * d("s_x")
    )
    return m.select(
        "m_directed", "s_xy", "s_x", "s_xx", r.alias("assortativity")
    )


def _fix_assortativity_oracle() -> None:
    from sql_engine_spark.operators.graph import sql_knn_shared

    _REGISTRY["graph_assortativity"].oracle = f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        bo AS (
            SELECT a AS u, b AS v FROM und
            UNION ALL
            SELECT b AS u, a AS v FROM und
        ),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS du FROM bo GROUP BY u
        ),
        e AS (
            SELECT d1.du AS du, d2.du AS dv
            FROM bo b
            JOIN deg d1 ON d1.u = b.u
            JOIN deg d2 ON d2.u = b.v
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m_directed,
                   CAST(SUM(du * dv) AS BIGINT) AS s_xy,
                   CAST(SUM(du) AS BIGINT) AS s_x,
                   CAST(SUM(du * du) AS BIGINT) AS s_xx
            FROM e
        )
        SELECT m_directed, s_xy, s_x, s_xx,
               (CAST(m_directed AS DOUBLE) * CAST(s_xy AS DOUBLE)
                - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))
               / (CAST(m_directed AS DOUBLE) * CAST(s_xx AS DOUBLE)
                  - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))
                   AS assortativity
        FROM m
    """


_fix_assortativity_oracle()


_LDIV_L = 3
_LDIV_BUCKET = 100


@register(
    "privacy_l_diversity",
    oracle=f"""
        WITH g AS (
            SELECT source, n_chars // {_LDIV_BUCKET} AS size_bucket,
                   CAST(COUNT(*) AS BIGINT) AS group_size,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_sensitive
            FROM documents
            GROUP BY source, n_chars // {_LDIV_BUCKET}
        )
        SELECT source, size_bucket, group_size, n_sensitive,
               n_sensitive >= {_LDIV_L} AS l_diverse
        FROM g
    """,
    doc="l-diversity audit over the quasi-identifier tuple (source, "
    f"n_chars div {_LDIV_BUCKET}) with lang as the SENSITIVE "
    "attribute (Machanavajjhala et al. 2007): a group can be "
    "k-anonymous yet still leak — if every row in it shares one lang, "
    "membership reveals the language — so each QI group must carry at "
    f"least l={_LDIV_L} distinct sensitive values. The missing half "
    "of privacy_k_anonymity's release gate (size alone is not "
    "protection). One aggregate with an exact distinct count per "
    "group; groups are QI-cardinality-sized, never row-sized.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy(
        "source", F.expr(f"n_chars div {_LDIV_BUCKET}").alias("size_bucket")
    ).agg(
        F.count("*").cast("long").alias("group_size"),
        F.countDistinct("lang").cast("long").alias("n_sensitive"),
    )
    return g.select(
        "source",
        "size_bucket",
        "group_size",
        "n_sensitive",
        (F.col("n_sensitive") >= _LDIV_L).alias("l_diverse"),
    )


_KMV_K = 64
_KMV_HEX = 12  # 48-bit hash space
_KMV_M = 16**_KMV_HEX


@register(
    "approx_kmv_distinct",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT list_reduce(list_transform(range(1, {_KMV_HEX + 1}),
                       i -> CAST(instr('0123456789abcdef',
                            substring(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
                            AS BIGINT)), (a, b) -> a * 16 + b) AS hv
            FROM events
        ),
        bottom AS (
            SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}
        ),
        kth AS (
            SELECT CAST(MAX(hv) AS BIGINT) AS h_k,
                   CAST(COUNT(*) AS BIGINT) AS k_used
            FROM bottom
        ),
        exact AS (
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
            FROM events
        )
        SELECT k_used, h_k, exact_distinct,
               CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE)
                    ELSE (CAST({_KMV_K} AS DOUBLE) - 1.0)
                         * (CAST({_KMV_M} AS DOUBLE) / CAST(h_k AS DOUBLE))
               END AS kmv_estimate,
               CASE WHEN k_used < {_KMV_K} THEN TRUE
                    ELSE abs((CAST({_KMV_K} AS DOUBLE) - 1.0)
                             * (CAST({_KMV_M} AS DOUBLE) / CAST(h_k AS DOUBLE))
                             - CAST(exact_distinct AS DOUBLE))
                         / CAST(exact_distinct AS DOUBLE) < 0.5
               END AS within_50pct
        FROM kth CROSS JOIN exact
    """,
    doc="KMV (k-minimum-values / bottom-k) distinct sketch of "
    f"events.user_id (Bar-Yossef et al. 2002): keep the {_KMV_K} "
    "smallest 48-bit md5-derived hash values; the k-th smallest h_k "
    "estimates distinct = (k-1) * M / h_k. The third leg of the "
    "cardinality family (exact bitmap, HLL) — unlike HLL the KMV "
    "synopsis is a plain SORTED SET, mergeable by union+truncate and "
    "directly intersectable for Jaccard estimates. The bottom-k runs "
    "as Spark's TakeOrdered (per-partition bottom-k + merge — no "
    "global sort); the estimate is exact-integer inputs through one "
    "fixed division chain, and the sketch-accuracy claim is the "
    "house deterministic-tolerance boolean (exact value + claim, "
    "both hash-checked). Small corpora (fewer than k distinct "
    "hashes) return the exact count.",
)
def approx_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h = (
        ev.select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, _KMV_HEX),
                16,
                10,
            )
            .cast("long")
            .alias("hv")
        )
        .distinct()
    )
    bottom = h.orderBy("hv").limit(_KMV_K)
    kth = bottom.agg(
        F.max("hv").cast("long").alias("h_k"),
        F.count("*").cast("long").alias("k_used"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    m = kth.crossJoin(F.broadcast(exact))
    est = (F.lit(float(_KMV_K)) - F.lit(1.0)) * (
        F.lit(float(_KMV_M)) / F.col("h_k").cast("double")
    )
    kmv = F.when(F.col("k_used") < _KMV_K, F.col("k_used").cast("double")).otherwise(
        est
    )
    claim = F.when(F.col("k_used") < _KMV_K, F.lit(True)).otherwise(
        F.abs(est - F.col("exact_distinct").cast("double"))
        / F.col("exact_distinct").cast("double")
        < 0.5
    )
    return m.select(
        "k_used",
        "h_k",
        "exact_distinct",
        kmv.alias("kmv_estimate"),
        claim.alias("within_50pct"),
    )


_SEMD_PLANES = 4
_SEMD_DIM = 64


@register(
    "curation_semdedup_cells",
    oracle=None,  # composed below (needs the lsh bucket SQL)
    doc="SemDeDup-style cell dedup (Abbas et al. 2023): bucket every "
    f"embedding into 2^{_SEMD_PLANES} hyperplane-LSH cells (the "
    "cheap stand-in for the paper's k-means clustering — same "
    "machinery as the ANN family), and within each cell KEEP ONLY "
    "the vector closest to the cell centroid (ties to the smallest "
    "vec_id), dropping the rest as semantic redundancy. Per cell: "
    "size, the kept vector, its centroid distance, and the drop "
    "count. Centroids are one exploded (cell, dim) aggregate "
    "(cells x dim rows — bounded); distances are dim-keyed joins "
    "with DECIMAL-exact squared-deviation sums (dsum), so the sqrt "
    "input is bit-identical cross-engine; the keep choice is a "
    "cell-partitioned argmin window over bounded candidate lists.",
)
def curation_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import lsh_bucket

    emb = load(spark, sf_dir, "embeddings")
    cells = _persist(
        emb.select(
            "vec_id",
            lsh_bucket("embedding", _SEMD_PLANES, _SEMD_DIM).alias("cell"),
            "embedding",
        )
    )
    ex = _persist(
        cells.select(
            "vec_id", "cell", F.posexplode("embedding").alias("i0", "v")
        ).select(
            "vec_id",
            "cell",
            (F.col("i0") + 1).alias("dim"),
            F.col("v").cast("double").alias("x"),
        )
    )
    cent = ex.groupBy("cell", "dim").agg(
        (dsum(F.col("x")) / F.count("*")).alias("mu")
    )
    dev = (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
    dist = (
        ex.join(cent, ["cell", "dim"])
        .groupBy("vec_id", "cell")
        .agg(F.sqrt(dsum(dev)).alias("dist"))
    )
    w = Window.partitionBy("cell").orderBy(F.asc("dist"), F.asc("vec_id"))
    sizes = cells.groupBy("cell").agg(F.count("*").cast("long").alias("cell_size"))
    return (
        dist.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .join(sizes, "cell")
        .select(
            "cell",
            "cell_size",
            F.col("vec_id").alias("kept_vec_id"),
            F.col("dist").alias("kept_dist"),
            (F.col("cell_size") - 1).cast("long").alias("n_dropped"),
        )
    )


def _fix_semdedup_oracle() -> None:
    from sql_engine_spark.operators.similarity import sql_lsh_bucket

    _REGISTRY["curation_semdedup_cells"].oracle = f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        cells AS (
            SELECT vec_id, e,
                   {sql_lsh_bucket('e', _SEMD_PLANES, _SEMD_DIM)} AS cell
            FROM v
        ),
        ex AS (
            SELECT vec_id, cell, i AS dim, CAST(x AS DOUBLE) AS x
            FROM (
                SELECT vec_id, cell, unnest(e) AS x,
                       generate_subscripts(e, 1) AS i
                FROM cells
            )
        ),
        cent AS (
            SELECT cell, dim, {sql_dsum('x')} / COUNT(*) AS mu
            FROM ex GROUP BY cell, dim
        ),
        dist AS (
            SELECT e.vec_id, e.cell,
                   sqrt({sql_dsum('(e.x - c.mu) * (e.x - c.mu)')}) AS dist
            FROM ex e JOIN cent c ON e.cell = c.cell AND e.dim = c.dim
            GROUP BY e.vec_id, e.cell
        ),
        sizes AS (
            SELECT cell, CAST(COUNT(*) AS BIGINT) AS cell_size
            FROM cells GROUP BY cell
        ),
        kept AS (
            SELECT cell, vec_id, dist,
                   row_number() OVER (PARTITION BY cell
                       ORDER BY dist ASC, vec_id ASC) AS rk
            FROM dist
        )
        SELECT k.cell, s.cell_size, k.vec_id AS kept_vec_id,
               k.dist AS kept_dist,
               CAST(s.cell_size - 1 AS BIGINT) AS n_dropped
        FROM kept k JOIN sizes s ON k.cell = s.cell
        WHERE k.rk = 1
    """


_fix_semdedup_oracle()


_DEL_SHARD = 50


@register(
    "maintenance_delete_plan",
    oracle=f"""
        WITH shards AS (
            SELECT doc_id // {_DEL_SHARD} AS shard_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(CASE WHEN lang = 'zh' THEN 1 END) AS BIGINT)
                       AS n_deleted
            FROM documents GROUP BY 1
        )
        SELECT shard_id, n_rows, n_deleted,
               n_rows - n_deleted AS n_kept,
               n_deleted > 0 AS needs_rewrite
        FROM shards
    """,
    doc="Copy-on-write DELETE plan (the Delta/Iceberg CoW execution "
    "model): before a `DELETE WHERE lang = 'zh'` moves any data, "
    "compute per storage shard how many rows match — shards with "
    "zero matches are left untouched (data skipping for deletes; at "
    "scale this predicate evaluation itself prunes via zonemaps), "
    "shards with matches are rewritten with n_kept rows. The shard "
    f"manifest derives from doc_id div {_DEL_SHARD} so the plan is "
    "data-real and oracle-checkable; output is manifest-sized. The "
    "write-side twin of maintenance_compaction_plan (both produce "
    "the plan relation a table service executes).",
)
def maintenance_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    shards = docs.groupBy(
        F.expr(f"doc_id div {_DEL_SHARD}").alias("shard_id")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.when(F.col("lang") == "zh", F.lit(1)))
        .cast("long")
        .alias("n_deleted"),
    )
    return shards.select(
        "shard_id",
        "n_rows",
        "n_deleted",
        (F.col("n_rows") - F.col("n_deleted")).alias("n_kept"),
        (F.col("n_deleted") > 0).alias("needs_rewrite"),
    )


_THETA_H = 7


def _sql_theta() -> str:
    """Theta-method oracle: OLS drift line + genuine recursive SES
    (alpha = 0.5 — binary-exact, so the halving recursion is
    bit-stable) over the theta=2 line, combined per horizon."""
    return f"""
        WITH RECURSIVE daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT CAST(c AS DOUBLE) AS y,
                   CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
            FROM daily
        ),
        fit AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(t) AS BIGINT) AS st,
                   CAST(SUM(t * t) AS BIGINT) AS stt,
                   {sql_dsum('y')} AS sy,
                   {sql_dsum('t * y')} AS sty
            FROM idx
        ),
        ab AS (
            SELECT n,
                   (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
                   (sy - ((CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
                          / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                             - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))
                         * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a
            FROM fit
        ),
        th AS (
            SELECT i.t, 2.0 * i.y - (ab.a + ab.b * CAST(i.t AS DOUBLE)) AS x,
                   ab.n, ab.a, ab.b
            FROM idx i CROSS JOIN ab
        ),
        ses AS (
            SELECT t, x AS s, n, a, b FROM th WHERE t = 1
            UNION ALL
            SELECT th.t, 0.5 * th.x + 0.5 * ses.s, th.n, th.a, th.b
            FROM th JOIN ses ON th.t = ses.t + 1
        ),
        last_s AS (SELECT s, n, a, b FROM ses ORDER BY t DESC LIMIT 1)
        SELECT CAST(h AS BIGINT) AS horizon,
               0.5 * (s + (a + b * CAST(n + h AS DOUBLE))) AS forecast
        FROM last_s CROSS JOIN (
            SELECT unnest(range(1, {_THETA_H + 1})) AS h
        )
    """


@register(
    "events_theta_forecast",
    oracle=None,  # set below (needs the recursive CTE string)
    doc="Theta-method forecast of the daily event-count series "
    "(Assimakopoulos & Nikolopoulos 2000 — the M3 competition "
    "winner): the h-step forecast is the average of (1) the OLS "
    "drift line extrapolated to n+h and (2) simple exponential "
    "smoothing (alpha = 0.5, a binary-exact halving, so the "
    "recursion is bit-stable in every engine) over the theta=2 line "
    "2*y_t - trend_t. Companion to events_holt_forecast (trend "
    "smoothing) and events_seasonal_naive_backtest. The corpus "
    "reduces to the 30-day relation in one counting aggregate; OLS "
    "coefficients come from exact/decimal-exact sums; the SES fold "
    "runs on the driver over the BOUNDED day series (the Holt "
    "bounded-collect posture), while the oracle runs a genuine "
    "WITH RECURSIVE — verifying the fold against real recursion.",
)
def events_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    series = [float(r.c) for r in daily.orderBy("d").collect()]  # bounded: days
    n = len(series)
    # OLS on t=1..n — mirror the oracle's decimal-exact sums exactly:
    # integer sums are exact in Python; sy/sty go through the same
    # round-to-6-decimals the DECIMAL(27,6) cast applies (y and t*y are
    # integers here, so the cast is lossless in both engines).
    st = n * (n + 1) // 2
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(series)
    sty = sum(t * y for t, y in zip(range(1, n + 1), series))
    b = (float(n) * sty - float(st) * sy) / (
        float(n) * float(stt) - float(st) * float(st)
    )
    a = (sy - b * float(st)) / float(n)
    s = 2.0 * series[0] - (a + b * 1.0)
    for t in range(2, n + 1):
        x = 2.0 * series[t - 1] - (a + b * float(t))
        s = 0.5 * x + 0.5 * s
    rows = [
        (h, 0.5 * (s + (a + b * float(n + h)))) for h in range(1, _THETA_H + 1)
    ]
    return spark.createDataFrame(rows, "horizon long, forecast double")


_REGISTRY["events_theta_forecast"].oracle = _sql_theta()
