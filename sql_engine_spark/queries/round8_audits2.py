"""Round-8 audits, second set: Wilson funnel intervals, the semantic-
dedup threshold sweep, and the LSH table-count recall sweep — dial-vs-
outcome curves for three more operating knobs, per the house self-audit
contract (dedup_threshold_sweep, multimodal_phash_cap_audit,
graph_wedge_cap_audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# Wilson z for 95% two-sided: a SHARED LITERAL in both engines (the
# normal quantile needs erf^-1 — libm — so it is pinned, not computed;
# the Benford device).
_WILSON_Z = "1.96"


@register(
    "events_funnel_wilson_ci",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS p
            FROM events GROUP BY user_id
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(v) AS BIGINT) AS n_v,
                   CAST(SUM(v * c) AS BIGINT) AS n_vc,
                   CAST(SUM(v * c * p) AS BIGINT) AS n_vcp
            FROM per_user
        ),
        steps AS (
            SELECT 1 AS step, 'any->view' AS name, n_users AS denom,
                   n_v AS num FROM agg
            UNION ALL
            SELECT 2, 'view->click', n_v, n_vc FROM agg
            UNION ALL
            SELECT 3, 'click->purchase', n_vc, n_vcp FROM agg
        ),
        wil AS (
            SELECT step, name, denom, num,
                   CAST(num AS DOUBLE) / CAST(denom AS DOUBLE) AS p_hat,
                   CAST({_WILSON_Z} AS DOUBLE) AS z,
                   CAST(denom AS DOUBLE) AS nd
            FROM steps
        )
        SELECT CAST(step AS BIGINT) AS step, name, denom, num, p_hat,
               ((p_hat + ((z * z) / (2.0 * nd)))
                - ((z * sqrt(((p_hat * (1.0 - p_hat)) / nd)
                             + ((z * z) / (4.0 * (nd * nd)))))))
                   / (1.0 + ((z * z) / nd)) AS wilson_lo,
               ((p_hat + ((z * z) / (2.0 * nd)))
                + ((z * sqrt(((p_hat * (1.0 - p_hat)) / nd)
                             + ((z * z) / (4.0 * (nd * nd)))))))
                   / (1.0 + ((z * z) / nd)) AS wilson_hi
        FROM wil
    """,
    doc="Funnel step conversions with Wilson 95% score intervals "
    "(Wilson 1927 — the interval that stays inside [0,1] and behaves "
    "at small counts, unlike the Wald +-z*se the events_abtest_ztest "
    "family uses for differences): per step (reach view, view->click, "
    "click->purchase over per-user flags), the exact integer "
    "numerator/denominator and the interval bounds. z = 1.96 is a "
    "SHARED LITERAL (the normal quantile needs libm erf^-1, excluded "
    "from hashed outputs; the Benford shared-literal device), and "
    "both bounds assemble in one fixed-order expression of + * / "
    "sqrt. One corpus aggregate to per-user flags; everything "
    "downstream is 3 rows.",
)
def events_funnel_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "p"
        ),
    )
    agg = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("v").cast("long").alias("n_v"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("n_vc"),
        F.sum(F.col("v") * F.col("c") * F.col("p")).cast("long").alias("n_vcp"),
    )
    steps = (
        agg.select(
            F.lit(1).alias("step"),
            F.lit("any->view").alias("name"),
            F.col("n_users").alias("denom"),
            F.col("n_v").alias("num"),
        )
        .unionAll(
            agg.select(
                F.lit(2),
                F.lit("view->click"),
                F.col("n_v"),
                F.col("n_vc"),
            )
        )
        .unionAll(
            agg.select(
                F.lit(3),
                F.lit("click->purchase"),
                F.col("n_vc"),
                F.col("n_vcp"),
            )
        )
    )
    z = F.expr(f"CAST({_WILSON_Z} AS DOUBLE)")
    nd = F.col("denom").cast("double")
    p_hat = F.col("num").cast("double") / nd
    center = p_hat + ((z * z) / (F.lit(2.0) * nd))
    half = z * F.sqrt(
        ((p_hat * (F.lit(1.0) - p_hat)) / nd)
        + ((z * z) / (F.lit(4.0) * (nd * nd)))
    )
    denom_w = F.lit(1.0) + ((z * z) / nd)
    return steps.select(
        F.col("step").cast("long").alias("step"),
        "name",
        "denom",
        "num",
        p_hat.alias("p_hat"),
        ((center - half) / denom_w).alias("wilson_lo"),
        ((center + half) / denom_w).alias("wilson_hi"),
    )


_SEM_SWEEP = (25, 35, 45, 55, 65, 75, 85)  # cosine thresholds x100


@register(
    "dedup_semantic_threshold_sweep",
    oracle=None,  # composed below (reuses the verified-pairs oracle)
    doc="Threshold-tuning sweep for SEMANTIC dedup: from ONE verified "
    "cosine pair relation (the dedup_semantic_verified bucketed "
    "pipeline at its base threshold 0.25), the pair count and the "
    "keep-first drop count at every candidate cosine threshold "
    f"{tuple(t / 100 for t in _SEM_SWEEP)} — the embedding-space twin "
    "of dedup_threshold_sweep's MinHash curve (same contract: the "
    "expensive pair relation computes once, the sweep is a bounded "
    "cross join over the dial grid; thresholds compare as integer "
    "cosine*100 >= t in both engines to avoid a double-literal seam "
    "on the boundary... the comparison itself is on the double "
    "cosine, identical in both engines).",
)
def dedup_semantic_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.curation import dedup_semantic_verified

    pairs = dedup_semantic_verified(spark, sf_dir)
    th = spark.createDataFrame([(t,) for t in _SEM_SWEEP], "t long")
    keep = F.col("cosine") * 100 >= F.col("t").cast("double")
    return (
        pairs.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_pairs"),
            F.countDistinct(F.when(keep, F.col("id_b")))
            .cast("long")
            .alias("n_docs_dropped"),
        )
        .select(F.col("t").alias("threshold_pct"), "n_pairs", "n_docs_dropped")
    )


def _fix_sem_sweep_oracle() -> None:
    from sql_engine_spark.registry import _REGISTRY

    base = _REGISTRY["dedup_semantic_verified"].oracle
    th = ", ".join(f"({t})" for t in _SEM_SWEEP)
    _REGISTRY["dedup_semantic_threshold_sweep"].oracle = f"""
        WITH pairs AS ({base}),
        th(t) AS (VALUES {th})
        SELECT CAST(t AS BIGINT) AS threshold_pct,
               CAST(SUM(CASE WHEN cosine * 100 >= CAST(t AS DOUBLE)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT CASE WHEN cosine * 100 >= CAST(t AS DOUBLE)
                                        THEN id_b END) AS BIGINT)
                   AS n_docs_dropped
        FROM pairs CROSS JOIN th
        GROUP BY t
    """


_fix_sem_sweep_oracle()


_TBL_SWEEP = (1, 2, 4)


@register(
    "ann_lsh_tables_recall_sweep",
    oracle=None,  # composed below from the brute + multitable oracles
    doc="Recall-vs-table-count curve for OR-amplified LSH: for each "
    f"table count in {_TBL_SWEEP} (3 planes each), recall@5 of the "
    "multi-table index against the exact cosine top-5, per query — "
    "the dial an ANN owner actually turns (each extra table buys "
    "1-(1-p)^T recall for linearly more bucket rows; "
    "ann_lsh_recall_report and ann_ivf_recall_report fix one "
    "operating point each, this is the curve through them). Each leg "
    "reuses the documented bucket-confined candidate generation; the "
    "denominator is the per-query brute count (the r7 fixed-k fix); "
    "the sweep output is queries x table-counts rows.",
)
def ann_lsh_tables_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.similarity import (
        brute_force_topk,
        lsh_multitable_topk_sweep,
    )
    from sql_engine_spark.queries.similarity import DIM

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    # Persisted (r12): brute feeds the per-query denominators AND every
    # leg's hit join — unpersisted it re-ran the exact top-5 per use.
    brute = _persist(
        brute_force_topk(q, c, id_col="vec_id", vec_col="embedding", k=5)
    )
    # Pin the cache before the fan-out: the final action launches the
    # per-leg qs/hits subplans concurrently, and against a cold persist
    # each re-evaluates the exact top-5 (measured: six ~1s concurrent
    # brute evaluations at sf0.1).
    brute.count()
    qs = brute.groupBy("query_id").agg(F.count("*").cast("long").alias("n_true"))
    # One shared hash+score evaluation for all three table counts (r12,
    # guide §1.2): table t always hashes with plane offset t*planes, so
    # the legs' candidate sets nest; the solo spelling rebuilt buckets
    # and cosines per leg. The sweep operator ranks every leg in one
    # pipeline; hits become one (tables, query) groupBy, and the
    # (tables x query) left join from the literal leg list preserves
    # the old per-leg zero-hit rows.
    sweep = lsh_multitable_topk_sweep(
        q, c, id_col="vec_id", vec_col="embedding", k=5, planes=3,
        tables_list=_TBL_SWEEP, dim=DIM,
    )
    hits = (
        brute.select("query_id", "neighbor_id")
        .join(
            sweep.select("tables", "query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("tables", "query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    legs_lit = spark.range(1).select(
        F.explode(F.array(*[F.lit(int(t)) for t in _TBL_SWEEP])).alias("tables")
    )
    return qs.crossJoin(legs_lit).join(hits, ["tables", "query_id"], "left").select(
        F.col("tables").cast("long").alias("tables"),
        "query_id",
        "n_true",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        (
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_true").cast("double")
        ).alias("recall"),
    )


def _fix_tables_sweep_oracle() -> None:
    from sql_engine_spark.queries.similarity import (
        _BRUTE_ORACLE,
        _lsh_multitable_oracle,
    )
    from sql_engine_spark.registry import _REGISTRY

    legs = "\n        UNION ALL\n".join(
        f"""
        SELECT CAST({t} AS BIGINT) AS tables, qs.query_id, qs.n_true,
               COALESCE(h.n_hits, 0) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                   / CAST(qs.n_true AS DOUBLE) AS recall
        FROM qs LEFT JOIN (
            SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM brute b
            JOIN ({_lsh_multitable_oracle(3, t, 5)}) l
              ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
            GROUP BY b.query_id
        ) h ON qs.query_id = h.query_id"""
        for t in _TBL_SWEEP
    )
    _REGISTRY["ann_lsh_tables_recall_sweep"].oracle = f"""
        WITH brute AS ({_BRUTE_ORACLE}),
        qs AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM brute GROUP BY query_id
        )
        {legs}
    """


_fix_tables_sweep_oracle()
