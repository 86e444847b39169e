"""Round-9 curation coreset selectors: greedy k-center over the
embedding corpus and greedy max-coverage over the retrieval vocabulary.

Both are the classic data-selection primitives (Sener & Savarese 2018
use k-center greedy as THE active-learning coreset; max coverage is
the canonical submodular-maximization baseline with the 1 - 1/e
guarantee, Nemhauser et al. 1978) spelled in the house
driver-unrolled posture of train_kmeans_literal: the selection loop
runs k bounded rounds, each round is ONE distributed aggregate over
the corpus (argmax with deterministic ties) plus a 1-row collect, and
the selected items re-enter the plan as literals. The DuckDB oracle
unrolls the IDENTICAL rounds as generated CTEs, so the greedy
trajectory — not just the final set — is exact-checked. No libm;
distances are the silhouette module's sqrt(dot) spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.vectors import dot, sql_dot
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import register

_KC_K = 5


def _sql_kcenter() -> str:
    rounds = []
    for r in range(1, _KC_K + 1):
        if r == 1:
            rounds.append(
                "c1 AS (SELECT vec_id, e, nn FROM vn "
                "WHERE vec_id = (SELECT MIN(vec_id) FROM vn))"
            )
        else:
            rounds.append(
                f"c{r} AS (SELECT vec_id, e, nn FROM m{r - 1} "
                f"ORDER BY md{r - 1} DESC, vec_id LIMIT 1)"
            )
        dist = (
            f"greatest(CAST(0.0 AS DOUBLE), "
            f"vn.nn - 2.0 * {sql_dot('vn.e', f'c{r}.e')} + c{r}.nn)"
        )
        md = dist if r == 1 else f"least(vn.md{r - 1}, {dist})"
        src = "vn" if r == 1 else f"m{r - 1} vn"
        rounds.append(
            f"m{r} AS (SELECT vn.vec_id, vn.e, vn.nn, {md} AS md{r} "
            f"FROM {src} CROSS JOIN c{r})"
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT vec_id FROM c{r}) AS vec_id, "
        f"(SELECT sqrt(MAX(md{r})) FROM m{r}) AS radius_after"
        for r in range(1, _KC_K + 1)
    )
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        vn AS (SELECT vec_id, e, {sql_dot('e', 'e')} AS nn FROM v),
        {", ".join(rounds)}
        {finals}
    """


@register(
    "curation_kcenter_coreset",
    oracle=_sql_kcenter(),
    doc=f"Greedy k-center coreset (k={_KC_K}) over the embedding corpus "
    "— the Gonzalez 1985 2-approximation and the Sener-Savarese "
    "active-learning selector: seed at the minimum vec_id, then "
    "repeatedly take the point FARTHEST from its nearest selected "
    "center (squared-Euclidean via the three-fold dot spelling, ties "
    "to the smaller id), reporting after each round the covering "
    "radius max-min distance. k driver rounds, each ONE corpus "
    "aggregate + a 1-row collect (the train_kmeans_literal posture — "
    "centers re-enter as literal arrays, so the per-round pass is "
    "map-side arithmetic + one max); the oracle unrolls the identical "
    "rounds, exact-checking the greedy TRAJECTORY. The radius column "
    "is the coreset quality curve a curation pipeline reads to pick "
    "k.",
)
def curation_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    v = _persist(
        emb.select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
        ).withColumn("nn", dot("e", "e"))
    )
    first = v.orderBy("vec_id").limit(1).select("vec_id", "e", "nn").collect()[0]
    centers = [(1, first.vec_id)]

    def dist_to(row) -> F.Column:
        lit = "array(" + ", ".join(f"{float(x)!r}D" for x in row.e) + ")"
        return F.greatest(
            F.lit(0.0),
            F.col("nn")
            - F.lit(2.0) * dot(F.col("e"), F.expr(lit))
            + F.lit(float(row.nn)),
        )

    dcols = [dist_to(first)]
    for r in range(2, _KC_K + 1):
        md = F.least(*dcols) if len(dcols) > 1 else dcols[0]
        nxt = (
            v.select("vec_id", "e", "nn", md.alias("md"))
            .orderBy(F.desc("md"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        centers.append((r, nxt.vec_id))
        dcols.append(dist_to(nxt))
    aggs = [
        F.max(F.least(*dcols[:r]) if r > 1 else dcols[0]).alias(f"m{r}")
        for r in range(1, _KC_K + 1)
    ]
    radii = v.agg(*aggs)
    stack = radii.selectExpr(
        f"stack({_KC_K}, "
        + ", ".join(f"CAST({r} AS BIGINT), m{r}" for r in range(1, _KC_K + 1))
        + ") as (round, r2)"
    )
    cdf = spark.createDataFrame(centers, "round long, vec_id long")
    return (
        F.broadcast(cdf)
        .join(stack, "round")
        .select("round", "vec_id", F.sqrt("r2").alias("radius_after"))
    )


# Universe: the top-df 3-gram SHINGLE digests from the shared
# hashed-shingle relation — the synthetic corpus has only ~31 distinct
# TOKENS (greedy coverage would saturate in one round), but ~16k
# distinct shingles; per-doc distinct shingles max ~100, so 5 rounds
# cannot exhaust a 1,000-shingle universe at any scale factor.
_MC_V = 1000
_MC_K = 5


def _sql_maxcover() -> str:
    from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens

    rounds = []
    for r in range(1, _MC_K + 1):
        prev_filter = (
            "" if r == 1 else f"WHERE dig NOT IN (SELECT dig FROM cov{r - 1})"
        )
        rounds.append(
            f"s{r} AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sc "
            f"FROM dvv {prev_filter} GROUP BY doc_id)"
        )
        rounds.append(
            f"p{r} AS MATERIALIZED (SELECT doc_id, sc FROM s{r} "
            f"ORDER BY sc DESC, doc_id LIMIT 1)"
        )
        new_src = (
            f"SELECT dig FROM dvv WHERE doc_id = (SELECT doc_id FROM p{r})"
            + ("" if r == 1 else f" AND dig NOT IN (SELECT dig FROM cov{r - 1})")
        )
        rounds.append(f"new{r} AS MATERIALIZED ({new_src})")
        cov_src = (
            f"SELECT dig FROM new{r}"
            if r == 1
            else f"SELECT dig FROM cov{r - 1} UNION SELECT dig FROM new{r}"
        )
        rounds.append(f"cov{r} AS MATERIALIZED ({cov_src})")
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT doc_id FROM p{r}) AS doc_id, "
        f"(SELECT sc FROM p{r}) AS new_shingles, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM cov{r}) AS covered_total, "
        f"(SELECT CAST(COUNT(*) AS DOUBLE) FROM cov{r}) "
        f"/ (SELECT CAST(COUNT(*) AS DOUBLE) FROM vocab) AS coverage_frac"
        for r in range(1, _MC_K + 1)
    )
    toks = sql_tokens("text")
    return f"""
        WITH docs AS (
            SELECT doc_id, {sql_shingles(toks, 3)} AS sh FROM documents
        ),
        dv AS MATERIALIZED (
            SELECT DISTINCT doc_id, md5(s) AS dig
            FROM (SELECT doc_id, unnest(sh) AS s FROM docs)
        ),
        vocab AS (
            SELECT dig FROM (
                SELECT dig, CAST(COUNT(*) AS BIGINT) AS df
                FROM dv GROUP BY dig
            ) ORDER BY df DESC, dig LIMIT {_MC_V}
        ),
        dvv AS MATERIALIZED (
            SELECT doc_id, dig FROM dv
            WHERE dig IN (SELECT dig FROM vocab)
        ),
        {", ".join(rounds)}
        {finals}
    """


@register(
    "curation_submodular_coverage",
    oracle=_sql_maxcover(),
    doc=f"Greedy submodular max-coverage selection (k={_MC_K}) over the "
    f"top-{_MC_V} document-frequency vocabulary from the shared "
    "retrieval index: each round picks the document covering the most "
    "STILL-UNCOVERED vocabulary tokens (ties to the smaller doc_id) — "
    "the Nemhauser-Wolsey-Fisher greedy with its (1 - 1/e) guarantee, "
    "the canonical diversity-selection baseline for training-data "
    "subset curation (facility-location family). k driver rounds of "
    "one postings aggregate each, the covered set re-entering as a "
    "bounded literal; the oracle unrolls the identical rounds "
    "(trajectory-exact, like curation_kcenter_coreset). Output is the "
    "marginal-gain curve (new_tokens per round) plus cumulative "
    "coverage — the diminishing-returns read that says when to stop "
    "selecting.",
)
def curation_submodular_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import shingle_hs_shared

    hs = shingle_hs_shared(spark, sf_dir)
    alldv = hs.select(
        F.col("__id").alias("doc_id"), F.explode("__hs").alias("dig")
    )
    dfreq = alldv.groupBy("dig").agg(F.count("*").cast("long").alias("df"))
    vocab = [
        r.dig
        for r in dfreq.orderBy(F.desc("df"), F.asc("dig")).limit(_MC_V).collect()
    ]
    dv = _persist(alldv.where(F.col("dig").isin(vocab)))
    covered: set[str] = set()
    picked = []
    for r in range(1, _MC_K + 1):
        rem = dv.where(~F.col("dig").isin(list(covered))) if covered else dv
        # One job per round, not two (r12, guide §1.2): the winner's
        # still-uncovered dig list rides the same aggregate that
        # computes its score (TakeOrdered moves only the single top
        # row to the driver; the list is bounded by the doc's vocab
        # membership), replacing the old second scan-and-filter job.
        s = rem.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("sc"),
            F.collect_list("dig").alias("__digs"),
        )
        top_rows = s.orderBy(F.desc("sc"), F.asc("doc_id")).limit(1).collect()
        if not top_rows:
            raise RuntimeError(
                "submodular coverage saturated the universe before round "
                f"{r}; raise _MC_V above {_MC_V}"
            )
        top = top_rows[0]
        new_digs = set(top["__digs"])
        covered |= new_digs
        # Divide by the ACTUAL universe size — min(_MC_V, distinct
        # shingles) — matching the oracle's COUNT(*) FROM vocab (review
        # finding: the constant diverges on corpora with < _MC_V
        # distinct shingles).
        picked.append(
            (r, int(top.doc_id), int(top.sc), len(covered), len(covered) / len(vocab))
        )
    return spark.createDataFrame(
        picked,
        "round long, doc_id long, new_shingles long, covered_total long, "
        "coverage_frac double",
    )
