"""Round-9 multimodal/statistics pair: quadrant aHash partial-region
near-dup and an integer-exact Chebyshev concentration check.

- multimodal_quadrant_ahash: the region-local variant of
  multimodal_ahash_dhash — four 16-bit average-hashes, one per 4x4
  quadrant of the deterministic luma grid, candidate pairs by EXACT
  quadrant-hash equality. A crop/patch duplicate matches on surviving
  quadrants even when the global hash moves — the standard
  partial-duplicate trick (tiled/blockwise perceptual hashing).
  Spelled fully relationally in both engines (md5-nibble grid, integer
  mean test 16*val > qsum, 16-bit packs).
- agg_chebyshev_bound_check: for k in {2,3,4}, the observed fraction
  of daily event counts within k sigma against Chebyshev's
  distribution-free floor 1 - 1/k^2. The membership test is EXACT
  integer arithmetic ((n x - S)^2 < k^2 (n Q - S^2)) — no float
  threshold anywhere; the only doubles are the two report divisions.
  The sanity gate for every z-score-based anomaly rule in the repo
  (events_anomaly_zscore, streaming_anomaly_zscore): if the observed
  fractions hug the Chebyshev floor the distribution is heavy-tailed
  and z-thresholds are uninformative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.queries.round9_stats import _SQL_DAILY, _daily
from sql_engine_spark.registry import register

_N = 8


@register(
    "multimodal_quadrant_ahash",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   md5(text || '#0') AS h0, md5(text || '#1') AS h1,
                   md5(text || '#2') AS h2, md5(text || '#3') AS h3
            FROM documents
        ),
        cells(i, j) AS (
            VALUES {", ".join(f"({i}, {j})" for i in range(_N) for j in range(_N))}
        ),
        grid AS (
            SELECT doc_id, i, j,
                   CAST(16 * (strpos('0123456789abcdef',
                                     substring(h, 2 * b + 1, 1)) - 1)
                      + (strpos('0123456789abcdef',
                                substring(h, 2 * b + 2, 1)) - 1) AS BIGINT) AS val
            FROM (
                SELECT d.doc_id, c.i, c.j,
                       CASE (8 * c.i + c.j) // 16
                            WHEN 0 THEN h0 WHEN 1 THEN h1
                            WHEN 2 THEN h2 ELSE h3 END AS h,
                       (8 * c.i + c.j) % 16 AS b
                FROM d CROSS JOIN cells c
            )
        ),
        q AS (
            SELECT doc_id,
                   2 * (i // 4) + (j // 4) AS quad,
                   4 * (i % 4) + (j % 4) AS pos,
                   val
            FROM grid
        ),
        qsum AS (
            SELECT doc_id, quad, CAST(SUM(val) AS BIGINT) AS s
            FROM q GROUP BY doc_id, quad
        ),
        qh AS (
            SELECT q.doc_id, q.quad,
                   CAST(SUM(CASE WHEN 16 * q.val > t.s
                            THEN (1::BIGINT << q.pos) ELSE 0 END)
                        AS BIGINT) AS qhash
            FROM q JOIN qsum t ON t.doc_id = q.doc_id AND t.quad = q.quad
            GROUP BY q.doc_id, q.quad
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_quadrant_matches
        FROM qh a JOIN qh b
          ON a.quad = b.quad AND a.qhash = b.qhash
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """,
    doc="Quadrant average-hash partial-region near-dup: the "
    "deterministic 8x8 luma grid (multimodal_ahash_dhash's fully "
    "relational md5-nibble derivation, no Python stage) split into "
    "four 4x4 quadrants, each packed to a 16-bit aHash with the exact "
    "integer mean test 16*val > quadrant_sum; candidate pairs join on "
    "EXACT (quadrant, hash) equality with the match count reported "
    "(4 = full agreement, 1-3 = partial/cropped overlap — the "
    "blockwise trick global hashes miss). The equality join is the "
    "banded-LSH shape: ~n^2/2^16 expected candidates per quadrant on "
    "random content; at 100 TB compose with the bucket cap exactly as "
    "dedup_minhash_lsh_capped. Constant per-image work (64 rows).",
)
def multimodal_quadrant_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        *[
            F.md5(F.concat(F.col("text"), F.lit(f"#{c}"))).alias(f"h{c}")
            for c in range(4)
        ],
    )
    # Pure-map quadrant hashes (r12, guide §2.4 remove shuffles
    # outright): the old spelling exploded each doc to a 64-row grid
    # (crossJoin) and rebuilt the quadrant hash with a groupBy, a
    # grid-to-sum join and a second groupBy — three shuffles of a
    # 64x-replicated relation to compute what is a per-row function of
    # the four md5 strings. All arithmetic is integer (hex-digit
    # extraction, sums, comparisons), so evaluating the identical
    # cell values, quadrant sums and bit tests as codegen'd column
    # expressions is exact; stack() emits the same (doc_id, quad,
    # qhash) rows with zero pre-join shuffles.
    def _val(p: int) -> str:
        k, b = divmod(p, 16)
        return (
            f"CAST((instr('0123456789abcdef', substring(h{k}, {2 * b + 1}, 1)) - 1) "
            f"* 16 + (instr('0123456789abcdef', substring(h{k}, {2 * b + 2}, 1)) - 1) "
            f"AS BIGINT)"
        )

    quad_cols = []
    for Q in range(4):
        ps = [
            8 * (4 * (Q // 2) + pos // 4) + (4 * (Q % 2) + pos % 4)
            for pos in range(16)
        ]
        vals = [_val(p) for p in ps]
        s_expr = " + ".join(vals)
        bits = " + ".join(
            f"(CASE WHEN 16 * {vals[pos]} > __s{Q} "
            f"THEN CAST({1 << pos} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for pos in range(16)
        )
        quad_cols.append((f"__s{Q}", s_expr, f"__q{Q}", bits))
    with_sums = d.select(
        "doc_id",
        *[F.col(f"h{c}") for c in range(4)],
        *[F.expr(s).alias(name) for name, s, _, _ in quad_cols],
    )
    with_hashes = with_sums.select(
        "doc_id",
        *[F.expr(bits).alias(qname) for _, _, qname, bits in quad_cols],
    )
    stack_expr = (
        "stack(4, "
        + ", ".join(f"CAST({Q} AS INT), __q{Q}" for Q in range(4))
        + ") as (quad, qhash)"
    )
    qh = _persist(with_hashes.selectExpr("doc_id", stack_expr))
    a = qh.select(F.col("doc_id").alias("id_a"), "quad", "qhash")
    b = qh.select(F.col("doc_id").alias("id_b"), "quad", "qhash")
    return (
        a.join(b, ["quad", "qhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_quadrant_matches"))
    )


_CHEB_KS = (2, 3, 4)


@register(
    "agg_chebyshev_bound_check",
    oracle=f"""
        WITH {_SQL_DAILY},
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cnt) AS BIGINT) AS s1,
                   CAST(SUM(cnt * cnt) AS BIGINT) AS q
            FROM daily
        ),
        ks(k) AS (VALUES {", ".join(f"({k})" for k in _CHEB_KS)}),
        w AS (
            SELECT ks.k, s.n,
                   CAST(SUM(CASE WHEN (s.n * d.cnt - s.s1)
                                      * (s.n * d.cnt - s.s1)
                                    < ks.k * ks.k
                                      * (s.n * s.q - s.s1 * s.s1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_within
            FROM daily d CROSS JOIN s CROSS JOIN ks
            GROUP BY ks.k, s.n
        )
        SELECT CAST(k AS BIGINT) AS k, n AS n_days, n_within,
               CAST(n_within AS DOUBLE) / CAST(n AS DOUBLE) AS frac_within,
               1.0 - 1.0 / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE))
                   AS chebyshev_floor,
               CAST(n_within AS DOUBLE) / CAST(n AS DOUBLE)
                   >= 1.0 - 1.0 / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE))
                   AS satisfied
        FROM w
    """,
    doc="Chebyshev concentration check on the daily event-rate series: "
    f"for k in {_CHEB_KS}, the observed fraction of days within k "
    "sigma of the mean vs the distribution-free floor 1 - 1/k^2 "
    "(which ANY distribution satisfies in expectation). The "
    "within-k-sigma test is EXACT INTEGER arithmetic — "
    "(n x - S)^2 < k^2 (n Q - S^2) clears every denominator, so no "
    "float mean/variance threshold exists to drift cross-engine; the "
    "only doubles are the two report divisions. Observed fractions "
    "hugging the floor mean heavy tails — the applicability gate for "
    "all z-score anomaly rules (events_anomaly_zscore and its "
    "streaming twin). One daily aggregate + a 3-row grid pass.",
)
def agg_chebyshev_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    s = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("q"),
    )
    ks = F.broadcast(
        spark.createDataFrame([(k,) for k in _CHEB_KS], "k long")
    )
    dev = F.col("n") * F.col("cnt") - F.col("s1")
    nvar = F.col("n") * F.col("q") - F.col("s1") * F.col("s1")
    w = (
        daily.crossJoin(F.broadcast(s))
        .crossJoin(ks)
        .groupBy("k", "n")
        .agg(
            F.sum(
                F.when(dev * dev < F.col("k") * F.col("k") * nvar, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_within")
        )
    )
    frac = F.col("n_within").cast("double") / F.col("n").cast("double")
    floor = F.lit(1.0) - F.lit(1.0) / (
        F.col("k").cast("double") * F.col("k").cast("double")
    )
    return w.select(
        "k",
        F.col("n").alias("n_days"),
        "n_within",
        frac.alias("frac_within"),
        floor.alias("chebyshev_floor"),
        (frac >= floor).alias("satisfied"),
    )
