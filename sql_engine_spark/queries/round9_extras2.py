"""Round-9 late batch: engine/join/lakehouse/sketch operators.

- join_bloom_prune: Bloom-filter semi-join reduction (runtime-filter
  pattern) with an exactness + false-positive audit.
- select_lateral_topn: Spark 4 / DuckDB LATERAL correlated-subquery
  join (top-N per driving row).
- scalar_distinct_predicates: IS [NOT] DISTINCT FROM / NULLIF /
  COALESCE / NULL-skipping GREATEST-LEAST parity grid.
- maintenance_zorder_clustering: Z-order (Morton) vs linear file
  clustering audit — min-max envelope volumes and file-skipping rates,
  the measuring operator behind a lakehouse OPTIMIZE ZORDER decision.
- approx_kmv_intersection: bottom-k (KMV) sketch SET OPERATIONS —
  union/Jaccard/intersection estimates between two behavioral cohorts,
  with the exact values and the house deterministic-tolerance claim.
- sample_priority_weighted: Duffield-Lund-Thorup priority sampling
  (weighted without-replacement sample with an unbiased subset-sum
  estimator), deterministic via the md5-uniform device.

The reference engine has none of this surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207); all six are
engine-beyond-reference coverage per SURVEY.md §2.5, spelled libm-free
(house rule) so every double crosses engines bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# Shared md5 -> 48-bit integer device (house convention, round8_extras.py)
# ---------------------------------------------------------------------------

_H48_M = 16**12  # 48-bit hash space


def _h48(col: F.Column) -> F.Column:
    """48-bit integer from the md5 hex prefix (Spark side)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def _sql_h48(expr: str) -> str:
    """DuckDB spelling of the identical 48-bit md5 device."""
    return (
        "list_reduce(list_transform(range(1, 13), "
        "i -> CAST(instr('0123456789abcdef', "
        f"substring(md5(CAST({expr} AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


# ---------------------------------------------------------------------------
# join_bloom_prune — Bloom semi-join reduction with an exactness audit
# ---------------------------------------------------------------------------

_BLOOM_BITS = 4096
_BLOOM_BAL = 4500.0

_SQL_BLOOM = f"""
        sup AS (
            SELECT s_suppkey FROM supplier WHERE s_acctbal > {_BLOOM_BAL}
        ),
        sup_h AS (
            SELECT s_suppkey, {_sql_h48('s_suppkey')} AS hv FROM sup
        ),
        bits AS (
            SELECT DISTINCT pos FROM (
                SELECT hv % {_BLOOM_BITS} AS pos FROM sup_h
                UNION ALL
                SELECT (hv // {_BLOOM_BITS}) % {_BLOOM_BITS} AS pos FROM sup_h
            )
        ),
        probe AS (
            SELECT l_suppkey, l_extendedprice, l_discount,
                   {_sql_h48('l_suppkey')} AS hv
            FROM lineitem
        ),
        cand AS (
            SELECT * FROM probe
            WHERE hv % {_BLOOM_BITS} IN (SELECT pos FROM bits)
              AND (hv // {_BLOOM_BITS}) % {_BLOOM_BITS} IN (SELECT pos FROM bits)
        ),
        joined AS (
            SELECT c.l_extendedprice, c.l_discount
            FROM cand c JOIN sup s ON c.l_suppkey = s.s_suppkey
        )
"""


@register(
    "join_bloom_prune",
    oracle=f"""
        WITH {_SQL_BLOOM}
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS probe_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS bloom_candidates,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM joined) AS true_matches,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
                 - (SELECT CAST(COUNT(*) AS BIGINT) FROM joined)
                 AS false_positive_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
               (SELECT {sql_dsum('l_extendedprice * (1.0 - l_discount)')}
                FROM joined) AS matched_revenue
    """,
    doc="Bloom-filter semi-join reduction (the 'runtime filter' / "
    "sideways-information-passing pattern every warehouse engine ships: "
    "Spark's own InjectRuntimeFilter, ORC/Iceberg bloom skipping): the "
    "small build side (suppliers over a balance threshold) publishes a "
    f"{_BLOOM_BITS}-bit Bloom filter as a TINY broadcast relation of set "
    "bit positions (k=2 hash functions from one 48-bit md5); the probe "
    "side (lineitem) is pruned by two broadcast LEFT SEMI joins BEFORE "
    "the real join ever shuffles. At 100 TB the probe-side scan output "
    "drops by the Bloom's rejection rate while the filter itself stays "
    "KB-sized regardless of corpus size. The final join keeps the result "
    "EXACT (Bloom false positives only widen the candidate set); the "
    "audit row reports probe/candidate/match counts, the measured "
    "false-positive overshoot, and the matched revenue (dsum, "
    "order-independent). Oracle replicates the identical bit positions, "
    "so the pruning arithmetic itself is exact-checked.",
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > _BLOOM_BAL)
        .select("s_suppkey")
    )
    sup_h = sup.select("s_suppkey", _h48(F.col("s_suppkey")).alias("hv"))
    bits = (
        sup_h.select((F.col("hv") % _BLOOM_BITS).alias("pos"))
        .unionAll(
            sup_h.select(
                ((F.col("hv") / _BLOOM_BITS).cast("long") % _BLOOM_BITS).alias(
                    "pos"
                )
            )
        )
        .distinct()
    )
    probe = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    probe_h = probe.withColumn("hv", _h48(F.col("l_suppkey")))
    p1 = (F.col("hv") % _BLOOM_BITS).alias("p1")
    p2 = ((F.col("hv") / _BLOOM_BITS).cast("long") % _BLOOM_BITS).alias("p2")
    keyed = probe_h.select("l_suppkey", "l_extendedprice", "l_discount", p1, p2)
    cand = keyed.join(
        F.broadcast(bits.withColumnRenamed("pos", "p1")), "p1", "left_semi"
    ).join(F.broadcast(bits.withColumnRenamed("pos", "p2")), "p2", "left_semi")
    # One pass over the pruned probe side for BOTH the candidate count
    # and the match statistics (r12, guide §1.2): the old spelling
    # evaluated `cand` twice (a count job and an inner-join aggregate),
    # each a full lineitem scan through the two Bloom semi-joins. A
    # LEFT join against the (unique-keyed) supplier side makes matches
    # = non-null rows, so candidates/matches/revenue fold in one
    # aggregate over one scan; the revenue addend set is unchanged
    # (SUM skips the null arm), so dsum is bit-identical.
    lj = cand.join(F.broadcast(sup), cand.l_suppkey == sup.s_suppkey, "left")
    probe_rows = probe.agg(F.count("*").cast("long").alias("probe_rows"))
    cand_match = lj.agg(
        F.count("*").cast("long").alias("bloom_candidates"),
        F.count("s_suppkey").cast("long").alias("true_matches"),
        dsum(
            F.when(
                F.col("s_suppkey").isNotNull(),
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            )
        ).alias("matched_revenue"),
    )
    nbits = bits.agg(F.count("*").cast("long").alias("bits_set"))
    return (
        probe_rows.crossJoin(F.broadcast(cand_match))
        .crossJoin(F.broadcast(nbits))
        .select(
            "probe_rows",
            "bloom_candidates",
            "true_matches",
            (F.col("bloom_candidates") - F.col("true_matches")).alias(
                "false_positive_rows"
            ),
            "bits_set",
            "matched_revenue",
        )
    )


# ---------------------------------------------------------------------------
# select_lateral_topn — LATERAL correlated-subquery join
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o
    WHERE c.c_custkey < 50
"""


@register(
    "select_lateral_topn",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated-subquery join (SQL:1999 lateral derived "
    "table; Spark 4 `JOIN LATERAL`, DuckDB `JOIN LATERAL`): top-2 "
    "orders by price per driving customer row, the per-row-subquery "
    "idiom the reference cannot parse at all (single-SELECT planner, "
    "/root/reference/src/planner/mod.rs:202-207). Catalyst decorrelates "
    "the lateral subquery into a ranked window over one shuffle rather "
    "than a per-row rescan — the IDENTICAL SQL text runs on both "
    "engines, so this is a pure dialect-parity pin.",
)
def select_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# scalar_distinct_predicates — NULL-semantics predicate parity grid
# ---------------------------------------------------------------------------

_DISTINCT_SQL = """
    SELECT a, b,
           a IS DISTINCT FROM b AS is_distinct,
           a IS NOT DISTINCT FROM b AS is_not_distinct,
           NULLIF(a, b) AS nullif_ab,
           COALESCE(a, b, -1) AS coalesce_ab,
           GREATEST(a, b) AS greatest_ab,
           LEAST(a, b) AS least_ab
    FROM (VALUES (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
                 (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)),
                 (CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
                 (CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
                 (CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS t(a, b)
"""


@register(
    "scalar_distinct_predicates",
    oracle=_DISTINCT_SQL,
    doc="NULL-semantics scalar grid: IS [NOT] DISTINCT FROM (the "
    "null-safe equality the reference approximates with its NULL=NULL "
    "quirk, ref expression.rs:109 — SURVEY §7.4 documents our standard-"
    "3VL deviation, and THIS operator pins the standard-SQL spelling "
    "that subsumes it), NULLIF, COALESCE, and the NULL-SKIPPING "
    "GREATEST/LEAST convention both Spark and DuckDB inherit from "
    "Postgres (NULL operands ignored, not propagated). Identical SQL "
    "text on both engines over a literal VALUES grid covering "
    "NULL/NULL, NULL/x, x/NULL, x/x, x/y.",
)
def scalar_distinct_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_DISTINCT_SQL)


# ---------------------------------------------------------------------------
# maintenance_zorder_clustering — Morton-order file clustering audit
# ---------------------------------------------------------------------------

_ZFILE_ROWS = 500  # rows per simulated data file


def _sql_bits8(expr: str) -> str:
    """0..255 integer -> 16-bit-interleave contribution (x lane)."""
    return " + ".join(
        f"(({expr} // {1 << i}) % 2) * {4 ** i}" for i in range(8)
    )


_SQL_ZORDER = f"""
        mx AS (
            SELECT CAST(MAX(l_partkey) AS BIGINT) AS max_p,
                   CAST(MAX(l_suppkey) AS BIGINT) AS max_s
            FROM lineitem
        ),
        pts AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   (l_partkey * 256) // (max_p + 1) AS x8,
                   (l_suppkey * 256) // (max_s + 1) AS y8
            FROM lineitem CROSS JOIN mx
        ),
        z AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   CAST({_sql_bits8('x8')} AS BIGINT)
                   + 2 * CAST({_sql_bits8('y8')} AS BIGINT) AS zval
            FROM pts
        ),
        filed AS (
            SELECT l_partkey, l_suppkey,
                   (row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
                       // {_ZFILE_ROWS} AS file_linear,
                   (row_number() OVER (ORDER BY zval, l_orderkey, l_linenumber)
                       - 1) // {_ZFILE_ROWS} AS file_zorder
            FROM z
        ),
        stacked AS (
            SELECT 'linear' AS strategy, file_linear AS file_id,
                   l_partkey, l_suppkey
            FROM filed
            UNION ALL
            SELECT 'zorder' AS strategy, file_zorder AS file_id,
                   l_partkey, l_suppkey
            FROM filed
        ),
        env AS (
            SELECT strategy, file_id,
                   CAST(MIN(l_partkey) AS BIGINT) AS min_p,
                   CAST(MAX(l_partkey) AS BIGINT) AS max_p,
                   CAST(MIN(l_suppkey) AS BIGINT) AS min_s,
                   CAST(MAX(l_suppkey) AS BIGINT) AS max_s
            FROM stacked GROUP BY strategy, file_id
        )
        SELECT strategy,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM((max_p - min_p + 1) * (max_s - min_s + 1))
                    AS BIGINT) AS envelope_volume,
               CAST(SUM(CASE WHEN min_p <= (SELECT max_p FROM mx) // 4
                              AND min_s <= (SELECT max_s FROM mx) // 4
                             THEN 1 ELSE 0 END) AS BIGINT) AS probe_files_hit
        FROM env
        GROUP BY strategy
"""


@register(
    "maintenance_zorder_clustering",
    oracle=f"WITH {_SQL_ZORDER}",
    doc="Z-order (Morton-interleave) vs linear file-clustering audit — "
    "the measuring operator behind a lakehouse OPTIMIZE ZORDER decision "
    "(Delta Lake OPTIMIZE ZORDER BY; Iceberg sort-order z-order; Morton "
    "1966): scale (l_partkey, l_suppkey) to 8-bit lanes, interleave to a "
    "16-bit z-value IN PURE INTEGER ARITHMETIC (//, %, * only — "
    f"identical in both engines), cut {_ZFILE_ROWS}-row files under the "
    "linear write order vs the z-order, and report each strategy's total "
    "min-max envelope volume plus how many files a corner-quadrant probe "
    "(p <= max/4 AND s <= max/4) must read. Z-ordering shrinks per-file "
    "envelopes on BOTH dimensions, so zone-map skipping prunes "
    "multi-predicate scans that a single-column sort cannot — exactly "
    "the file-skipping economics that dominate 100 TB scan cost. The "
    "global sorts here are the real cost an OPTIMIZE job pays (a range "
    "exchange per rewrite), not a per-query cost.",
)
def maintenance_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    mx = li.agg(
        F.max("l_partkey").cast("long").alias("max_p"),
        F.max("l_suppkey").cast("long").alias("max_s"),
    )
    pts = li.crossJoin(F.broadcast(mx)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "max_p",
        "max_s",
        F.expr("(l_partkey * 256) DIV (max_p + 1)").alias("x8"),
        F.expr("(l_suppkey * 256) DIV (max_s + 1)").alias("y8"),
    )
    zx = " + ".join(f"((x8 DIV {1 << i}) % 2) * {4 ** i}" for i in range(8))
    zy = " + ".join(f"((y8 DIV {1 << i}) % 2) * {4 ** i}" for i in range(8))
    z = pts.withColumn(
        "zval", F.expr(f"CAST({zx} AS BIGINT) + 2 * CAST({zy} AS BIGINT)")
    ).withColumn(
        "__key", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    # Both file orders rank through the bucketed two-level scan — a bare
    # global row_number window would funnel the whole rewrite through
    # one task; the real OPTIMIZE job's range exchange is exactly what
    # bucketed_value_rank spells.
    from sql_engine_spark.io import table_row_count
    from sql_engine_spark.operators.prefix import bucketed_value_rank

    n_rows = table_row_count(sf_dir, "lineitem")
    r1 = bucketed_value_rank(
        z,
        part_cols=[],
        value_col="__key",
        tie_col="__key",
        n_rows=n_rows,
        out_col="__rk_lin",
    )
    r2 = bucketed_value_rank(
        r1,
        part_cols=[],
        value_col="zval",
        tie_col="__key",
        n_rows=n_rows,
        out_col="__rk_z",
    )
    filed = r2.select(
        "l_partkey",
        "l_suppkey",
        "max_p",
        "max_s",
        ((F.col("__rk_lin") - 1) / _ZFILE_ROWS).cast("long").alias(
            "file_linear"
        ),
        ((F.col("__rk_z") - 1) / _ZFILE_ROWS).cast("long").alias(
            "file_zorder"
        ),
    )
    # Both strategies from ONE evaluation of `filed` (r12, guide §1.2):
    # the two-leg union re-ran the whole double-rank pipeline (two
    # bucketed range exchanges over lineitem) once per leg; stack()
    # re-keys each row to its two (strategy, file_id) forms inside the
    # same map task.
    env = (
        filed.selectExpr(
            "stack(2, 'linear', file_linear, 'zorder', file_zorder) "
            "as (strategy, file_id)",
            "l_partkey",
            "l_suppkey",
            "max_p",
            "max_s",
        )
        .groupBy("strategy", "file_id")
        .agg(
            F.min("l_partkey").cast("long").alias("min_p"),
            F.max("l_partkey").cast("long").alias("fmax_p"),
            F.min("l_suppkey").cast("long").alias("min_s"),
            F.max("l_suppkey").cast("long").alias("fmax_s"),
            F.first("max_p").alias("gmax_p"),
            F.first("max_s").alias("gmax_s"),
        )
    )
    return env.groupBy("strategy").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(
            (F.col("fmax_p") - F.col("min_p") + 1)
            * (F.col("fmax_s") - F.col("min_s") + 1)
        )
        .cast("long")
        .alias("envelope_volume"),
        F.sum(
            F.when(
                (F.col("min_p") <= F.expr("gmax_p DIV 4"))
                & (F.col("min_s") <= F.expr("gmax_s DIV 4")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("probe_files_hit"),
    )


# ---------------------------------------------------------------------------
# approx_kmv_intersection — bottom-k sketch set operations
# ---------------------------------------------------------------------------

_KMVI_K = 64

_SQL_KMVI = f"""
        a AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        ),
        b AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        ),
        ah AS (SELECT {_sql_h48('user_id')} AS hv FROM a),
        bh AS (SELECT {_sql_h48('user_id')} AS hv FROM b),
        uh AS (SELECT hv FROM ah UNION SELECT hv FROM bh),
        bottom AS (SELECT hv FROM uh ORDER BY hv LIMIT {_KMVI_K}),
        kth AS (
            SELECT CAST(MAX(hv) AS BIGINT) AS h_k,
                   CAST(COUNT(*) AS BIGINT) AS k_used
            FROM bottom
        ),
        marked AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k_both
            FROM bottom
            WHERE hv IN (SELECT hv FROM ah) AND hv IN (SELECT hv FROM bh)
        ),
        exact AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM (SELECT user_id FROM a
                          INTERSECT SELECT user_id FROM b)) AS exact_inter,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM (SELECT user_id FROM a
                          UNION SELECT user_id FROM b)) AS exact_union
        ),
        est AS (
            SELECT k_used, h_k, k_both,
                   CASE WHEN k_used < {_KMVI_K}
                        THEN CAST(k_used AS DOUBLE)
                        ELSE (CAST({_KMVI_K} AS DOUBLE) - 1.0)
                             * (CAST({_H48_M} AS DOUBLE)
                                / CAST(h_k AS DOUBLE)) END AS union_est,
                   CAST(k_both AS DOUBLE) / CAST(k_used AS DOUBLE)
                       AS jaccard_est
            FROM kth CROSS JOIN marked
        )
        SELECT k_used, h_k, k_both, union_est, jaccard_est,
               jaccard_est * union_est AS inter_est,
               exact_union, exact_inter,
               CAST(exact_inter AS DOUBLE) / CAST(exact_union AS DOUBLE)
                   AS exact_jaccard,
               abs(jaccard_est * union_est - CAST(exact_inter AS DOUBLE))
                   <= 0.5 * CAST(exact_union AS DOUBLE) AS within_half_union
        FROM est CROSS JOIN exact
"""


@register(
    "approx_kmv_intersection",
    oracle=f"WITH {_SQL_KMVI}",
    doc="KMV bottom-k sketch SET OPERATIONS (Beyer et al. SIGMOD'07, "
    "'On synopses for distinct-value estimation under multiset "
    "operations'): the purchase-user and click-user sets each keep only "
    f"their {_KMVI_K} smallest 48-bit md5 hashes; the union sketch is "
    "bottom-k of the merged sketches, the Jaccard estimate is the "
    "fraction of the union sketch present in BOTH input sketches, and "
    "intersection = Jaccard x union-KMV-estimate. This is the 100 TB "
    "answer to 'how much do these two billion-user cohorts overlap' "
    "WITHOUT a full distinct-intersection shuffle: each side's synopsis "
    "is k values (mergeable by union+truncate), so audience-overlap "
    "matrices cost k x cohorts, not a quadratic set join. Exact "
    "union/intersection computed alongside; the accuracy claim is the "
    "house deterministic-tolerance boolean (estimate AND claim both "
    "hash-checked). Small cohorts (fewer than k union hashes) degrade "
    "to exact counts by construction.",
)
def approx_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    ah = a.select(_h48(F.col("user_id")).alias("hv"))
    bh = b.select(_h48(F.col("user_id")).alias("hv"))
    uh = ah.union(bh).distinct()
    bottom = uh.orderBy("hv").limit(_KMVI_K)
    kth = bottom.agg(
        F.max("hv").cast("long").alias("h_k"),
        F.count("*").cast("long").alias("k_used"),
    )
    marked = (
        bottom.join(ah, "hv", "left_semi")
        .join(bh, "hv", "left_semi")
        .agg(F.count("*").cast("long").alias("k_both"))
    )
    exact = (
        a.intersect(b)
        .agg(F.count("*").cast("long").alias("exact_inter"))
        .crossJoin(
            F.broadcast(
                a.union(b)
                .distinct()
                .agg(F.count("*").cast("long").alias("exact_union"))
            )
        )
    )
    m = kth.crossJoin(F.broadcast(marked)).crossJoin(F.broadcast(exact))
    union_est = F.when(
        F.col("k_used") < _KMVI_K, F.col("k_used").cast("double")
    ).otherwise(
        (F.lit(float(_KMVI_K)) - F.lit(1.0))
        * (F.lit(float(_H48_M)) / F.col("h_k").cast("double"))
    )
    jac = F.col("k_both").cast("double") / F.col("k_used").cast("double")
    out = m.select(
        "k_used",
        "h_k",
        "k_both",
        union_est.alias("union_est"),
        jac.alias("jaccard_est"),
        (jac * union_est).alias("inter_est"),
        "exact_union",
        "exact_inter",
        (
            F.col("exact_inter").cast("double")
            / F.col("exact_union").cast("double")
        ).alias("exact_jaccard"),
        (
            F.abs(jac * union_est - F.col("exact_inter").cast("double"))
            <= F.lit(0.5) * F.col("exact_union").cast("double")
        ).alias("within_half_union"),
    )
    return out


# ---------------------------------------------------------------------------
# sample_priority_weighted — Duffield-Lund-Thorup priority sampling
# ---------------------------------------------------------------------------

_PRI_K = 100

_SQL_PRI = f"""
        w AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                   CAST(n_chars AS DOUBLE)
                   / ((CAST({_sql_h48('doc_id')} AS DOUBLE) + 1.0)
                      / {float(_H48_M)}) AS priority
            FROM documents
        ),
        r AS (
            SELECT doc_id, weight, priority,
                   CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
                        AS BIGINT) AS rk
            FROM w
        ),
        tau AS (
            SELECT COALESCE(MAX(CASE WHEN rk = {_PRI_K + 1} THEN priority END),
                            0.0) AS tau
            FROM r WHERE rk <= {_PRI_K + 1}
        ),
        samp AS (
            SELECT doc_id, weight, priority, rk,
                   CASE WHEN CAST(weight AS DOUBLE) > tau
                        THEN CAST(weight AS DOUBLE) ELSE tau END AS w_hat
            FROM r CROSS JOIN tau WHERE rk <= {_PRI_K}
        ),
        tot AS (
            SELECT CAST(SUM(weight) AS BIGINT) AS exact_total FROM w
        ),
        est AS (
            SELECT {sql_ssum('w_hat')} AS est_total FROM samp
        )
        SELECT doc_id, weight, priority, rk, w_hat, est_total, exact_total
        FROM samp CROSS JOIN est CROSS JOIN tot
"""


@register(
    "sample_priority_weighted",
    oracle=f"WITH {_SQL_PRI}",
    doc="Priority sampling (Duffield, Lund & Thorup, JACM 2007): a "
    "weighted without-replacement sample with an UNBIASED subset-sum "
    "estimator. Each document draws u ~ U(0,1] from the deterministic "
    "md5 device, priority q = weight/u; keep the top-k priorities and "
    "set tau to the (k+1)-th; each kept row's weight estimate is "
    "max(weight, tau), whose sample sum estimates the corpus total "
    "EXACTLY in expectation (variance-optimal up to a factor among "
    "k-sparse schemes). The 100 TB posture: the top-k runs as a "
    "per-partition bottom-k merge (TakeOrdered — no global sort), the "
    "synopsis is k rows, and ANY weighted subset-sum query (tokens by "
    "source, bytes by language) can be answered from the sample with "
    "max(w, tau) weights. est_total crosses engines via ssum; the "
    f"corpus-total is an exact BIGINT sum. k = {_PRI_K}; corpora "
    "smaller than k+1 degrade to tau = 0, i.e. the exact total.",
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        (
            F.col("n_chars").cast("double")
            / (
                (_h48(F.col("doc_id")).cast("double") + F.lit(1.0))
                / F.lit(float(_H48_M))
            )
        ).alias("priority"),
    )
    # Top-(k+1) through the salted two-level rank (r11 window sweep):
    # priorities exist for EVERY document, so a bare global row_number
    # would funnel the corpus through one task. Bit-identical to the
    # single-window spelling — (desc priority, asc doc_id) is a strict
    # total order.
    from sql_engine_spark.operators.similarity import two_level_topk

    top = two_level_topk(
        w.withColumn("__q", F.lit(1)),
        score_col="priority",
        k=_PRI_K + 1,
        rank_col="rk",
        query_col="__q",
        id_col="doc_id",
    ).drop("__q")
    tau = top.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == _PRI_K + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    samp = (
        top.where(F.col("rk") <= _PRI_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id",
            "weight",
            "priority",
            "rk",
            F.when(
                F.col("weight").cast("double") > F.col("tau"),
                F.col("weight").cast("double"),
            )
            .otherwise(F.col("tau"))
            .alias("w_hat"),
        )
    )
    tot = w.agg(F.sum("weight").cast("long").alias("exact_total"))
    est = samp.agg(ssum(F.col("w_hat")).alias("est_total"))
    return samp.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(tot))
