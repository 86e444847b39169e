"""Round-9 extras: lakehouse manifest diff, embedding kNN label-margin
audit, and quadratic-weighted kappa.

- maintenance_manifest_diff: the time-travel DIFF between consecutive
  snapshot versions of the shared expiry fixture (round8_eval) — the
  added/removed/kept file sets with verified row counts, i.e. what an
  Iceberg/Delta `history` + `files` comparison reports before an
  expire/vacuum is approved.
- emb_knn_margin_audit: per label, how much closer (cosine) each
  vector's best SAME-label neighbor is than its best OTHER-label
  neighbor, read off the SHARED kNN graph — the margin statistic that
  tells a curation pipeline whether label clusters are separable
  before it trusts knn-label propagation (emb_knn_label_accuracy's
  continuous companion).
- quality_weighted_kappa: Cohen's kappa with quadratic weights
  (Cohen 1968) between two ordinal raters derived from document
  length features — the ordinal-agreement statistic
  curation_rater_agreement_kappa (unweighted, categorical) cannot
  express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load, table_row_count
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.graph import knn_graph_shared, sql_knn_shared
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# Manifest diff
# ---------------------------------------------------------------------------

# (from_version, to_version, file, change) — the fixture's manifest is
# deterministic (round8_eval.expiry_fixture_root), so the change map is
# shared with the oracle below.
_DIFF_ROWS = [
    (0, 1, "f0", "kept"),
    (0, 1, "f1", "kept"),
    (0, 1, "f2", "added"),
    (1, 2, "f0", "removed"),
    (1, 2, "f1", "removed"),
    (1, 2, "f01", "added"),
    (1, 2, "f2", "kept"),
]


@register(
    "maintenance_manifest_diff",
    oracle="""
        WITH c AS (
            SELECT
                CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n0,
                CAST(SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN o_orderkey % 3 = 2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n2
            FROM orders
        )
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS from_version,
                   CAST(1 AS BIGINT) AS to_version,
                   'f0' AS file, 'kept' AS change, n0 AS n_rows FROM c
            UNION ALL SELECT 0, 1, 'f1', 'kept', n1 FROM c
            UNION ALL SELECT 0, 1, 'f2', 'added', n2 FROM c
            UNION ALL SELECT 1, 2, 'f0', 'removed', n0 FROM c
            UNION ALL SELECT 1, 2, 'f1', 'removed', n1 FROM c
            UNION ALL SELECT 1, 2, 'f01', 'added', n0 + n1 FROM c
            UNION ALL SELECT 1, 2, 'f2', 'kept', n2 FROM c
        )
    """,
    doc="Snapshot manifest DIFF between consecutive versions of the "
    "shared expiry fixture (round8_eval.expiry_fixture_root): for each "
    "version transition, which data files were added / removed / kept "
    "(JSON-manifest set algebra on a file-list-sized relation) with "
    "each file's row count verified by SCANNING it (parquet footer "
    "count pushdown — evidence, not bookkeeping). v1->v2 shows the "
    "compaction rewrite: f0+f1 removed, f01 (their union) added, net "
    "row delta zero — exactly the audit a reviewer runs before "
    "approving expire-snapshots + vacuum. The diff relation stays "
    "file-count-sized at any table size.",
)
def maintenance_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os

    from sql_engine_spark.queries.round8_eval import expiry_fixture_root

    root = expiry_fixture_root(spark, sf_dir)
    with open(os.path.join(root, "manifest.json")) as f:
        mf = json.load(f)
    # Derive the change rows from the ACTUAL manifest (the literal
    # _DIFF_ROWS map documents the expectation; assert they agree so a
    # fixture drift fails loudly instead of silently diverging).
    versions = sorted(mf, key=int)
    derived = []
    for a, b in zip(versions, versions[1:]):
        fa, fb = set(mf[a]), set(mf[b])
        for fn in sorted(fa | fb):
            change = (
                "kept" if fn in fa and fn in fb else "added" if fn in fb else "removed"
            )
            derived.append((int(a), int(b), fn, change))
    assert sorted(derived) == sorted(_DIFF_ROWS), derived
    out = None
    for fv, tv, fn, change in derived:
        n = (
            spark.read.parquet(os.path.join(root, fn))
            .agg(F.count("*").cast("long").alias("n_rows"))
            .select(
                F.lit(fv).cast("long").alias("from_version"),
                F.lit(tv).cast("long").alias("to_version"),
                F.lit(fn).alias("file"),
                F.lit(change).alias("change"),
                "n_rows",
            )
        )
        out = n if out is None else out.unionAll(n)
    return out


# ---------------------------------------------------------------------------
# kNN label-margin audit
# ---------------------------------------------------------------------------


@register(
    "emb_knn_margin_audit",
    oracle=f"""
        WITH knn AS ({sql_knn_shared()}),
        lab AS (SELECT vec_id, label FROM embeddings),
        e AS (
            SELECT k.src, k.cosine,
                   CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END AS same
            FROM knn k
            JOIN lab ls ON ls.vec_id = k.src
            JOIN lab ld ON ld.vec_id = k.dst
        ),
        best AS (
            SELECT src,
                   MAX(CASE WHEN same = 1 THEN cosine END) AS best_same,
                   MAX(CASE WHEN same = 0 THEN cosine END) AS best_diff
            FROM e GROUP BY src
        ),
        m AS (
            SELECT l.label, b.best_same - b.best_diff AS margin
            FROM best b JOIN lab l ON l.vec_id = b.src
            WHERE b.best_same IS NOT NULL AND b.best_diff IS NOT NULL
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               {sql_dsum('margin')} / CAST(COUNT(*) AS DOUBLE) AS mean_margin,
               CAST(SUM(CASE WHEN margin > 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS frac_positive
        FROM m GROUP BY label
    """,
    doc="kNN label-margin audit off the SHARED graph "
    "(operators/graph.knn_graph_shared — one scan, no rebuild): per "
    "vector, margin = cosine(best same-label neighbor) - cosine(best "
    "other-label neighbor) among its top-k list; per label, the mean "
    "margin (dsum) and the fraction positive, over vectors whose list "
    "contains BOTH kinds. The continuous separability companion of "
    "emb_knn_label_accuracy (accuracy says the vote wins; the margin "
    "says by how much — the quantity that predicts whether kNN label "
    "propagation survives noise), and the label-aware reading of "
    "graph_mutual_knn_rate's hub diagnosis. Edge-sized joins only.",
)
def emb_knn_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = knn_graph_shared(spark, sf_dir)
    lab = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    e = (
        g.join(
            lab.select(F.col("vec_id").alias("src"), F.col("label").alias("ls")),
            "src",
        )
        .join(
            lab.select(F.col("vec_id").alias("dst"), F.col("label").alias("ld")),
            "dst",
        )
        .select(
            "src",
            "cosine",
            F.when(F.col("ls") == F.col("ld"), 1).otherwise(0).alias("same"),
        )
    )
    best = e.groupBy("src").agg(
        F.max(F.when(F.col("same") == 1, F.col("cosine"))).alias("best_same"),
        F.max(F.when(F.col("same") == 0, F.col("cosine"))).alias("best_diff"),
    )
    m = (
        best.where(
            F.col("best_same").isNotNull() & F.col("best_diff").isNotNull()
        )
        .join(lab.withColumnRenamed("vec_id", "src"), "src")
        .select("label", (F.col("best_same") - F.col("best_diff")).alias("margin"))
    )
    return m.groupBy("label").agg(
        F.count("*").cast("long").alias("n_nodes"),
        (dsum(F.col("margin")) / F.count("*").cast("double")).alias("mean_margin"),
        (
            F.sum(F.when(F.col("margin") > 0.0, 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("frac_positive"),
    )


# ---------------------------------------------------------------------------
# Quadratic-weighted kappa
# ---------------------------------------------------------------------------

_WK_K = 5  # ordinal buckets per rater


@register(
    "quality_weighted_kappa",
    oracle=f"""
        WITH r1 AS (
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS rk
            FROM documents
        ),
        r2 AS (
            SELECT doc_id,
                   CAST(row_number() OVER (
                        ORDER BY len({sql_tokens('text')}), doc_id)
                        AS BIGINT) AS rk
            FROM documents
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        b AS (
            SELECT r1.doc_id,
                   ({_WK_K} * (r1.rk - 1)) // n.n AS i,
                   ({_WK_K} * (r2.rk - 1)) // n.n AS j
            FROM r1 JOIN r2 USING (doc_id) CROSS JOIN n
        ),
        o AS (
            SELECT i, j, CAST(COUNT(*) AS BIGINT) AS o_ij
            FROM b GROUP BY i, j
        ),
        ri AS (SELECT i, CAST(SUM(o_ij) AS BIGINT) AS r_i FROM o GROUP BY i),
        cj AS (SELECT j, CAST(SUM(o_ij) AS BIGINT) AS c_j FROM o GROUP BY j),
        num AS (
            -- w_ij O_ij with w = (i-j)^2/(k-1)^2: exact dyadic values,
            -- plain SUM is exact under any order.
            SELECT SUM(CAST((i - j) * (i - j) AS DOUBLE)
                       / CAST(({_WK_K} - 1) * ({_WK_K} - 1) AS DOUBLE)
                       * CAST(o_ij AS DOUBLE)) AS sum_w_obs
            FROM o
        ),
        den AS (
            SELECT {sql_ssum(
                f"CAST((g.i - h.j) * (g.i - h.j) AS DOUBLE)"
                f" / CAST(({_WK_K} - 1) * ({_WK_K} - 1) AS DOUBLE)"
                f" * (CAST(g.r_i AS DOUBLE) * CAST(h.c_j AS DOUBLE)"
                f" / CAST(n.n AS DOUBLE))"
            )} AS sum_w_exp
            FROM ri g CROSS JOIN cj h CROSS JOIN n
        )
        SELECT n.n AS n_docs, num.sum_w_obs, den.sum_w_exp,
               1.0 - num.sum_w_obs / den.sum_w_exp AS kappa_weighted
        FROM n, num, den
    """,
    doc="Quadratic-weighted Cohen's kappa (Cohen 1968) between two "
    f"derived ordinal raters — the {_WK_K}-quantile bucket of n_chars "
    f"vs the {_WK_K}-quantile bucket of whitespace token count "
    "(rank-exact buckets via the bucketed two-level scan, (k(r-1)) "
    "div n, ties by doc_id): kappa_w = 1 - sum(w O) / sum(w E) with "
    "w_ij = (i-j)^2/(k-1)^2, E the marginal outer product. Observed "
    "disagreement is an exact dyadic sum (plain SUM safe); the "
    "expected grid (25 cells) folds through ssum. The ordinal-"
    "agreement statistic the unweighted categorical kappa "
    "(curation_rater_agreement_kappa) cannot express — near-diagonal "
    "disagreements cost quadratically less.",
)
def quality_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _persist(
        load(spark, sf_dir, "documents").select(
            "doc_id",
            "n_chars",
            F.size(tokens("text")).cast("long").alias("ntok"),
        )
    )
    n_rows = table_row_count(sf_dir, "documents")
    r1 = bucketed_value_rank(
        docs,
        part_cols=[],
        value_col="n_chars",
        tie_col="doc_id",
        n_rows=n_rows,
        out_col="__r1",
    ).select("doc_id", "__r1")
    r2 = bucketed_value_rank(
        docs,
        part_cols=[],
        value_col="ntok",
        tie_col="doc_id",
        n_rows=n_rows,
        out_col="__r2",
    ).select("doc_id", "__r2")
    nrel = docs.agg(F.count("*").cast("long").alias("n"))
    b = (
        r1.join(r2, "doc_id")
        .crossJoin(F.broadcast(nrel))
        .select(
            F.expr(f"({_WK_K} * (__r1 - 1)) div n").alias("i"),
            F.expr(f"({_WK_K} * (__r2 - 1)) div n").alias("j"),
        )
    )
    o = _persist(
        b.groupBy("i", "j").agg(F.count("*").cast("long").alias("o_ij"))
    )
    ri = o.groupBy("i").agg(F.sum("o_ij").cast("long").alias("r_i"))
    cj = o.groupBy("j").agg(F.sum("o_ij").cast("long").alias("c_j"))
    wk2 = float((_WK_K - 1) * (_WK_K - 1))
    num = o.agg(
        F.sum(
            ((F.col("i") - F.col("j")) * (F.col("i") - F.col("j"))).cast("double")
            / F.lit(wk2)
            * F.col("o_ij").cast("double")
        ).alias("sum_w_obs")
    )
    den = (
        ri.crossJoin(cj)
        .crossJoin(F.broadcast(nrel))
        .agg(
            ssum(
                ((F.col("i") - F.col("j")) * (F.col("i") - F.col("j"))).cast(
                    "double"
                )
                / F.lit(wk2)
                * (
                    F.col("r_i").cast("double")
                    * F.col("c_j").cast("double")
                    / F.col("n").cast("double")
                )
            ).alias("sum_w_exp")
        )
    )
    return (
        nrel.crossJoin(num)
        .crossJoin(den)
        .select(
            F.col("n").alias("n_docs"),
            "sum_w_obs",
            "sum_w_exp",
            (F.lit(1.0) - F.col("sum_w_obs") / F.col("sum_w_exp")).alias(
                "kappa_weighted"
            ),
        )
    )
