"""Scalar (int8) embedding quantization — the storage/serving compression
step every large vector store runs (FAISS `SQ8`, Milvus/pgvector int8):
4x smaller vectors, dot products in integer SIMD, with a per-dimension
affine codec trained from corpus statistics.

Symmetric per-dimension scheme (the common SQ8 variant):

    scale_d = max(|min_d|, |max_d|) / 127
    q_d(v)  = round(v / scale_d)         in [-127, 127]
    v'_d    = q_d * scale_d

Shape at 100 TB: the per-dimension stats are ONE aggregate over the
exploded (dim, value) relation — map-side combinable, `dim` rows out —
broadcast back as a literal-free join (dim is tiny); quantize + error
metrics are a pure map stage. Nothing corpus-quadratic, no driver
collect of row data.

Cross-engine bit-equality: round() ties go away-from-zero in BOTH Spark
(HALF_UP on the magnitude) and DuckDB; the reconstruction error is
folded in dimension order (list fold / aggregate), so the double sums
are order-pinned. A zero-spread dimension (scale 0) would divide by
zero — guarded to q=0 explicitly in both engines.

Reference parity note: the reference engine (dylan-p-wong/sql-engine)
has no vector types at all; this extends the training-data-pipeline
surface (SURVEY.md LLM-ops section), not a reference operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def int8_quantize_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """(dim, scale) per dimension: one explode + one bounded aggregate."""
    return (
        df.select(F.posexplode(vec_col).alias("dim", "__v"))
        .groupBy("dim")
        .agg(
            F.greatest(F.abs(F.min("__v")), F.abs(F.max("__v"))).alias("__amax")
        )
        .select(
            "dim", (F.col("__amax").cast("double") / F.lit(127.0)).alias("scale")
        )
    )


def int8_quantize(
    df: DataFrame, *, id_col: str, vec_col: str
) -> DataFrame:
    """Quantize each vector to int8 against corpus per-dim scales and
    report reconstruction error. Returns (id, n_dims, q_l1, q_min,
    q_max, recon_mse) — scalar columns (cross-engine hash-safe; the
    int8 codes themselves are a deterministic function of these
    inputs and can be materialized identically when needed)."""
    stats = int8_quantize_stats(df, vec_col)
    # dim-indexed scales as one ordered array (dim count rows — bounded),
    # joined to every row via a broadcast of a 1-row relation.
    scales = stats.agg(
        F.expr("transform(array_sort(collect_list(struct(dim, scale))), s -> s.scale)")
        .alias("__scales")
    )
    # Spark's sequence(1, 0) yields a DESCENDING [1, 0] — not empty —
    # so an empty embedding would index element_at(v, 0) and crash.
    # filter() to i <= size(v) makes the empty-vector index list [],
    # matching the oracle's empty range(1, 1).
    idx = "filter(sequence(1, greatest(size({v}), 1)), i -> i <= size({v}))"
    q = (
        "transform(" + idx + ", i -> "
        "CASE WHEN element_at(__scales, i) = CAST(0.0 AS DOUBLE) THEN 0L "
        "ELSE CAST(round(CAST(element_at({v}, i) AS DOUBLE) "
        "/ element_at(__scales, i)) AS BIGINT) END)"
    ).format(v=vec_col)
    recon_sq = (
        "aggregate(" + idx + ", CAST(0.0 AS DOUBLE), (a, i) -> "
        "a + (CAST(element_at({v}, i) AS DOUBLE) "
        "- CAST(element_at(__q, i) AS DOUBLE) * element_at(__scales, i)) "
        "* (CAST(element_at({v}, i) AS DOUBLE) "
        "- CAST(element_at(__q, i) AS DOUBLE) * element_at(__scales, i)))"
    ).format(v=vec_col)
    return (
        df.crossJoin(F.broadcast(scales))
        # Explicit NULL-vector guard, mirroring the empty-vector branch:
        # size(NULL) is NULL, which would silently flow NULL through the
        # index filter and leave q_l1 at 0 while the oracle yields NULL.
        # A NULL embedding produces NULL codes/stats in BOTH engines.
        .withColumn(
            "__q", F.when(F.col(vec_col).isNotNull(), F.expr(q))
        )
        .select(
            F.col(id_col),
            F.size(vec_col).cast("long").alias("n_dims"),
            F.expr(
                "aggregate(__q, 0L, (a, x) -> a + abs(x))"
            ).alias("q_l1"),
            F.array_min("__q").cast("long").alias("q_min"),
            F.array_max("__q").cast("long").alias("q_max"),
            # NULL mse for empty vectors (ANSI division by zero raises).
            F.when(
                F.size(vec_col) > 0,
                F.expr(recon_sq) / F.size(vec_col).cast("double"),
            ).alias("recon_mse"),
        )
    )


def sql_int8_quantize(
    *, source: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle: identical stats, codec, and fold order."""
    return f"""
        WITH dims AS (
            SELECT i AS dim,
                   greatest(abs(MIN(CAST(v AS DOUBLE))),
                            abs(MAX(CAST(v AS DOUBLE)))) / 127.0 AS scale
            FROM (
                SELECT unnest({vec_col}) AS v,
                       generate_subscripts({vec_col}, 1) AS i
                FROM {source}
            ) GROUP BY i
        ),
        sc AS (
            SELECT list_transform(list_sort(list(struct_pack(dim := dim,
                                                             scale := scale))),
                                  s -> s.scale) AS scales
            FROM dims
        ),
        q AS (
            SELECT {id_col},
                   {vec_col} AS v,
                   scales,
                   list_transform(range(1, len({vec_col}) + 1), i ->
                       CASE WHEN scales[i] = 0.0 THEN CAST(0 AS BIGINT)
                            ELSE CAST(round(CAST(v[i] AS DOUBLE) / scales[i])
                                      AS BIGINT) END) AS qv
            FROM {source} CROSS JOIN sc
        )
        SELECT {id_col},
               CAST(len(v) AS BIGINT) AS n_dims,
               -- Explicit NULL-vector branch (mirrors the Spark side's
               -- isNotNull guard): list_prepend(0, NULL) folds to 0 in
               -- DuckDB, which would silently report q_l1 = 0 for a
               -- NULL embedding.
               CASE WHEN v IS NULL THEN NULL ELSE
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(qv, x -> abs(x))), (a, x) -> a + x)
               END AS q_l1,
               CAST(list_min(qv) AS BIGINT) AS q_min,
               CAST(list_max(qv) AS BIGINT) AS q_max,
               CASE WHEN v IS NULL OR len(v) = 0 THEN NULL ELSE
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(range(1, len(v) + 1), i ->
                           (CAST(v[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE) * scales[i])
                           * (CAST(v[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE) * scales[i]))),
                       (a, x) -> a + x) / CAST(len(v) AS DOUBLE)
               END AS recon_mse
        FROM q
    """
