"""Similarity-search queries over the `embeddings` table (64-dim float
vectors): exact brute-force cosine top-k baseline and the LSH-bucketed
approximate variant (the 100 TB scale path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.similarity import (
    brute_force_topk,
    lsh_multitable_topk,
    lsh_topk,
    sql_lsh_bucket,
)
from sql_engine_spark.operators.graph import sql_knn_shared
from sql_engine_spark.operators.graph import sql_pagerank_fixed
from sql_engine_spark.registry import register

DIM = 64
_COS = """
    list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
"""

_BRUTE_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
        FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
"""


@register(
    "ann_brute_topk",
    oracle=_BRUTE_ORACLE,
    doc="Exact cosine top-5 for 10 query vectors over the corpus: broadcast "
    "queries x corpus scan + per-query window. The correctness baseline "
    "for ANN.",
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    )


def _lsh_oracle(planes: int) -> str:
    bucket = sql_lsh_bucket("e", planes, DIM)
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        vb AS (SELECT vec_id, e, {bucket} AS bucket FROM v),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   q.bucket AS bucket, {_COS} AS cosine
            FROM vb q JOIN vb c ON q.bucket = c.bucket
             AND q.vec_id < 10 AND c.vec_id >= 10
        )
        SELECT query_id, neighbor_id, bucket, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= 5
    """


@register(
    "ann_lsh_topk",
    oracle=_lsh_oracle(4),
    doc="Approximate top-5 via random-hyperplane LSH (4 planes -> 16 "
    "buckets): bucket equi-join replaces the cross join; exact cosine "
    "re-ranks inside the bucket. The corpus shuffles once by bucket.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        planes=4,
        dim=DIM,
    )


def _derived_lsh_oracle(sf_dir: str) -> str:
    """Oracle for the DERIVED-planes LSH path: the plane count is a pure
    function of the corpus row count (operators/similarity.derived_planes),
    so the SQL is deterministic per dataset — rendered with the exact
    count the Spark build derives from (a metadata-only parquet count)."""
    import duckdb

    from sql_engine_spark.operators.similarity import derived_planes

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet' WHERE vec_id >= 10"
    ).fetchone()[0]
    return _lsh_oracle(derived_planes(n))


@register(
    "ann_lsh_topk_derived",
    oracle=_derived_lsh_oracle,
    doc="LSH top-5 with the plane count DERIVED from the corpus size "
    "(planes = ceil(log2(n / 1024)), floored/capped — "
    "operators/similarity.derived_planes) instead of pinned: the 100 TB "
    "posture, where bucket volume stays ~constant as corpora grow. The "
    "oracle is a callable (sf_dir -> SQL) rendering the same derived "
    "count, so the derived path is oracle-verified end-to-end, not just "
    "recall-floor-tested.",
)
def ann_lsh_topk_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        planes=None,  # derive from the corpus count
        dim=DIM,
    )


def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
        f" (x, y) -> x + y)"
    )


def _ivf_oracle(num_centroids: int, nprobe: int, k: int) -> str:
    # Mirrors operators/similarity.py:ivf_topk exactly (same op order, so
    # bit-identical): unit-norm centroids, RAW-vector cell assignment
    # (argmax dot is invariant to the row's positive scale), and cosine =
    # dot(q_norm, raw) / norm with the norm computed once per row.
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id, e, n, list_transform(e, x -> x / n) AS nv
            FROM (SELECT vec_id, e,
                         sqrt(list_reduce(list_transform(e, x -> x * x),
                                          (a, b) -> a + b)) AS n
                  FROM v)
        ),
        cents AS (
            SELECT vec_id AS cent_id, nv AS ce FROM nrm
            WHERE vec_id >= 10 ORDER BY vec_id LIMIT {num_centroids}
        ),
        corp AS (
            SELECT vec_id, e, n, cent_id FROM (
                SELECT c.vec_id, c.e, c.n, t.cent_id,
                       row_number() OVER (PARTITION BY c.vec_id
                                          ORDER BY {_dot('c.e', 't.ce')} DESC, t.cent_id) AS rn
                FROM nrm c CROSS JOIN cents t
                WHERE c.vec_id >= 10
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id, nv, cent_id FROM (
                SELECT q.vec_id, q.nv, t.cent_id,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY {_dot('q.nv', 't.ce')} DESC, t.cent_id) AS rn
                FROM nrm q CROSS JOIN cents t
                WHERE q.vec_id < 10
            ) WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                   c.cent_id AS cell, ({_dot('p.nv', 'c.e')} / c.n) AS cosine
            FROM probes p JOIN corp c ON p.cent_id = c.cent_id
        )
        SELECT query_id, neighbor_id, cell, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


@register(
    "ann_ivf_topk",
    oracle=_ivf_oracle(4, 2, 5),
    doc="IVF approximate top-5: corpus vectors partitioned into 4 cells "
    "by nearest centroid, queries probe their 2 nearest cells, exact "
    "cosine re-ranks the probed cells only. The corpus shuffles once by "
    "cell; candidates ~ nprobe/num_centroids of the corpus. Centroids "
    "are the lowest-id corpus vectors (deterministic stand-in for "
    "k-means; identical plan shape).",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        num_centroids=4,
        nprobe=2,
    )


def _lsh_multitable_oracle(planes: int, tables: int, k: int) -> str:
    qb = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {sql_lsh_bucket('e', planes, DIM, offset=t * planes)} AS b "
        f"FROM v WHERE vec_id < 10"
        for t in range(tables)
    )
    cb = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {sql_lsh_bucket('e', planes, DIM, offset=t * planes)} AS b "
        f"FROM v WHERE vec_id >= 10"
        for t in range(tables)
    )
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        qb AS ({qb}),
        cb AS ({cb}),
        cands AS (
            SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
            FROM qb JOIN cb ON qb.t = cb.t AND qb.b = cb.b
        ),
        scored AS (
            SELECT query_id, neighbor_id, {_COS} AS cosine
            FROM cands
            JOIN v q ON q.vec_id = query_id
            JOIN v c ON c.vec_id = neighbor_id
        )
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


@register(
    "ann_lsh_multitable_topk",
    oracle=_lsh_multitable_oracle(3, 4, 5),
    doc="Multi-table LSH top-5 (4 tables x 3 planes, OR-amplified): "
    "candidate = shares a bucket in ANY table, exact cosine re-ranks "
    "the union. The higher-recall point on the LSH dial vs "
    "ann_lsh_topk's single table (recall 1-(1-p)^4 vs p) for 4x "
    "bucket rows; candidates still ~tables/2^planes of the corpus.",
)
def ann_lsh_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_multitable_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        planes=3,
        tables=4,
        dim=DIM,
    )


def _ivf_kmeans_oracle(
    num_centroids: int, nprobe: int, k: int, iters: int,
    sample_hex: str | None = "8",
) -> str:
    """Mirror of operators/similarity.py:ivf_kmeans_topk, including the
    ordered per-dimension reduction that makes the centroid means exact
    (list(x ORDER BY vec_id) = Spark's array_sort(collect_list(...));
    both sum left-to-right from a 0.0 accumulator). Training (seed pick
    + Lloyd assignment) is restricted to the same deterministic
    md5-prefix sample the Spark side trains on (`sample_hex` None =
    train on everything — the small-corpus outcome of
    derived_sample_hex)."""
    assert iters == 1, "oracle spelled out for one Lloyd iteration"
    sample = (
        f"substring(md5(CAST(c.vec_id AS VARCHAR)), 1, {len(sample_hex)})"
        f" < '{sample_hex}'"
        if sample_hex is not None
        else "TRUE"
    )
    # Assignment runs on the RAW vector (argmax dot against unit centroids
    # is invariant to the row's positive scale) — mirrors
    # operators/similarity.py:train_kmeans_literal / ivf_kmeans_topk.
    assign = (
        "SELECT c.vec_id, c.e, c.n, t.cent_id,"
        "       row_number() OVER (PARTITION BY c.vec_id"
        f"                         ORDER BY {_dot('c.e', 't.ce')} DESC, t.cent_id) AS rn"
    )
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id, e, n, list_transform(e, x -> x / n) AS nv
            FROM (SELECT vec_id, e,
                         sqrt(list_reduce(list_transform(e, x -> x * x),
                                          (a, b) -> a + b)) AS n
                  FROM v)
        ),
        c0 AS (
            SELECT c.vec_id AS cent_id, c.nv AS ce FROM nrm c
            WHERE c.vec_id >= 10 AND {sample}
            ORDER BY c.vec_id LIMIT {num_centroids}
        ),
        a0 AS (
            SELECT vec_id, e, n, cent_id FROM (
                {assign}
                FROM nrm c CROSS JOIN c0 t
                WHERE c.vec_id >= 10 AND {sample}
            ) WHERE rn = 1
        ),
        dims AS (
            SELECT cent_id, vec_id, generate_subscripts(e, 1) AS d,
                   unnest(list_transform(e, x -> x / n)) AS x
            FROM a0
        ),
        mu AS (
            SELECT cent_id, d,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list(x ORDER BY vec_id)),
                               (a, b) -> a + b) / COUNT(*) AS mu
            FROM dims GROUP BY cent_id, d
        ),
        cm AS (SELECT cent_id, list(mu ORDER BY d) AS m FROM mu GROUP BY cent_id),
        c1 AS (
            SELECT cent_id, list_transform(m, x -> x / n) AS ce
            FROM (SELECT cent_id, m,
                         sqrt(list_reduce(list_transform(m, x -> x * x),
                                          (a, b) -> a + b)) AS n
                  FROM cm)
        ),
        corp AS (
            SELECT vec_id, e, n, cent_id FROM (
                {assign}
                FROM nrm c CROSS JOIN c1 t
                WHERE c.vec_id >= 10
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id, nv, cent_id FROM (
                SELECT q.vec_id, q.nv, t.cent_id,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY {_dot('q.nv', 't.ce')} DESC, t.cent_id) AS rn
                FROM nrm q CROSS JOIN c1 t
                WHERE q.vec_id < 10
            ) WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                   c.cent_id AS cell, ({_dot('p.nv', 'c.e')} / c.n) AS cosine
            FROM probes p JOIN corp c ON p.cent_id = c.cent_id
        )
        SELECT query_id, neighbor_id, cell, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


_KMEANS_TRAIN_TARGET = 250


def _derived_ivf_kmeans_oracle(sf_dir: str) -> str:
    """Callable oracle (sf_dir -> SQL) for the DERIVED training-sample
    path: the hex threshold is a pure function of the corpus row count
    (operators/similarity.derived_sample_hex), rendered here with the
    exact count the Spark build derives from."""
    import duckdb

    from sql_engine_spark.operators.similarity import derived_sample_hex

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet' WHERE vec_id >= 10"
    ).fetchone()[0]
    return _ivf_kmeans_oracle(
        4, 2, 5, 1,
        sample_hex=derived_sample_hex(n, target_train_rows=_KMEANS_TRAIN_TARGET),
    )


@register(
    "ann_ivf_kmeans_topk",
    oracle=_derived_ivf_kmeans_oracle,
    doc="IVF top-5 with TRAINED centroids: one spherical k-means (Lloyd) "
    "iteration over a deterministic md5-prefix SAMPLE refines the "
    "seeds ('sample, then train' — the FAISS posture), then the usual "
    "cell-partition + nprobe probing over the FULL corpus. The sample "
    "threshold is DERIVED from the corpus count (derived_sample_hex, "
    "the derived_* sizing convention): the sampled-in training set "
    "stays ~target rows as corpora grow, instead of a fixed fraction "
    "that is still 50 TB of a 100 TB corpus. Centroids iterate through "
    "the driver as literals (the MLlib pattern), so assignment and "
    "probing are map-side expressions; the ordered vector-sum update "
    "keeps training bit-reproducible under any partitioning. Only "
    "corpus-sized shuffle: the final rank window.",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.io import count_cached, table_row_count
    from sql_engine_spark.operators.similarity import (
        derived_sample_hex,
        ivf_kmeans_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    # The filtered-corpus count memoizes per (process, dataset) — the
    # footer full count minus the 10 query vectors when ids are dense,
    # but computed honestly on the filtered relation ONCE (r8 verdict
    # #3: this count() was a real Spark job per build).
    n = count_cached(
        sf_dir, "embeddings", "vec_id>=10", lambda: corpus.count()
    )
    assert n <= table_row_count(sf_dir, "embeddings")
    return ivf_kmeans_topk(
        emb.where(F.col("vec_id") < 10),
        corpus,
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        num_centroids=4,
        nprobe=2,
        iterations=1,
        train_sample_hex=derived_sample_hex(
            n, target_train_rows=_KMEANS_TRAIN_TARGET
        ),
    )


_CLASSIFY_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    nrm AS (
        SELECT vec_id, label, e, n
        FROM (SELECT vec_id, label, e,
                     sqrt(list_reduce(list_transform(e, x -> x * x),
                                      (a, b) -> a + b)) AS n
              FROM v)
    ),
    dims AS (
        SELECT label AS lbl, vec_id, generate_subscripts(e, 1) AS d,
               unnest(list_transform(e, x -> x / n)) AS x
        FROM nrm
    ),
    mu AS (
        SELECT lbl, d,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(x ORDER BY vec_id)),
                           (a, b) -> a + b) / COUNT(*) AS mu
        FROM dims GROUP BY lbl, d
    ),
    cm AS (SELECT lbl, list(mu ORDER BY d) AS m FROM mu GROUP BY lbl),
    cents AS (
        SELECT lbl, list_transform(m, x -> x / n) AS ce
        FROM (SELECT lbl, m,
                     sqrt(list_reduce(list_transform(m, x -> x * x),
                                      (a, b) -> a + b)) AS n
              FROM cm)
    )
    SELECT vec_id, label, lbl AS predicted FROM (
        SELECT nrm.vec_id, nrm.label, c.lbl,
               row_number() OVER (PARTITION BY nrm.vec_id
                                  ORDER BY {_dot('nrm.e', 'c.ce')} DESC, c.lbl) AS rn
        FROM nrm CROSS JOIN cents c
    ) WHERE rn = 1
"""


@register(
    "ann_centroid_classify",
    oracle=_CLASSIFY_ORACLE,
    doc="Nearest-class-centroid (Rocchio) classification over the "
    "embeddings table: per-label normalized mean centroids (ordered "
    "reduction, bit-reproducible), then every vector gets the label of "
    "its most-cosine-similar centroid. Self-classification agreement is "
    "the standard cheap probe of whether embeddings cluster by label. "
    "K centroids broadcast; classification is a map-side argmax.",
)
def ann_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import nearest_centroid_classify

    emb = load(spark, sf_dir, "embeddings")
    return nearest_centroid_classify(
        emb, id_col="vec_id", vec_col="embedding", label_col="label"
    )


def _pq_oracle(subspaces: int, sub_centroids: int, k: int, rerank: int) -> str:
    """Mirror of operators/similarity.py:pq_topk: unit sub-centroids from
    the lowest-id corpus vectors, RAW-slice code assignment (scale-
    invariant argmax), ADC score = ordered sum (from 0.0) of the
    code-selected query-table entries building a per-query shortlist of
    `rerank`, then exact cosine (dot(q_norm, raw)/norm) re-orders it."""
    dsub = DIM // subspaces
    sl = f"[t.m * {dsub} + 1 : t.m * {dsub} + {dsub}]"
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nn AS (
            SELECT vec_id, e,
                   sqrt(list_reduce(list_transform(e, x -> x * x),
                                    (a, b) -> a + b)) AS n
            FROM v
        ),
        seeds AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j,
                   list_transform(e, x -> x / n) AS nv
            FROM (SELECT vec_id, e, n FROM nn WHERE vec_id >= 10
                  ORDER BY vec_id LIMIT {sub_centroids})
        ),
        ms AS (SELECT unnest(range(0, {subspaces})) AS m),
        cent AS (
            SELECT ms.m, s.j, s.nv[ms.m * {dsub} + 1 : ms.m * {dsub} + {dsub}] AS ce
            FROM seeds s CROSS JOIN ms
        ),
        codes AS (
            SELECT vec_id, list(j ORDER BY m) AS codes FROM (
                SELECT c.vec_id, t.m, t.j,
                       row_number() OVER (PARTITION BY c.vec_id, t.m
                                          ORDER BY {_dot(f'c.e{sl}', 't.ce')} DESC, t.j) AS rn
                FROM nn c CROSS JOIN cent t WHERE c.vec_id >= 10
            ) WHERE rn = 1 GROUP BY vec_id
        ),
        qt AS (
            SELECT q.vec_id AS query_id, t.m, t.j,
                   {_dot(f'list_transform(q.e, x -> x / q.n){sl}', 't.ce')} AS tv
            FROM nn q CROSS JOIN cent t WHERE q.vec_id < 10
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list(q.tv ORDER BY q.m)),
                               (a, b) -> a + b) AS approx_dot
            FROM codes c JOIN qt q ON q.j = c.codes[q.m + 1]
            GROUP BY q.query_id, c.vec_id
        ),
        short AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY approx_dot DESC, neighbor_id) AS ra
                FROM scored
            ) WHERE ra <= {rerank}
        )
        SELECT query_id, neighbor_id,
               ({_dot('list_transform(q.e, x -> x / q.n)', 'c.e')} / c.n) AS cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY ({_dot('list_transform(q.e, x -> x / q.n)', 'c.e')} / c.n) DESC,
                                                neighbor_id) AS BIGINT) AS rank
        FROM short
        JOIN nn q ON q.vec_id = query_id
        JOIN nn c ON c.vec_id = neighbor_id
        QUALIFY rank <= {k}
    """


@register(
    "ann_pq_topk",
    oracle=_pq_oracle(8, 16, 5, 50),
    doc="Product-quantization (ADC) approximate top-5 with exact re-rank: "
    "corpus vectors compressed to 8 one-byte codes (one per 8-dim "
    "subspace, nearest of 16 unit sub-centroids), queries precompute an "
    "8x16 dot-product table, a candidate's ADC score is 8 table lookups "
    "+ adds, and exact cosine re-orders each query's top-50 shortlist. "
    "The memory-bounded ANN path at 100 TB: the PQ index is ~1% the "
    "size of the raw vectors, encoding is one Arrow-batched numpy pass, "
    "the only corpus-sized shuffle is the ADC rank window, and the "
    "exact math touches only queries x 50 rows. Sub-centroids seed "
    "from the lowest-id vectors (deterministic stand-in for trained "
    "codebooks, as in ann_ivf_topk).",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    return pq_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        subspaces=8,
        sub_centroids=16,
        dim=DIM,
        rerank=50,
    )


def _ivfpq_oracle(
    num_centroids: int, nprobe: int, subspaces: int, sub_centroids: int,
    k: int, rerank: int,
) -> str:
    """Mirror of operators/similarity.py:ivfpq_topk — IVF cells + PQ codes
    + ADC shortlist + exact re-rank, all from the same raw-assignment /
    ordered-fold spellings as the component oracles."""
    dsub = DIM // subspaces
    sl = f"[t.m * {dsub} + 1 : t.m * {dsub} + {dsub}]"
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        nn AS (
            SELECT vec_id, e,
                   sqrt(list_reduce(list_transform(e, x -> x * x),
                                    (a, b) -> a + b)) AS n
            FROM v
        ),
        nrm AS (SELECT vec_id, e, n, list_transform(e, x -> x / n) AS nv FROM nn),
        cents AS (
            SELECT vec_id AS cent_id, nv AS ce FROM nrm
            WHERE vec_id >= 10 ORDER BY vec_id LIMIT {num_centroids}
        ),
        cells AS (
            SELECT vec_id, cent_id FROM (
                SELECT c.vec_id, t.cent_id,
                       row_number() OVER (PARTITION BY c.vec_id
                                          ORDER BY {_dot('c.e', 't.ce')} DESC, t.cent_id) AS rn
                FROM nrm c CROSS JOIN cents t
                WHERE c.vec_id >= 10
            ) WHERE rn = 1
        ),
        seeds AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, nv
            FROM (SELECT vec_id, nv FROM nrm WHERE vec_id >= 10
                  ORDER BY vec_id LIMIT {sub_centroids})
        ),
        ms AS (SELECT unnest(range(0, {subspaces})) AS m),
        cent AS (
            SELECT ms.m, s.j, s.nv[ms.m * {dsub} + 1 : ms.m * {dsub} + {dsub}] AS ce
            FROM seeds s CROSS JOIN ms
        ),
        codes AS (
            SELECT vec_id, list(j ORDER BY m) AS codes FROM (
                SELECT c.vec_id, t.m, t.j,
                       row_number() OVER (PARTITION BY c.vec_id, t.m
                                          ORDER BY {_dot(f'c.e{sl}', 't.ce')} DESC, t.j) AS rn
                FROM nn c CROSS JOIN cent t WHERE c.vec_id >= 10
            ) WHERE rn = 1 GROUP BY vec_id
        ),
        qt AS (
            SELECT q.vec_id AS query_id, t.m, t.j,
                   {_dot(f'list_transform(q.e, x -> x / q.n){sl}', 't.ce')} AS tv
            FROM nn q CROSS JOIN cent t WHERE q.vec_id < 10
        ),
        probes AS (
            SELECT vec_id AS query_id, cent_id FROM (
                SELECT q.vec_id, t.cent_id,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY {_dot('q.nv', 't.ce')} DESC, t.cent_id) AS rn
                FROM nrm q CROSS JOIN cents t
                WHERE q.vec_id < 10
            ) WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT p.query_id, cl.vec_id AS neighbor_id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list(q.tv ORDER BY q.m)),
                               (a, b) -> a + b) AS approx_dot
            FROM probes p
            JOIN cells cl ON cl.cent_id = p.cent_id
            JOIN codes c ON c.vec_id = cl.vec_id
            JOIN qt q ON q.query_id = p.query_id AND q.j = c.codes[q.m + 1]
            GROUP BY p.query_id, cl.vec_id
        ),
        short AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY approx_dot DESC, neighbor_id) AS ra
                FROM scored
            ) WHERE ra <= {rerank}
        )
        SELECT query_id, neighbor_id,
               ({_dot('list_transform(q.e, x -> x / q.n)', 'c.e')} / c.n) AS cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY ({_dot('list_transform(q.e, x -> x / q.n)', 'c.e')} / c.n) DESC,
                                                neighbor_id) AS BIGINT) AS rank
        FROM short
        JOIN nn q ON q.vec_id = query_id
        JOIN nn c ON c.vec_id = neighbor_id
        QUALIFY rank <= {k}
    """


@register(
    "ann_ivfpq_topk",
    oracle=_ivfpq_oracle(4, 2, 8, 16, 5, 50),
    doc="IVF-PQ approximate top-5 (the FAISS IVFPQ composition): the IVF "
    "coarse quantizer restricts each query to its 2 nearest of 4 cells, "
    "candidates there are scored by PQ asymmetric distance (8 one-byte "
    "codes, 8 table lookups per candidate — no vector math), and exact "
    "cosine re-ranks each query's top-50 shortlist. Candidates ~ "
    "nprobe/num_centroids of the corpus (vs pq_topk's full ADC scan) "
    "AND each candidate costs table lookups instead of a 64-dim dot "
    "(vs ann_ivf_topk) — the memory- and compute-bounded shape that "
    "serves billion-vector corpora.",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        num_centroids=4,
        nprobe=2,
        subspaces=8,
        sub_centroids=16,
        dim=DIM,
        rerank=50,
    )


def _lsh_range_oracle(planes: int, tables: int, threshold: float) -> str:
    qb = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {sql_lsh_bucket('e', planes, DIM, offset=t * planes)} AS b "
        f"FROM v WHERE vec_id < 10"
        for t in range(tables)
    )
    cb = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {sql_lsh_bucket('e', planes, DIM, offset=t * planes)} AS b "
        f"FROM v WHERE vec_id >= 10"
        for t in range(tables)
    )
    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        qb AS ({qb}),
        cb AS ({cb}),
        cands AS (
            SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
            FROM qb JOIN cb ON qb.t = cb.t AND qb.b = cb.b
        )
        SELECT query_id, neighbor_id, {_COS} AS cosine
        FROM cands
        JOIN v q ON q.vec_id = query_id
        JOIN v c ON c.vec_id = neighbor_id
        WHERE {_COS} >= {threshold}
    """


@register(
    "ann_range_search",
    oracle=_lsh_range_oracle(3, 4, 0.28),
    doc="Range (radius) search: every corpus neighbor with cosine >= "
    "0.28 per query — the 'all near-duplicates of this document' API, "
    "complementing top-k. Multi-table LSH (4x3 planes) generates "
    "candidates, exact cosine verifies; NO window, rank, or per-query "
    "sort anywhere in the plan — one bounded bucket equi-join, one "
    "verify join, a filter. Precision exact, recall the LSH dial.",
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import lsh_range_search

    emb = load(spark, sf_dir, "embeddings")
    return lsh_range_search(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.28,
        planes=3,
        tables=4,
        dim=DIM,
    )


@register(
    "ann_knn_graph",
    oracle=sql_knn_shared(),
    doc="Batch kNN-graph: every corpus vector's top-5 approximate "
    "cosine neighbors via 4-table x 4-plane OR-amplified LSH (the "
    "standardized graph-family params — operators/graph.knn_graph_shared "
    "builds this exact relation ONCE per process and every graph "
    "operator scans it) — the "
    "primitive behind SemDeDup clustering, kNN-LM datastores, and "
    "hard-negative mining. Candidates are bucket-confined (no "
    "all-pairs stage); ranking is a plain per-source window, correct "
    "at scale because src is corpus-cardinality (bounded per-vector "
    "candidate lists spread over all tasks), unlike the few-literal-"
    "queries regime where the salted two-level top-k is required.",
)
def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared

    return knn_graph_shared(spark, sf_dir)


@register(
    "graph_pagerank_knn",
    oracle=sql_pagerank_fixed(
        "SELECT vec_id AS node FROM embeddings",
        f"SELECT src, dst FROM ({sql_knn_shared(k=3)})",
        iterations=3,
    ),
    doc="Fixed-iteration PageRank (3 rounds, damping 0.85) over the "
    "top-3 kNN semantic graph — centrality in embedding space, the "
    "graph-analytics side of SemDeDup-style curation (high-rank nodes "
    "are cluster hubs / template centers). One join + one aggregate "
    "per round (the standard distributed PR loop); contributions are "
    "DECIMAL-rounded so sums are order-independent and the oracle "
    "unrolls the identical rounds (operators/graph.py).",
)
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared, pagerank_fixed

    emb = load(spark, sf_dir, "embeddings")
    # k=3 is a rank filter on the shared k=5 relation: rank is the
    # per-src (cosine DESC, dst ASC) row_number, so rank <= 3 of the
    # k=5 build IS the k=3 build — no second graph construction.
    edges = knn_graph_shared(spark, sf_dir, k=3).select("src", "dst")
    nodes = emb.select(F.col("vec_id").alias("node"))
    return pagerank_fixed(nodes, edges, iterations=3)
