"""Similarity search over embedding columns (array<float>).

- `brute_force_topk`: exact cosine top-k. The query side is broadcast
  (queries are assumed small); the corpus is scanned once and the top-k is
  computed with `two_level_topk` (salted partial top-k, then a bounded
  final rank) — at scale this is one map stage + one salted shuffle plus
  a tiny survivor shuffle; no task ever sorts a corpus-proportional
  candidate set. Correct baseline for any corpus.
- `lsh_topk`: the scale path. Random-hyperplane LSH buckets both sides
  (signs of dot products against deterministic +-1 hyperplanes derived from
  md5), candidates are corpus rows sharing the query's bucket, then exact
  cosine re-ranks within the bucket. Sub-linear candidate volume; recall
  is tunable via `planes` (fewer planes -> bigger buckets -> higher recall).
- `embedding_cosine_pairs`: near-dup pairs by cosine within a blocking
  column (for dedup of embedded corpora).

All vector math is JVM-side (zip_with/aggregate); sums reduce
left-to-right over doubles, bit-identical to the DuckDB oracle's
list_reduce. HOFs run interpreted in Spark, so the operators are
written to evaluate each reduction ONCE per use: raw vectors +
materialized norm columns, never a normalized array column whose
inlined norm reduction would re-run per element (see _ivf_search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Salt fan-out for the first level of `two_level_topk`. Each query's
#: candidate stream is spread over this many tasks before any ranking
#: happens; raise it on a real cluster (candidates_per_query / buckets
#: rows must sort comfortably in one task).
ANN_SALT_BUCKETS = 32


def two_level_topk(
    scored: DataFrame,
    *,
    score_col: str,
    k: int,
    rank_col: str = "rank",
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    buckets: int = ANN_SALT_BUCKETS,
    ascending: bool = False,
) -> DataFrame:
    """Per-query top-k WITHOUT a corpus-sized single-task sort.

    A bare ``row_number() over (partition by query_id order by score)``
    funnels every candidate row for a query through ONE task — with
    corpus-proportional candidate sets (brute force: the corpus; LSH:
    ~corpus/2^planes; IVF: ~corpus*nprobe/K) that task sorts TB-scale
    data at 100 TB, and with few queries the shuffle is skewed onto a
    handful of keys by construction. This helper ranks in two bounded
    levels instead:

    1. salt each candidate into ``(query_id, __salt)`` where ``__salt =
       pmod(xxhash64(id_col), buckets)`` — deterministic per row — and
       keep the top ``k`` of each salt partition (partition size ~
       candidates/buckets);
    2. rank the surviving ``<= buckets * k`` rows per query with the
       final window — a tiny, bounded sort.

    The result is BIT-IDENTICAL to the single-window spelling: the
    ordering ``(desc score, asc id)`` is a strict total order (ids are
    unique per query), and any row in the global top-k is by definition
    in the top-k of its own salt bucket, so level 1 never drops a
    winner and level 2 assigns exactly the ranks the single window
    would. Rows beyond rank ``k`` are filtered.

    Returns ``scored``'s columns plus ``rank_col`` (long), rank <= k.
    ``ascending=True`` ranks smallest-score first (same two-level
    argument; used by e.g. hash-order reservoir sampling where the
    "score" is a hash and the k smallest win).
    """
    order = F.asc(score_col) if ascending else F.desc(score_col)
    w1 = Window.partitionBy(query_col, "__salt").orderBy(order, F.asc(id_col))
    w2 = Window.partitionBy(query_col).orderBy(order, F.asc(id_col))
    return (
        scored.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
        )
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_col) <= k)
        .drop("__salt", "__r1")
    )


def derived_planes(
    n_rows: int, *, target_bucket_rows: int = 1024, floor: int = 4, cap: int = 20
) -> int:
    """Hyperplane count sized to the CORPUS, not a constant: with `p`
    planes, expected bucket size is n / 2^p, so p = ceil(log2(n /
    target_bucket_rows)) keeps per-bucket candidate volume bounded
    (~target_bucket_rows) as corpora grow — the round-4 review's ask
    that LSH bucketing not silently go quadratic at 100x. Floored at 4
    (below it buckets are coarser than useful even for tiny corpora)
    and capped at 20 (2^20 buckets; beyond that hash cost rises while
    recall per table collapses — add TABLES, not planes, for recall)."""
    import math

    if n_rows <= target_bucket_rows:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(n_rows / target_bucket_rows))))


def derived_sample_hex(
    n_rows: int, *, target_train_rows: int = 250_000
) -> str | None:
    """Training-sample threshold sized to the CORPUS, not a constant
    (the derived_* convention — derived_planes, derived_rank_buckets,
    derived_bloom_bits): a quantizer only needs ~O(centroids) training
    points (FAISS trains IVF on 1-10% of vectors, ~39-256 per
    centroid), so the deterministic md5-prefix sample should keep
    ~target_train_rows regardless of corpus size. Returns a lowercase
    hex string `h`; the predicate is substring(md5(id), 1, len(h)) < h.

    The PREFIX LENGTH scales with the corpus (r7 advice): a fixed
    2-digit prefix floors the kept fraction at 1/256, so a 1e12-row
    corpus would sample ~4e9 rows against a 250k target. Using
    len = max(2, ceil(log16(n/target)) + 1) digits the sampling grain
    16^-len is at most ~frac/16, so the kept count lands in
    [target, ~1.0625*target] at ANY corpus size. Returns None (train
    on everything) when the corpus is already at or under the target."""
    import math

    if n_rows <= 0 or target_train_rows >= n_rows:
        return None
    frac = target_train_rows / n_rows
    ndig = max(2, math.ceil(math.log(1.0 / frac, 16)) + 1)
    thr = max(1, math.ceil(frac * 16**ndig))
    if thr >= 16**ndig:
        return None
    return format(thr, f"0{ndig}x")


def _planes_or_derived(planes: int | None, df: DataFrame) -> int:
    """Resolve an explicit planes override or derive from the corpus
    row count. The count on a bare parquet scan is footer-driven
    (parquet count pushdown — metadata, not a row pass)."""
    return planes if planes is not None else derived_planes(df.count())


def plane_vals(plane: int, dim: int) -> list[float]:
    """Deterministic +-1.0 hyperplane #`plane` computed ONCE in Python —
    the same md5-derived signs the oracle derives in SQL."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}-{d}".encode()).hexdigest()[0]
        out.append(1.0 if h in "89abcdef" else -1.0)
    return out


def plane_pattern_expr(plane: int, dim: int) -> str:
    """Spark expr: deterministic +-1.0 hyperplane vector #`plane`,
    emitted as a LITERAL array. The old spelling derived each sign from
    md5 inside a transform lambda — HOF lambdas are not constant-folded,
    so every row of every side recomputed dim x planes md5 hashes
    (measured ~3x wall on the semantic-dedup self-joins)."""
    return (
        "array(" + ", ".join("1.0D" if v > 0 else "-1.0D" for v in plane_vals(plane, dim)) + ")"
    )


def sql_plane_pattern(plane: int, dim: int) -> str:
    """DuckDB spelling of the same hyperplane (range is end-exclusive)."""
    return (
        f"list_transform(range(0, {dim}), d -> "
        f"CASE WHEN substring(md5(concat('{plane}', '-', CAST(d AS VARCHAR))), 1, 1) "
        f"IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END)"
    )


def lsh_bucket(vec_col: str, planes: int, dim: int, offset: int = 0) -> "F.Column":
    """Bucket id: concatenated signs of dot(vec, plane_{offset+j}), j < planes.

    `offset` selects an independent set of hyperplanes (the plane index
    seeds the md5 pattern), so multi-table LSH uses offsets 0, planes,
    2*planes, ... for its tables.

    (r12 note: an explicit left-associated element_at sum was tried to
    get the dot into whole-stage codegen; the 2048-node expression tree
    fell back to interpreted evaluation and measured ~2x SLOWER than
    the HOF fold on the bucket-row leg, so the fold stays.)"""
    bits = []
    for j in range(offset, offset + planes):
        dot = (
            f"aggregate(zip_with({vec_col}, {plane_pattern_expr(j, dim)}, "
            f"(x, p) -> CAST(x AS double) * p), CAST(0.0 AS double), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return F.expr("concat(" + ", ".join(bits) + ")")


def sql_lsh_bucket(vec_col: str, planes: int, dim: int, offset: int = 0) -> str:
    bits = []
    for j in range(offset, offset + planes):
        dot = (
            f"list_reduce(list_transform(list_zip({vec_col}, {sql_plane_pattern(j, dim)}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]), (a, b) -> a + b)"
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(bits) + ")"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Norms are materialized once per ROW (a corpus row's norm would
    otherwise be re-reduced for every query it pairs with); the per-pair
    work is one dot product and one divide — identical ops and order to
    cosine_sim, so values are bit-unchanged."""
    from sql_engine_spark.functions.vectors import dot, l2_norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn("cosine", dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
    )
    return two_level_topk(scored, score_col="cosine", k=k).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    planes: int | None = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact re-rank within the query's LSH bucket.

    At scale the bucket join replaces the cross join: corpus is shuffled
    once by bucket, queries broadcast, candidates ~ corpus/2^planes.
    `planes=None` derives the plane count from the corpus row count
    (see derived_planes) so bucket volume stays bounded as the corpus
    grows; registered queries pass an explicit value because their
    DuckDB oracles are static SQL.
    """
    from sql_engine_spark.functions.vectors import dot, l2_norm

    planes = _planes_or_derived(planes, corpus)
    bucket = lsh_bucket(vec_col, planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
        bucket.alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
        bucket.alias("__bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "__bucket")
        .withColumn("cosine", dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
    )
    return two_level_topk(scored, score_col="cosine", k=k).select(
        "query_id", "neighbor_id", F.col("__bucket").alias("bucket"), "cosine", "rank"
    )


def _norm_side(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    # Normalize ONCE per row; every downstream cosine is then a plain
    # dot product (1 array reduction per pair instead of 3).
    from sql_engine_spark.functions.vectors import l2_norm, normalized

    return (
        df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("__v"))
        .withColumn("__n", l2_norm("__v"))
        .withColumn("__nv", normalized("__v", "__n"))
        .select(out_id, "__nv")
    )


def _lit_vec(v: list[float]) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in v])


def _sql_lit_vec(v: list[float]) -> str:
    """Literal double-array as ONE SQL string. Building literal vectors
    through the Column API costs a Py4J round trip per element — with
    K centroids x dim elements that is ~1s of driver time per plan
    (measured); a single parsed expression string is ~free. repr() is
    shortest-round-trip, so the parsed doubles are bit-identical."""
    return "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in v) + ")"


def _sql_dot_lit(vec_col: str, v: list[float]) -> str:
    """SQL dot(vec_col, literal) — same op order as functions.vectors.dot."""
    return (
        f"aggregate(zip_with({vec_col}, {_sql_lit_vec(v)}, "
        f"(x, p) -> CAST(x AS DOUBLE) * CAST(p AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _py_unit(v) -> list[float]:
    """Driver-side L2 normalization: the same IEEE double ops in the same
    left-to-right fold order as the engine (0.0 + x0*x0 + x1*x1 + ...;
    correctly-rounded sqrt; per-element division), so the result is
    bit-identical to normalizing in Spark or DuckDB."""
    import math

    vals = [float(x) for x in v]
    acc = 0.0
    for x in vals:
        acc += x * x
    n = math.sqrt(acc)
    return [x / n for x in vals]


def _cell_scores(vec_col: str, cents: list[tuple[int, list[float]]]) -> "F.Column":
    """array<struct<negcos, cent_id>> scoring a row's vector against every
    LITERAL centroid — a pure per-row expression, no join, no shuffle.
    Cosines are negated so array_min / array_sort pick the highest cosine
    first with ties to the lowest cent_id (the same order as
    max_by(struct(cos, -cent_id)) and the oracle's `ORDER BY dot DESC,
    cent_id`). Assembled as ONE SQL string (see _sql_lit_vec) so plan
    construction is a single parse, not thousands of Py4J calls."""
    return F.expr(_cell_scores_sql(vec_col, cents))


def _cell_scores_sql(vec_col: str, cents: list[tuple[int, list[float]]]) -> str:
    parts = [
        f"struct(-({_sql_dot_lit(vec_col, v)}) AS negcos, "
        f"CAST({int(cid)} AS BIGINT) AS cent_id)"
        for cid, v in cents
    ]
    return "array(" + ", ".join(parts) + ")"


def _assign_cell(vec_col: str, cents: list[tuple[int, list[float]]]) -> "F.Column":
    """Nearest-centroid id as a map-side expression (argmax cosine)."""
    return F.array_min(_cell_scores(vec_col, cents)).getField("cent_id")


def _probe_cells(df: DataFrame, out_id: str, cents, nprobe: int) -> DataFrame:
    """Each row's `nprobe` nearest cells — per-row sort of K scored
    structs, exploded. (query_id, __qv, cent_id)."""
    sc = F.array_sort(_cell_scores("__nv", cents))
    return df.select(
        out_id,
        F.col("__nv").alias("__qv"),
        F.explode(F.slice(sc, 1, nprobe)).alias("__s"),
    ).select(out_id, "__qv", F.col("__s.cent_id").alias("cent_id"))


def _ivf_search(
    probes: DataFrame, corp: DataFrame, k: int
) -> DataFrame:
    """Broadcast the (tiny) probe set against the cell-assigned corpus and
    exact-rank within each query — the single corpus-sized shuffle of the
    whole IVF search (the salted level-1 of `two_level_topk`; no task
    ever sorts more than ~candidates/buckets rows).

    `corp` carries the RAW vector `__cv` plus its materialized norm
    `__cn`; cosine is dot(q_norm, raw)/norm. Keeping the corpus raw (and
    dividing by a plain column) matters because higher-order functions
    run interpreted with no subexpression elimination: a normalized
    corpus column inlines its whole norm reduction into the transform
    lambda and re-evaluates it PER ELEMENT per use — measured 4x wall on
    this query at sf0.1."""
    from sql_engine_spark.functions.vectors import dot

    scored = (
        F.broadcast(probes)
        .join(corp, "cent_id")
        .withColumn("cosine", dot("__qv", "__cv") / F.col("__cn"))
    )
    return two_level_topk(scored, score_col="cosine", k=k).select(
        "query_id", "neighbor_id", F.col("cent_id").alias("cell"), "cosine", "rank"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    num_centroids: int,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: every corpus vector is assigned to its nearest
    centroid (one cell each); each query probes its `nprobe` nearest
    cells and exact cosine re-ranks only those cells' members — the
    candidate set is ~nprobe/num_centroids of the corpus. Centroids here
    are the lowest-id corpus vectors (deterministic, oracle-reproducible);
    `ivf_kmeans_topk` swaps in trained centroids with the same search.

    The K centroids are COLLECTED to the driver (K x dim doubles — the
    same thing MLlib's KMeansModel does) and embedded as literals, so
    cell assignment and query probing are pure map-side expressions: the
    only corpus-sized shuffle in the whole query is the salted level-1
    of the final `two_level_topk` (bounded per-task sorts), and nothing
    is persisted (the corpus is scanned once for the seed pick and once
    for the search — no cache to leak).

    The corpus is never normalized engine-side: argmax_j dot(x, c_j)
    over unit centroids is invariant to x's (positive) scale, so cell
    assignment runs on the RAW vectors, and the final cosine divides
    one raw dot product by the row's materialized norm. This avoids
    the interpreted-HOF trap where a normalized array column re-runs
    its norm reduction per element per use (see _ivf_search).

    Returns (query_id, neighbor_id, cell, cosine, rank).
    """
    from sql_engine_spark.functions.vectors import l2_norm

    raw = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    seed_rows = raw.orderBy("neighbor_id").limit(num_centroids).collect()
    # Normalize the K seeds on the driver (Python doubles are the same
    # IEEE ops in the same left-to-right order as the engine/oracle, so
    # this is bit-identical to the oracle's e/n) — the seed scan then
    # carries no vector math at all.
    cents = [(r["neighbor_id"], _py_unit(r["__v"])) for r in seed_rows]
    corp = raw.select(
        "neighbor_id",
        F.col("__v").alias("__cv"),
        l2_norm("__v").alias("__cn"),
        _assign_cell("__v", cents).alias("cent_id"),
    )
    probes = _probe_cells(
        _norm_side(queries, id_col, vec_col, "query_id"), "query_id", cents, nprobe
    )
    return _ivf_search(probes, corp, k)


def ivf_topk_sweep(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    num_centroids: int,
    nprobes: tuple[int, ...],
    leg_col: str = "nprobe",
) -> DataFrame:
    """`ivf_topk` at several probe budgets in ONE pipeline.

    Probed-cell sets nest by construction (each query's cells are
    ranked once; nprobe takes a prefix), so the candidate relation at
    nprobe `p` is exactly the max-nprobe scored relation filtered to
    probe rank <= p. This scores every (query, candidate) cosine ONCE
    at max(nprobes) — one seed collect, one corpus scan+assignment,
    one candidate shuffle — then EXPLODES each scored row into the
    legs whose budget covers its probe rank and ranks all legs with a
    single `two_level_topk` partitioned by (leg, query). Each (leg,
    query) partition holds the identical candidate multiset the solo
    `ivf_topk` scores, and the (desc score, asc id) order is a strict
    total order, so per-leg rows are BIT-IDENTICAL to the solo calls
    (pinned by the sweep queries' oracles, which still compose the
    per-leg oracle SQL). One pipeline instead of len(nprobes) — no
    persist, no concurrent-broadcast cache race, ~1/len(nprobes) the
    jobs.

    Returns one DataFrame: (leg_col, query_id, neighbor_id, cell,
    cosine, rank), rank <= k within each (leg, query).
    """
    from sql_engine_spark.functions.vectors import dot, l2_norm

    mx = max(nprobes)
    raw = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    seed_rows = raw.orderBy("neighbor_id").limit(num_centroids).collect()
    cents = [(r["neighbor_id"], _py_unit(r["__v"])) for r in seed_rows]
    corp = raw.select(
        "neighbor_id",
        F.col("__v").alias("__cv"),
        l2_norm("__v").alias("__cn"),
        _assign_cell("__v", cents).alias("cent_id"),
    )
    sc = F.array_sort(_cell_scores("__nv", cents))
    probes = (
        _norm_side(queries, id_col, vec_col, "query_id")
        .select(
            "query_id",
            F.col("__nv").alias("__qv"),
            F.posexplode(F.slice(sc, 1, mx)).alias("__p0", "__s"),
        )
        .select(
            "query_id",
            "__qv",
            (F.col("__p0") + F.lit(1)).alias("__pr"),
            F.col("__s.cent_id").alias("cent_id"),
        )
    )
    legs = F.array(*[F.lit(int(p)) for p in sorted(nprobes)])
    scored = (
        F.broadcast(probes)
        .join(corp, "cent_id")
        .withColumn("cosine", dot("__qv", "__cv") / F.col("__cn"))
        .select(
            "query_id",
            "neighbor_id",
            "cent_id",
            "cosine",
            F.explode(F.filter(legs, lambda p: F.col("__pr") <= p)).alias(leg_col),
        )
        .withColumn("__lq", F.struct(leg_col, "query_id"))
    )
    return two_level_topk(scored, score_col="cosine", k=k, query_col="__lq").select(
        leg_col,
        "query_id",
        "neighbor_id",
        F.col("cent_id").alias("cell"),
        "cosine",
        "rank",
    )


def ordered_mean_vectors(
    assigned: DataFrame,
    *,
    group_col: str,
    id_col: str,
    vec_col: str,
    norm_col: str | None = None,
    out_vec: str = "__ce",
) -> DataFrame:
    """Per-group element-wise mean of vectors, then L2-normalized —
    computed with an ORDERED reduction (members sorted by id, summed
    left-to-right from 0.0) so the result is bit-identical under any
    partitioning. Returns (group_col, out_vec).

    When `norm_col` names a materialized per-row L2 norm, `vec_col` is
    taken RAW and each exploded element is divided by that norm — the
    mean is then over unit vectors without ever constructing a
    normalized array column (whose inlined norm reduction re-runs per
    element in the interpreted HOF evaluator)."""
    from sql_engine_spark.functions.vectors import l2_norm, normalized

    extra = [F.col(norm_col)] if norm_col else []
    gen = assigned.select(
        group_col, F.col(id_col), *extra, F.posexplode(vec_col).alias("d", "x")
    )
    x = (F.col("x").cast("double") / F.col(norm_col)) if norm_col else F.col("x")
    dims = gen.select(group_col, id_col, "d", x.alias("x"))
    mu = (
        dims.groupBy(group_col, "d")
        .agg(
            F.expr(
                f"aggregate(transform(array_sort(collect_list("
                f"struct({id_col} AS i, x AS x))), s -> s.x), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("s"),
            F.count("*").alias("n"),
        )
        .withColumn("mu", F.col("s") / F.col("n"))
    )
    vecs = mu.groupBy(group_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d AS d, mu AS mu)))," " s -> s.mu)"
        ).alias("__m")
    )
    return (
        vecs.withColumn("__n", l2_norm("__m"))
        .withColumn(out_vec, normalized("__m", "__n"))
        .select(group_col, out_vec)
    )


def kmeans_centroids(
    corp_norm: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    num_centroids: int,
    iterations: int,
) -> DataFrame:
    """Spherical k-means over pre-normalized vectors, bit-reproducibly.

    Seeding is deterministic (the `num_centroids` lowest-id vectors);
    each Lloyd iteration is assign (argmax dot, ties to lowest centroid)
    -> per-dimension mean -> re-normalize. The per-dimension mean uses an
    ORDERED reduction (collect members sorted by id, sum left-to-right)
    so the result is identical under any partitioning — that's what lets
    an external oracle reproduce the centroids exactly. The collect is
    per (centroid, dim) and holds one double per member: fine for the
    bounded corpora you train centroids on (sample, then train); swap in
    plain avg() when reproducibility-under-repartition isn't required.

    Returns (cent_id, __ce) with unit-norm centroid vectors.
    """
    from sql_engine_spark.functions.vectors import dot

    cents = (
        corp_norm.orderBy(id_col)
        .limit(num_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__ce"))
    )
    for _ in range(iterations):
        assigned = (
            corp_norm.crossJoin(F.broadcast(cents))
            .withColumn("__ccos", dot(vec_col, "__ce"))
            .groupBy(id_col)
            .agg(
                F.max_by(
                    "cent_id", F.struct(F.col("__ccos"), -F.col("cent_id"))
                ).alias("cent_id"),
                F.first(vec_col).alias("__v"),
            )
        )
        cents = ordered_mean_vectors(
            assigned, group_col="cent_id", id_col=id_col, vec_col="__v"
        )
    return cents


def nearest_centroid_classify(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Nearest-class-centroid classification (Rocchio): each class's
    centroid is the normalized mean of its members' normalized vectors;
    every vector is then assigned the label of the most-cosine-similar
    centroid (ties to the lowest label).

    Returns (id, label, predicted) — self-classification over the
    training set, the standard cheap embedding-quality probe (high
    agreement = embeddings cluster by label). Centroids are computed
    with the ordered reduction, so the whole op is bit-reproducible.
    Scale: one pass to build K centroids (K = #labels, broadcast), one
    map-side argmax pass to classify — no corpus-sized shuffle beyond
    the centroid aggregate.

    Vectors stay RAW end-to-end: the centroid mean divides by a
    materialized per-row norm at explode time, and classification's
    argmax dot against unit centroids is invariant to the row's scale —
    no normalized array column, no interpreted-HOF norm recompute.
    """
    from sql_engine_spark.functions.vectors import dot, l2_norm

    base = df.select(
        F.col(id_col),
        F.col(label_col),
        F.col(vec_col).alias("__v"),
        l2_norm(vec_col).alias("__n"),
    )
    cents = F.broadcast(
        ordered_mean_vectors(
            base.withColumnRenamed(label_col, "__lbl"),
            group_col="__lbl",
            id_col=id_col,
            vec_col="__v",
            norm_col="__n",
        )
    )
    return (
        base.crossJoin(cents)
        .withColumn("__ccos", dot("__v", "__ce"))
        .groupBy(id_col, label_col)
        .agg(
            F.max_by("__lbl", F.struct(F.col("__ccos"), -F.col("__lbl"))).alias(
                "predicted"
            )
        )
        .select(id_col, label_col, "predicted")
    )


def train_kmeans_literal(
    corpus_raw: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    num_centroids: int,
    iterations: int,
    sample_pred: "F.Column | None" = None,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means trained ON A SAMPLE with driver-side centroid
    iteration — the 'sample, then train' posture made executable.

    `corpus_raw` carries RAW (un-normalized) vectors; each row's L2 norm
    is materialized once as a plain column and the per-member
    normalization happens INSIDE the ordered vector fold (one division
    per element per member) — never as a normalized array column, whose
    inlined norm reduction would re-run per element per use in the
    interpreted HOF evaluator. Assignment is likewise a raw-vector
    argmax against the unit literal centroids (scale-invariant).

    `sample_pred` (e.g. an md5-prefix predicate, deterministic and
    oracle-reproducible) bounds the training set; seeds are its
    `num_centroids` lowest-id vectors. Each Lloyd round is ONE
    distributed job: assignment is a per-row argmax against the current
    LITERAL centroids (no join, no shuffle), followed by a single hash
    aggregate whose per-centroid ordered vector sum (members sorted by
    id, zip_with-added left-to-right from a zero vector) keeps the
    result bit-identical under any partitioning; the K updated
    centroids (K x dim doubles) come back to the driver exactly as
    MLlib's KMeans does it. Returns [(cent_id, unit_vec)] sorted by id.
    """
    from sql_engine_spark.functions.vectors import l2_norm, normalized

    train = corpus_raw.where(sample_pred) if sample_pred is not None else corpus_raw
    train = train.select(
        F.col(id_col), F.col(vec_col).alias("__v"), l2_norm(vec_col).alias("__vn")
    )
    if iterations > 0:
        train = train.persist()
    seed_rows = train.orderBy(id_col).limit(num_centroids).collect()
    cents = [
        (r[id_col], [float(x) / r["__vn"] for x in r["__v"]]) for r in seed_rows
    ]
    if not cents:
        raise ValueError("training sample is empty")
    dim = len(cents[0][1])
    zero = F.expr(f"transform(sequence(1, {dim}), x -> CAST(0.0 AS DOUBLE))")
    for _ in range(iterations):
        assigned = train.select(
            F.col(id_col),
            F.col("__v"),
            F.col("__vn"),
            _assign_cell("__v", cents).alias("cent_id"),
        )
        summed = assigned.groupBy("cent_id").agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(id_col).alias("i"),
                            F.col("__v").alias("v"),
                            F.col("__vn").alias("n"),
                        )
                    )
                ),
                zero,
                # Element-wise sum of the member's UNIT vector: divide by
                # the member's materialized norm inside the fold.
                lambda acc, s: F.zip_with(
                    acc, s["v"], lambda a, b: a + b.cast("double") / s["n"]
                ),
            ).alias("__s"),
            F.count("*").alias("__cn"),
        )
        mu = summed.select(
            "cent_id", F.transform("__s", lambda x: x / F.col("__cn")).alias("__m")
        )
        normed = (
            mu.withColumn("__nn", l2_norm("__m"))
            .select("cent_id", normalized("__m", "__nn").alias("__ce"))
        )
        cents = sorted(
            (r["cent_id"], list(r["__ce"])) for r in normed.collect()
        )
    if iterations > 0:
        train.unpersist()
    return cents


def ivf_kmeans_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    num_centroids: int,
    nprobe: int = 2,
    iterations: int = 1,
    train_sample_hex: str | None = "8",
    target_train_rows: int | None = None,
) -> DataFrame:
    """IVF top-k with TRAINED (spherical k-means) centroids.

    Same search plan as `ivf_topk` — literal centroids, map-side cell
    assignment and probing, one salted two-level top-k shuffle — but the coarse
    quantizer is learned: `iterations` Lloyd rounds (driver-iterated,
    see `train_kmeans_literal`) refine seeds drawn from a DETERMINISTIC
    md5-prefix sample of the corpus (a hex threshold `h` keeps ids
    whose md5 first len(h) hex digits < h; None trains on everything).
    Training a quantizer on a sample is the standard at-scale posture
    (FAISS trains IVF on ~1-10% of vectors): the full corpus is only
    ever touched by map-side assignment + the final rank shuffle, and
    the training jobs run over the bounded sample. Pass
    `target_train_rows` to DERIVE the threshold from the corpus count
    (derived_sample_hex — the derived_* sizing convention), so the
    sampled-in training set stays ~constant as corpora grow instead of
    a fixed fraction that is still 50 TB of a 100 TB corpus.
    """
    from sql_engine_spark.functions.vectors import l2_norm

    raw = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    if target_train_rows is not None:
        # Corpus count: a real count job on the (possibly filtered)
        # corpus relation — footer-driven only when the caller passes a
        # bare parquet scan. Callers that already know the count should
        # pre-render the threshold with derived_sample_hex and pass
        # train_sample_hex directly to skip this pass.
        train_sample_hex = derived_sample_hex(
            raw.count(), target_train_rows=target_train_rows
        )
    sample = (
        F.substring(
            F.md5(F.col("neighbor_id").cast("string")), 1, len(train_sample_hex)
        )
        < train_sample_hex
        if train_sample_hex is not None
        else None
    )
    cents = train_kmeans_literal(
        raw,
        id_col="neighbor_id",
        vec_col="__v",
        num_centroids=num_centroids,
        iterations=iterations,
        sample_pred=sample,
    )
    # Full-corpus pass: raw-vector assignment (scale-invariant argmax),
    # norm materialized once for the final cosine — see ivf_topk.
    corp = raw.select(
        "neighbor_id",
        F.col("__v").alias("__cv"),
        l2_norm("__v").alias("__cn"),
        _assign_cell("__v", cents).alias("cent_id"),
    )
    probes = _probe_cells(
        _norm_side(queries, id_col, vec_col, "query_id"), "query_id", cents, nprobe
    )
    return _ivf_search(probes, corp, k)


def lsh_range_search(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float,
    planes: int = 3,
    tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Range search: ALL corpus neighbors with cosine >= `threshold` per
    query (the radius-query API, vs top-k's fixed count) — the primitive
    behind 'find every near-duplicate of this document' lookups.

    Candidates come from multi-table hyperplane LSH (a corpus row
    qualifies if it shares a bucket with the query in ANY of `tables`
    tables — recall 1-(1-p)^tables), then exact cosine verifies, so
    precision is exact and recall is the LSH dial. No window, no rank,
    no per-query sort anywhere: one bucket equi-join bounded by
    ~tables/2^planes of the corpus, one exact-verify join, a filter.
    Returns (query_id, neighbor_id, cosine).
    """
    from sql_engine_spark.functions.vectors import dot, l2_norm

    def bucket_rows(df: DataFrame, out_id: str) -> DataFrame:
        cols = [
            lsh_bucket(vec_col, planes, dim, offset=t * planes).alias(f"__b{t}")
            for t in range(tables)
        ]
        wide = df.select(F.col(id_col).alias(out_id), *cols)
        stack = (
            f"stack({tables}, "
            + ", ".join(f"{t}, __b{t}" for t in range(tables))
            + ") as (__t, __bucket)"
        )
        return wide.selectExpr(out_id, stack)

    cands = (
        bucket_rows(queries, "query_id")
        .join(bucket_rows(corpus, "neighbor_id"), ["__t", "__bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    return (
        cands.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
        .where(F.col("cosine") >= threshold)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, cosine >= threshold) within blocks."""
    from sql_engine_spark.functions.vectors import dot, l2_norm

    sel = df.select(
        F.col(id_col).alias("__id"),
        F.col(block_col).alias("__block"),
        F.col(vec_col).alias("__v"),
        l2_norm(vec_col).alias("__n"),
    )
    a, b = sel.alias("a"), sel.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__block") == F.col("b.__block"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (dot("a.__v", "b.__v") / (F.col("a.__n") * F.col("b.__n"))).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dup_pairs_multitable(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    planes: int,
    tables: int,
    dim: int,
    threshold: float,
) -> DataFrame:
    """OR-amplified semantic near-dup pairs: `tables` independent
    hyperplane-LSH tables of `planes` planes each; two vectors are
    CANDIDATES if they share a bucket in ANY table, then exact cosine
    verifies. Pair recall for vectors at angle θ is 1-(1-p)^tables with
    p=(1-θ/π)^planes — e.g. 8 tables x 4 planes gives ~0.99 at cosine
    0.9 and ~0.6 even at cosine 0.25, vs ~0.04 for one 6-plane table.
    Precision is exact (stage-2 verification). Scale shape: the bucket
    rows replicate `tables`x (stack, per-row map work), candidates come
    from an equi-join on (table, bucket), and the quadratic cost stays
    confined to bucket blocks (~corpus/2^planes each) — no all-pairs
    stage. Returns (id_a, id_b, cosine)."""
    from sql_engine_spark.operators.dedup import _persist

    cols = [
        lsh_bucket(vec_col, planes, dim, offset=t * planes).alias(f"__b{t}")
        for t in range(tables)
    ]
    wide = df.select(F.col(id_col).alias("__id"), *cols)
    stack = (
        f"stack({tables}, "
        + ", ".join(f"{t}, __b{t}" for t in range(tables))
        + ") as (__t, __bk)"
    )
    # Persisted (r12, guide §1.2 don't compute twice): the bucket
    # self-join's two sides are aliases of this relation, and the
    # tables x planes interpreted-HOF plane dots are its dominant cost —
    # unpersisted, the whole bucket map ran once per join side.
    rows = _persist(wide.selectExpr("__id", stack))
    a, b = rows.alias("a"), rows.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.__bk") == F.col("b.__bk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    from sql_engine_spark.functions.vectors import dot, l2_norm

    # Persisted: both verify sides read (vector, norm); unpersisted the
    # scan + per-row norm reduction ran once per side.
    vecs = _persist(
        df.select(
            F.col(id_col).alias("__vid"),
            F.col(vec_col).alias("__v"),
            l2_norm(vec_col).alias("__n"),
        )
    )
    return (
        cands.join(vecs.alias("va"), F.col("id_a") == F.col("va.__vid"))
        .join(vecs.alias("vb"), F.col("id_b") == F.col("vb.__vid"))
        .select(
            "id_a",
            "id_b",
            (dot("va.__v", "vb.__v") / (F.col("va.__n") * F.col("vb.__n"))).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def lsh_multitable_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    planes: int = 3,
    tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Multi-table LSH top-k (OR-amplification): `tables` independent
    hash tables of `planes` hyperplanes each; a corpus row is a candidate
    if it shares a bucket with the query in ANY table, then exact cosine
    re-ranks the candidate union. Recall ~ 1-(1-p)^tables vs p for one
    table, at the cost of `tables`x bucket rows — the standard LSH
    recall/space dial. One shuffle of the (replicated) bucket rows; the
    candidate set stays ~tables/2^planes of the corpus.
    """
    def bucket_rows(df: DataFrame, out_id: str) -> DataFrame:
        cols = [
            lsh_bucket(vec_col, planes, dim, offset=t * planes).alias(f"__b{t}")
            for t in range(tables)
        ]
        wide = df.select(F.col(id_col).alias(out_id), *cols)
        stack = (
            f"stack({tables}, "
            + ", ".join(f"{t}, __b{t}" for t in range(tables))
            + ") as (__t, __bucket)"
        )
        return wide.selectExpr(out_id, stack)

    cands = (
        bucket_rows(queries, "query_id")
        .join(bucket_rows(corpus, "neighbor_id"), ["__t", "__bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    from sql_engine_spark.functions.vectors import dot, l2_norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    scored = (
        cands.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
    )
    return two_level_topk(scored, score_col="cosine", k=k).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def lsh_multitable_topk_sweep(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    planes: int,
    tables_list: tuple[int, ...],
    dim: int,
    leg_col: str = "tables",
) -> DataFrame:
    """`lsh_multitable_topk` at several table counts in ONE pipeline.

    Table `t` always hashes with plane offset `t*planes`, so the
    candidate set at `T` tables is the union of matches in tables
    0..T-1 — nested across the sweep. This hashes both sides ONCE at
    max(tables_list), reduces candidate pairs to their FIRST matching
    table (min __t — the groupBy is the solo path's distinct), scores
    every candidate's cosine once, EXPLODES each pair into the legs
    whose table count covers its first match (__tmin < T) and ranks
    all legs with a single `two_level_topk` partitioned by (leg,
    query). Each (leg, query) partition holds the identical candidate
    multiset the solo call scores, and the topk order is a strict
    total order, so per-leg rows are BIT-IDENTICAL to the solo calls.
    One pipeline instead of len(tables_list) — no persist, no
    concurrent-broadcast cache race, ~1/len the jobs.

    Returns one DataFrame: (leg_col, query_id, neighbor_id, cosine,
    rank), rank <= k within each (leg, query).
    """
    from sql_engine_spark.functions.vectors import dot, l2_norm

    mx = max(tables_list)

    def bucket_rows(df: DataFrame, out_id: str) -> DataFrame:
        cols = [
            lsh_bucket(vec_col, planes, dim, offset=t * planes).alias(f"__b{t}")
            for t in range(mx)
        ]
        wide = df.select(F.col(id_col).alias(out_id), *cols)
        stack = (
            f"stack({mx}, "
            + ", ".join(f"{t}, __b{t}" for t in range(mx))
            + ") as (__t, __bucket)"
        )
        return wide.selectExpr(out_id, stack)

    cands = (
        bucket_rows(queries, "query_id")
        .join(bucket_rows(corpus, "neighbor_id"), ["__t", "__bucket"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("__t").alias("__tmin"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    legs = F.array(*[F.lit(int(t)) for t in sorted(tables_list)])
    scored = (
        cands.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.explode(F.filter(legs, lambda t: F.col("__tmin") < t)).alias(leg_col),
        )
        .withColumn("__lq", F.struct(leg_col, "query_id"))
    )
    return two_level_topk(scored, score_col="cosine", k=k, query_col="__lq").select(
        leg_col, "query_id", "neighbor_id", "cosine", "rank"
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    subspaces: int,
    sub_centroids: int,
    dim: int,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization (PQ) approximate top-k with asymmetric distance
    computation (ADC) — the memory-bounded ANN path (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011).

    With `rerank` > 0, the ADC scores only build a per-query shortlist of
    that size and exact cosine re-orders it (returns `cosine` instead of
    `approx_dot`) — the standard two-stage recall fix.

    The normalized vector is split into `subspaces` blocks of dim/subspaces
    dims; each block is quantized to its nearest (max-dot) sub-centroid, so
    a corpus row is represented by `subspaces` small codes (1 byte each at
    K<=256) instead of `dim` floats — at 100 TB that is the difference
    between an index that fits in cluster memory and one that doesn't.
    Search (ADC): each query precomputes its dot product against every
    sub-centroid (a subspaces x K lookup table, tiny); the approximate
    score of a corpus row is the sum of table lookups selected by its
    codes — zero float math per candidate beyond `subspaces` adds.

    Scale shape: sub-centroids are seeded from the lowest-id corpus
    vectors (deterministic, oracle-reproducible — the same stand-in-for-
    trained-codebooks posture as ivf_topk); query tables are computed on
    the (tiny, broadcast) query side; the only corpus-sized shuffle in
    the whole query is the salted level-1 of the final `two_level_topk`.

    Encoding is the one hot spot the built-in functions can't express
    efficiently: subspaces x sub_centroids tiny dot products per row,
    which as per-centroid HOF expressions run interpreted (measured
    8.7s at sf0.1) and as unrolled scalar chains blow the codegen
    method-size limit. It is therefore an Arrow-batched Pandas UDF —
    one numpy einsum per batch, argmax per (row, subspace), first-max
    ties = lowest code, matching the oracle's `ORDER BY dot DESC, j`.
    (numpy sums in SIMD order rather than strictly left-to-right, so a
    near-tie within reordering error ~1e-16 could in principle assign a
    different code than the sequential oracle; sub-centroid dots on
    real data are separated by many orders of magnitude more.)

    Returns (query_id, neighbor_id, approx_dot, rank).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from sql_engine_spark.functions.vectors import dot

    dsub = dim // subspaces
    raw = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    q_norm = _norm_side(queries, id_col, vec_col, "query_id")

    # Codebook: sub-slices of the `sub_centroids` lowest-id corpus vectors,
    # normalized on the driver (bit-identical to engine normalization, see
    # _py_unit; K x dim doubles collected — same footprint as a trained
    # KMeansModel).
    seed_rows = raw.orderBy("neighbor_id").limit(sub_centroids).collect()
    units = [_py_unit(r["__v"]) for r in seed_rows]
    cents: list[list[tuple[int, list[float]]]] = [
        [(j, u[m * dsub : (m + 1) * dsub]) for j, u in enumerate(units)]
        for m in range(subspaces)
    ]
    # (subspaces, K, dsub) codebook tensor shipped in the UDF closure.
    cb = np.array([[v for _, v in cents[m]] for m in range(subspaces)])

    def _encode(batch):
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in batch], dtype=np.float64
        ).reshape(-1, subspaces, dsub)
        scores = np.einsum("nmd,mkd->nmk", x, cb)
        codes = scores.argmax(axis=2).astype(np.int32)
        return pd.Series(list(codes))

    # Annotations set as objects (module uses postponed annotations, and
    # pd is function-local, so inline hints would not resolve).
    _encode.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    encode = pandas_udf(_encode, "array<integer>")

    coded = raw.select("neighbor_id", encode("__v").alias("__codes"))
    # Query lookup table as ONE parsed SQL expression (see _sql_lit_vec):
    # subspaces x K dots of the normalized query's sub-slices against the
    # literal codebook.
    qt_sql = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                _sql_dot_lit(f"slice(__nv, {m * dsub + 1}, {dsub})", v)
                for _, v in cents[m]
            )
            + ")"
            for m in range(subspaces)
        )
        + ")"
    )
    qt = q_norm.select("query_id", F.expr(qt_sql).alias("__T"))
    # ADC: left-to-right sum (from 0.0) of the code-selected table entries —
    # the same fold order as the oracle's list_reduce(list_prepend(0.0, ...)).
    # (An unrolled element_at spelling was measured SLOWER than this single
    # fold — one HOF invocation per pair beats 8 nested element_at trees.)
    approx = F.aggregate(
        F.zip_with("__codes", "__T", lambda c, t: F.element_at(t, c + 1)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    scored = two_level_topk(
        F.broadcast(qt).crossJoin(coded).withColumn("approx_dot", approx),
        score_col="approx_dot",
        k=max(k, rerank),
    )
    if rerank <= 0:
        return scored.where(F.col("rank") <= k).select(
            "query_id", "neighbor_id", "approx_dot", "rank"
        )
    # Exact re-rank of the ADC shortlist (the FAISS posture: PQ codes
    # generate candidates, true distances order them). The shortlist is
    # tiny (queries x rerank), so the exact pass is one broadcast join
    # against the raw corpus + a small window — recall becomes that of
    # exact search over the shortlist instead of raw ADC ordering.
    from sql_engine_spark.functions.vectors import dot, l2_norm

    short = scored.where(F.col("rank") <= rerank).select("query_id", "neighbor_id")
    corp_vec = raw.select(
        "neighbor_id", F.col("__v").alias("__cv"), l2_norm("__v").alias("__cn")
    )
    qv = q_norm.select("query_id", F.col("__nv").alias("__qv"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(short)
        .join(corp_vec, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", dot("__qv", "__cv") / F.col("__cn"))
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    num_centroids: int,
    nprobe: int,
    subspaces: int,
    sub_centroids: int,
    dim: int,
    rerank: int = 50,
) -> DataFrame:
    """IVF-PQ approximate top-k — the production composition (FAISS's
    IVFPQ index): an IVF coarse quantizer restricts each query to its
    `nprobe` nearest cells, candidates in those cells are scored by PQ
    asymmetric distance (8 table lookups each, no vector math), and
    exact cosine re-ranks the per-query shortlist. Fixes pq_topk's one
    scale limit — ADC over the ENTIRE corpus per query — by cutting the
    candidate set to ~nprobe/num_centroids of the corpus first.

    Same engineering discipline as the component operators: raw vectors
    corpus-side (scale-invariant argmax for both cell and code
    assignment), literal centroids/codebooks via parsed SQL strings,
    Arrow-batched numpy encoding, norms materialized once. The only
    corpus-sized shuffles are the salted level-1 of the ADC
    `two_level_topk` and nothing else.

    Returns (query_id, neighbor_id, cosine, rank).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from sql_engine_spark.functions.vectors import dot, l2_norm

    dsub = dim // subspaces
    raw = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    n_seeds = max(num_centroids, sub_centroids)
    seed_rows = raw.orderBy("neighbor_id").limit(n_seeds).collect()
    units = [_py_unit(r["__v"]) for r in seed_rows]
    # IVF cells from the first `num_centroids` unit seeds; PQ codebook
    # sub-slices from the first `sub_centroids` (same deterministic
    # lowest-id family as ivf_topk / pq_topk).
    cents = [
        (seed_rows[i]["neighbor_id"], units[i]) for i in range(num_centroids)
    ]
    cb_lists: list[list[tuple[int, list[float]]]] = [
        [(j, units[j][m * dsub : (m + 1) * dsub]) for j in range(sub_centroids)]
        for m in range(subspaces)
    ]
    cb = np.array([[v for _, v in cb_lists[m]] for m in range(subspaces)])

    def _encode(batch):
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in batch], dtype=np.float64
        ).reshape(-1, subspaces, dsub)
        scores = np.einsum("nmd,mkd->nmk", x, cb)
        return pd.Series(list(scores.argmax(axis=2).astype(np.int32)))

    _encode.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    encode = pandas_udf(_encode, "array<integer>")

    coded = raw.select(
        "neighbor_id",
        _assign_cell("__v", cents).alias("cent_id"),
        encode("__v").alias("__codes"),
    )

    q_norm = _norm_side(queries, id_col, vec_col, "query_id")
    qt_sql = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                _sql_dot_lit(f"slice(__nv, {m * dsub + 1}, {dsub})", v)
                for _, v in cb_lists[m]
            )
            + ")"
            for m in range(subspaces)
        )
        + ")"
    )
    qp = q_norm.select("query_id", "__nv", F.expr(qt_sql).alias("__T"))
    probes = qp.select(
        "query_id",
        "__T",
        F.explode(
            F.slice(F.array_sort(_cell_scores("__nv", cents)), 1, nprobe)
        ).alias("__s"),
    ).select("query_id", "__T", F.col("__s.cent_id").alias("cent_id"))

    approx = F.aggregate(
        F.zip_with("__codes", "__T", lambda c, t: F.element_at(t, c + 1)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    short = two_level_topk(
        F.broadcast(probes).join(coded, "cent_id").withColumn("approx_dot", approx),
        score_col="approx_dot",
        k=rerank,
        rank_col="__ra",
    ).select("query_id", "neighbor_id")
    corp_vec = raw.select(
        "neighbor_id", F.col("__v").alias("__cv"), l2_norm("__v").alias("__cn")
    )
    qv = q_norm.select("query_id", F.col("__nv").alias("__qv"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(short)
        .join(corp_vec, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", dot("__qv", "__cv") / F.col("__cn"))
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_graph(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    planes: int | None = 4,
    tables: int = 4,
    dim: int = 64,
    k: int = 5,
) -> DataFrame:
    """Batch kNN-graph construction: for EVERY corpus vector, its top-k
    approximate nearest neighbors by cosine — the primitive behind
    graph-based semantic dedup (SemDeDup clusters), kNN-LM datastores,
    and hard-negative mining. Differs from the ann_*_topk family in
    that the query set IS the corpus.

    Candidates come from OR-amplified multi-table hyperplane LSH (same
    machinery as semantic_dup_pairs_multitable): pairs sharing any of
    `tables` bucket keys, generated once undirected then mirrored.
    Ranking uses a plain per-source window — NOT the salted two-level
    top-k — and that is deliberate: the partition key (src vector id)
    is corpus-cardinality, so partitions are per-vector candidate
    lists bounded by bucket width (~corpus/2^planes x tables), spread
    across every task. The two-level spelling exists for the OPPOSITE
    regime (a handful of literal queries, candidate sets skewed onto
    few keys); here it would only add a shuffle.

    Returns (src, dst, cosine, rank), rank <= k, ties broken by dst
    asc. Vectors whose buckets contain no other vector yield no rows.
    """
    from sql_engine_spark.functions.vectors import dot, l2_norm

    from sql_engine_spark.operators.dedup import _persist

    # planes=None -> size to the corpus (derived_planes): per-table
    # bucket volume stays ~target_bucket_rows as the corpus grows
    # instead of the fixed-16-buckets default the round-4 review
    # flagged. Registered queries pin planes for their static oracles.
    planes = _planes_or_derived(planes, df)
    cols = [
        lsh_bucket(vec_col, planes, dim, offset=t * planes).alias(f"__b{t}")
        for t in range(tables)
    ]
    wide = df.select(F.col(id_col).alias("__id"), *cols)
    stack = (
        f"stack({tables}, "
        + ", ".join(f"{t}, __b{t}" for t in range(tables))
        + ") as (__t, __bk)"
    )
    # Both sides of the self-join read the bucket rows (tables x planes
    # dot products per vector) — persist, or the signatures compute
    # twice. Caller-owned lifetime (operators/dedup._persist contract).
    rows = _persist(wide.selectExpr("__id", stack))
    a, b = rows.alias("a"), rows.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.__bk") == F.col("b.__bk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("src"), F.col("b.__id").alias("dst"))
        .distinct()
    )
    cands = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    vecs = _persist(
        df.select(
            F.col(id_col).alias("__vid"),
            F.col(vec_col).alias("__v"),
            l2_norm(vec_col).alias("__n"),
        )
    )
    scored = (
        cands.join(vecs.alias("va"), F.col("src") == F.col("va.__vid"))
        .join(vecs.alias("vb"), F.col("dst") == F.col("vb.__vid"))
        .select(
            "src",
            "dst",
            (dot("va.__v", "vb.__v") / (F.col("va.__n") * F.col("vb.__n"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("src", "dst", "cosine", "rank")
    )


def sql_knn_graph(
    *,
    planes: int = 4,
    tables: int = 4,
    dim: int = 64,
    k: int = 5,
    source: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    bucket_cols = ", ".join(
        f"{sql_lsh_bucket('e', planes, dim, offset=t * planes)} AS b{t}"
        for t in range(tables)
    )
    table_rows = "\nUNION ALL\n".join(
        f"SELECT id, {t} AS t, b{t} AS bk FROM wide" for t in range(tables)
    )
    return f"""
        WITH v AS (
            SELECT {id_col} AS id,
                   list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
            FROM {source}
        ),
        norms AS (
            SELECT id, e,
                   sqrt(list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y)) AS n
            FROM v
        ),
        wide AS (SELECT id, e, {bucket_cols} FROM v),
        rows_t AS ({table_rows}),
        und AS (
            SELECT DISTINCT a.id AS src, b.id AS dst
            FROM rows_t a JOIN rows_t b ON a.t = b.t AND a.bk = b.bk AND a.id < b.id
        ),
        cands AS (
            SELECT src, dst FROM und
            UNION ALL
            SELECT dst AS src, src AS dst FROM und
        ),
        scored AS (
            SELECT src, dst,
                   list_reduce(list_transform(list_zip(va.e, vb.e), p -> p[1] * p[2]),
                               (x, y) -> x + y) / (va.n * vb.n) AS cosine
            FROM cands
            JOIN norms va ON src = va.id
            JOIN norms vb ON dst = vb.id
        )
        SELECT src, dst, cosine, rank FROM (
            SELECT src, dst, cosine,
                   CAST(row_number() OVER (PARTITION BY src
                        ORDER BY cosine DESC, dst ASC) AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """
