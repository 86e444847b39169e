"""Round-5 operators: training-pipeline curation (per-source caps,
curriculum ordering, deterministic reservoirs), join acceleration
(Bloom pre-filtering), embedding quantization, time-series smoothing
and gap-filling, LM scoring depth (trigram backoff, n-gram novelty),
graph analytics (triangle counting), and exact-aggregation capability
rows (manual percentiles, deterministic mode).

Every operator keeps the repo's contract: DataFrame-first Spark
builder + bit-matching DuckDB oracle, no corpus-quadratic stage, no
driver collect of row data (bounded model/metadata collects only).
The reference engine (dylan-p-wong/sql-engine, src/planner/mod.rs
single-SELECT surface) expresses none of these; they extend the
LLM-data-pipeline surface of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.text import hashed_linear_score, sql_hashed_linear_score
from sql_engine_spark.registry import register

_CAP_PER_SOURCE = 15


@register(
    "curation_source_cap",
    oracle=f"""
        WITH scored AS ({sql_hashed_linear_score()}),
        j AS (
            SELECT d.doc_id, d.source, s.score
            FROM documents d JOIN scored s USING (doc_id)
        ),
        r AS (
            SELECT doc_id, source, score,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY score DESC, doc_id) AS BIGINT) AS rank
            FROM j
        )
        SELECT doc_id, source, score, rank FROM r WHERE rank <= {_CAP_PER_SOURCE}
    """,
    doc="Per-source document cap: keep the top-N docs per source by "
    "quality score — the domain-frequency cap every web-scale curation "
    "run applies (Common Crawl pipelines cap per-domain so no single "
    "site dominates the mixture). Source cardinality is SMALL (tens), "
    "so a bare per-source rank window funnels the corpus through a "
    "handful of tasks at 100 TB — ranking therefore runs through the "
    "salted two-level top-k (operators/similarity.two_level_topk, the "
    "ANN-family machinery reused verbatim): top-N per (source, salt), "
    "then a bounded final rank over <= 32*N rows per source. "
    "Bit-identical to the single window (pinned by the oracle).",
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import two_level_topk

    docs = load(spark, sf_dir, "documents")
    scored = hashed_linear_score(
        docs, id_col="doc_id", text_col="text", carry_cols=["source"]
    ).select("doc_id", "source", "score")
    return two_level_topk(
        scored,
        score_col="score",
        k=_CAP_PER_SOURCE,
        query_col="source",
        id_col="doc_id",
    ).select("doc_id", "source", "score", "rank")


_N_PHASES = 4


@register(
    "curation_curriculum_order",
    oracle=f"""
        WITH scored AS ({sql_hashed_linear_score()}),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM scored),
        r AS (
            SELECT doc_id, score,
                   CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
                       AS curriculum_rank
            FROM scored
        )
        SELECT doc_id, score, curriculum_rank,
               -- FLOOR before the cast: DuckDB CAST(double AS BIGINT)
               -- rounds where Spark's cast truncates
               CAST(FLOOR(((curriculum_rank - 1) * {_N_PHASES}) / total)
                    AS BIGINT) AS phase
        FROM r CROSS JOIN n
    """,
    doc="Curriculum ordering: rank the whole corpus easiest-first by "
    "quality score and split into training phases (curriculum learning, "
    "Bengio et al. 2009 — low-perplexity/high-quality docs first, hard "
    "tail last). The GLOBAL rank is the scale trap: row_number() over "
    "a bare ORDER BY sorts the corpus through ONE task, so the rank is "
    "computed as the bucketed two-level rank "
    "(operators/prefix.bucketed_running_sum over an order-consistent "
    "range bucket of the score, same machinery as sorted-neighborhood "
    "dedup) — one corpus shuffle, tiny per-bucket offsets broadcast "
    "back. Phase = floor((rank-1) * phases / N), exact integer "
    "arithmetic in both engines.",
)
def curation_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import bucketed_running_sum, range_bucket

    docs = load(spark, sf_dir, "documents")
    # The scored relation feeds the bounds aggregate AND the ranked
    # base — persist (caller-owned lifetime) or the corpus tokenizes
    # and scores three times.
    scored = _persist(
        hashed_linear_score(docs, id_col="doc_id", text_col="text").select(
            "doc_id", "score"
        )
    )
    bounds = scored.agg(
        F.min("score").alias("__lo"),
        F.max("score").alias("__hi"),
        F.count("*").cast("long").alias("__n"),
    )
    base = (
        scored.crossJoin(F.broadcast(bounds))
        .withColumn("__one", F.lit(1).cast("long"))
        # Total order (score, doc_id) as ONE orderable column: struct
        # comparison is lexicographic, exactly the oracle's ORDER BY
        # score, doc_id — no lossy string encoding of the double.
        .withColumn("__ord", F.struct(F.col("score"), F.col("doc_id")))
    )
    # Bucket count grows with the corpus (derived_rank_buckets): a
    # fixed 32 would put corpus/32 rows through each within-bucket
    # window task at 100x. scored is persisted, so the count is a
    # cheap cached pass.
    from sql_engine_spark.operators.prefix import derived_rank_buckets

    nb = derived_rank_buckets(scored.count())
    ranked = bucketed_running_sum(
        base,
        part_cols=[],
        order_col="__ord",
        value_col="__one",
        bucket=range_bucket(F.col("score"), F.col("__lo"), F.col("__hi"), nb),
        out_col="curriculum_rank",
    )
    return ranked.select(
        "doc_id",
        "score",
        "curriculum_rank",
        (((F.col("curriculum_rank") - 1) * _N_PHASES) / F.col("__n"))
        .cast("long")
        .alias("phase"),
    )


_RESERVOIR_K = 5


@register(
    "sample_reservoir_per_key",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, lang,
                   md5('rsv1|' || CAST(doc_id AS VARCHAR)) AS hkey
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang, hkey,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY hkey, doc_id) AS BIGINT)
                       AS rank
            FROM h
        )
        SELECT doc_id, lang, hkey, rank FROM r WHERE rank <= {_RESERVOIR_K}
    """,
    doc="Deterministic per-key 'reservoir': the k docs per language "
    "with the smallest seeded content hash — hash-order sampling, the "
    "distributed replacement for stateful reservoir algorithms "
    "(Vitter 1985): same uniform-without-replacement guarantee, but "
    "order-independent, rerun-stable, and mergeable (the k smallest "
    "hashes of a union are computable from each part's k smallest — "
    "the bottom-k sketch). Key cardinality is small (langs), so "
    "ranking runs through the salted two-level top-k with "
    "ascending=True (k SMALLEST hashes), never a per-key corpus "
    "funnel. Seed is part of the hash input: new seed, fresh sample.",
)
def sample_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import two_level_topk

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.concat(F.lit("rsv1|"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    )
    return two_level_topk(
        docs,
        score_col="hkey",
        k=_RESERVOIR_K,
        query_col="lang",
        id_col="doc_id",
        ascending=True,
    ).select("doc_id", "lang", "hkey", "rank")


@register(
    "join_bloom_prefilter",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_custkey = o.o_custkey
              AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 7000
        )
    """,
    doc="Bloom-filter join pre-filtering (operators/bloom.py; the "
    "runtime-filter pattern behind Spark's own "
    "runtime.bloomFilter.enabled, made an explicit operator): the "
    "selective dim side's keys fold into an 8192-bit / 4-hash bitset "
    "(distributed position generation, bounded driver fold — same "
    "class as centroid literals), which drops non-matching fact rows "
    "MAP-SIDE as a literal bit-probe expression before the join's "
    "exchange; the exact semi join then removes Bloom false "
    "positives, so the result is definitionally the plain semi join "
    "(which IS the oracle). At 100 TB this cuts the fact shuffle to "
    "~selectivity x corpus.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.bloom import bloom_prefiltered_semi_join

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7000)
    )
    return bloom_prefiltered_semi_join(
        orders,
        cust.select("c_custkey"),
        fact_key="o_custkey",
        dim_key="c_custkey",
    ).select("o_orderkey", "o_custkey", "o_totalprice")


from sql_engine_spark.operators.quantize import sql_int8_quantize  # noqa: E402


@register(
    "ann_int8_quantize",
    oracle=sql_int8_quantize(),
    doc="Scalar int8 embedding quantization (FAISS SQ8 posture, "
    "operators/quantize.py): per-dimension symmetric scales from ONE "
    "bounded aggregate over the exploded (dim, value) relation, "
    "quantize + reconstruction-error metrics as a pure map stage. "
    "4x storage cut for the 100 TB vector store with the codec "
    "trained and applied in one pipeline; zero-spread dimensions "
    "guarded to q=0 in both engines. Output is scalar per-vector "
    "metrics (l1 mass, code range, MSE) — cross-engine hash-safe, "
    "dimension-order-pinned folds.",
)
def ann_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.quantize import int8_quantize

    emb = load(spark, sf_dir, "embeddings")
    return int8_quantize(emb, id_col="vec_id", vec_col="embedding")


_EWMA_W = 16


@register(
    "events_ewma_half",
    oracle=f"""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM events
        )
        SELECT event_id, user_id, ts,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                           (a, x) -> a * 0.5 + x)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(vals, x -> CAST(1.0 AS DOUBLE))),
                           (a, x) -> a * 0.5 + x) AS ewma
        FROM w
    """,
    doc="Exponentially-weighted moving average per user (alpha = 1/2, "
    "16-event window) — the standard smoothing pass over per-entity "
    "metric streams. The recurrence is spelled as a LEFT FOLD over the "
    "window frame's value list: acc*0.5 + x weights the newest value "
    "2^0 and the oldest 2^-15, normalized by the same fold over ones. "
    "Halving arithmetic is EXACT in binary floating point, so the "
    "result is bit-identical across engines and partitionings — no "
    "libm pow, no order-dependent double sums. The window keys on "
    "user_id (high cardinality): one corpus shuffle, frames bounded "
    "at 16 values.",
)
def events_ewma_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_W - 1), Window.currentRow)
    )
    return (
        ev.withColumn("__vals", F.collect_list("value").over(w))
        .select(
            "event_id",
            "user_id",
            "ts",
            (
                F.expr(
                    "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)"
                )
                / F.expr(
                    "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + 1.0D)"
                )
            ).alias("ewma"),
        )
    )


@register(
    "events_gap_fill_asof",
    oracle="""
        WITH dedup AS (
            SELECT user_id, ts, arg_max(value, event_id) AS value
            FROM events GROUP BY user_id, ts
        ),
        bounds AS (
            SELECT user_id,
                   date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS grid_ts
            FROM bounds
        )
        SELECT g.user_id, g.grid_ts, e.value AS filled_value
        FROM grid g ASOF LEFT JOIN dedup e
          ON g.user_id = e.user_id AND g.grid_ts >= e.ts
    """,
    doc="Per-user hourly gap-fill with forward fill: generate each "
    "user's hourly grid between its first and last event (bounded "
    "per-user agg + sequence explode — grid is user-span-sized, never "
    "corpus^2) and carry the latest at-or-before reading onto every "
    "grid point — the resample/ffill step ahead of any window feature "
    "or seasonality model. Events are first deduped to one reading "
    "per (user, ts) (arg_max by event_id) so the as-of match is "
    "unambiguous in both engines; the fill itself is the union+window "
    "as-of join (operators/asof.py — one shuffle on user_id, no "
    "per-row subquery), and the DuckDB oracle is its native ASOF LEFT "
    "JOIN: two independent spellings, same semantics.",
)
def events_gap_fill_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    dedup = ev.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("value")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("__lo"),
        F.date_trunc("hour", F.max("ts")).alias("__hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.expr("sequence(__lo, __hi, INTERVAL 1 HOUR)")
        ).alias("grid_ts"),
    )
    return asof_join(
        grid,
        dedup,
        key="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        right_payload=["value"],
    ).select("user_id", "grid_ts", F.col("asof_value").alias("filled_value"))


from sql_engine_spark.operators.textprep import (  # noqa: E402
    shingles,
    sql_shingles,
    sql_tokens,
    tokens,
)

_TRI_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


@register(
    "text_trigram_backoff",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('text')} AS t FROM documents
        ),
        tg AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
            FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
        ),
        train AS (SELECT * FROM tg WHERE doc_id % 2 = 0),
        c3 AS (SELECT w1, w2, w3, COUNT(*) AS n3 FROM train GROUP BY 1, 2, 3),
        c2ctx AS (SELECT w1, w2, COUNT(*) AS ctx2 FROM train GROUP BY 1, 2),
        c2 AS (SELECT w2, w3, COUNT(*) AS n2 FROM train GROUP BY 1, 2),
        c1ctx AS (SELECT w2, COUNT(*) AS ctx1 FROM train GROUP BY 1),
        c1 AS (SELECT w3, COUNT(*) AS n1 FROM train GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM train),
        p AS (
            SELECT g.doc_id, g.pos,
                   CASE WHEN c3.n3 IS NOT NULL
                            THEN CAST(c3.n3 AS DOUBLE) / CAST(c2ctx.ctx2 AS DOUBLE)
                        WHEN c2.n2 IS NOT NULL
                            THEN {_TRI_ALPHA} *
                                 (CAST(c2.n2 AS DOUBLE) / CAST(c1ctx.ctx1 AS DOUBLE))
                        ELSE {_TRI_ALPHA} * {_TRI_ALPHA} *
                             (CAST(COALESCE(c1.n1, 0) AS DOUBLE) / total)
                   END AS p
            FROM tg g
            LEFT JOIN c3 USING (w1, w2, w3)
            LEFT JOIN c2ctx USING (w1, w2)
            LEFT JOIN c2 USING (w2, w3)
            LEFT JOIN c1ctx USING (w2)
            LEFT JOIN c1 USING (w3)
            CROSS JOIN tot
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(list_sort(list(struct_pack(pos := pos,
                                                                 p := p))),
                                      s -> s.p)),
                   (a, x) -> a + x) / COUNT(*) AS mean_score
        FROM p GROUP BY doc_id
    """,
    doc="Trigram LM with stupid backoff (Brants et al., EMNLP 2007 — "
    "'Large Language Models in Machine Translation', THE web-scale "
    "LM-scoring scheme before neural LMs): P(w3|w1 w2) backs off "
    "trigram -> 0.4*bigram -> 0.16*unigram when the higher-order "
    "context is unseen. Counts train on the EVEN-doc_id half of the "
    "corpus and score every doc, so the backoff paths are genuinely "
    "exercised (a self-trained LM never sees an unseen n-gram). "
    "Shape: one trigram explode (persisted — five count aggregates "
    "and the probe read it), bounded-vocab count relations joined "
    "back by hash equi-joins, per-doc fold in position order. Ratios "
    "and folds are order-pinned doubles; no libm log anywhere "
    "(arithmetic mean, same rationale as text_bigram_lm_score).",
)
def text_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    # Docs under 3 tokens yield no trigrams (the oracle's range(1, n-1)
    # is empty for them) — and Spark's sequence(1, n) DESCENDS when
    # n < 1, so an unguarded transform would index out of range on a
    # 2-token doc. Pre-filter, matching the oracle's empty result.
    docs = docs.where(F.size("__t") >= 3)
    tg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 2), "
                "i -> struct(CAST(i AS BIGINT) AS pos, "
                "element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2, "
                "element_at(__t, i + 2) AS w3))"
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.w1", "s.w2", "s.w3")
    tg = _persist(tg)
    train = tg.where(F.col("doc_id") % 2 == 0)
    c3 = train.groupBy("w1", "w2", "w3").agg(F.count("*").alias("n3"))
    c2ctx = train.groupBy("w1", "w2").agg(F.count("*").alias("ctx2"))
    c2 = train.groupBy("w2", "w3").agg(F.count("*").alias("n2"))
    c1ctx = train.groupBy("w2").agg(F.count("*").alias("ctx1"))
    c1 = train.groupBy("w3").agg(F.count("*").alias("n1"))
    tot = train.agg(F.count("*").cast("double").alias("total"))
    p = (
        tg.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2ctx, ["w1", "w2"], "left")
        .join(c2, ["w2", "w3"], "left")
        .join(c1ctx, ["w2"], "left")
        .join(c1, ["w3"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("n3").isNotNull(),
                F.col("n3").cast("double") / F.col("ctx2").cast("double"),
            )
            .when(
                F.col("n2").isNotNull(),
                F.lit(_TRI_ALPHA)
                * (F.col("n2").cast("double") / F.col("ctx1").cast("double")),
            )
            .otherwise(
                F.lit(_TRI_ALPHA)
                * F.lit(_TRI_ALPHA)
                * (
                    F.coalesce(F.col("n1"), F.lit(0)).cast("double")
                    / F.col("total")
                )
            )
            .alias("p"),
        )
    )
    return p.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        (
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, p))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.p)"
            )
            / F.count("*")
        ).alias("mean_score"),
    )


_NOVEL_K = 5


@register(
    "text_ngram_novelty",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(
                       {sql_shingles(sql_tokens('text'), _NOVEL_K)})) AS g
            FROM documents
        ),
        first_doc AS (SELECT g, MIN(doc_id) AS first_id FROM sh GROUP BY g)
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_frac
        FROM sh JOIN first_doc f USING (g)
        GROUP BY sh.doc_id
    """,
    doc="N-gram novelty scoring: the fraction of a document's distinct "
    "5-gram shingles whose FIRST corpus occurrence (min doc_id) is "
    "this document — the marginal-contribution signal dedup-aware "
    "data valuation uses (a doc that introduces no new n-grams is "
    "redundant with earlier data; cf. the D4/SemDeDup family's "
    "novelty pruning). Shape: one shingle explode, one min-per-shingle "
    "aggregate (map-side combinable), one equi-join back, one per-doc "
    "count — all corpus-linear, and the min() makes the result "
    "independent of partitioning and arrival order.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    sh = _persist(
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles("__t", _NOVEL_K))
            ).alias("g"),
        )
    )
    first_doc = sh.groupBy("g").agg(F.min("doc_id").alias("first_id"))
    hit = (F.col("first_id") == F.col("doc_id")).cast("long")
    return (
        sh.join(first_doc, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(hit).cast("long").alias("n_novel"),
            (F.sum(hit).cast("double") / F.count("*").cast("double")).alias(
                "novelty_frac"
            ),
        )
    )


from sql_engine_spark.operators.graph import (  # noqa: E402
    sql_triangle_corner_counts,
)
from sql_engine_spark.operators.similarity import knn_graph, sql_knn_graph  # noqa: E402


@register(
    "graph_triangle_count",
    oracle=f"""
        WITH knn AS ({sql_knn_graph(planes=4, tables=8, dim=64, k=5)}),
        {sql_triangle_corner_counts(
            "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn"
        )}
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM tri_corners GROUP BY node
    """,
    doc="Per-node triangle counting over the kNN similarity graph — "
    "the clustering-coefficient primitive for community detection and "
    "semantic-neighborhood density (dense triangles = tight duplicate "
    "clusters). Degree-ordered enumeration (Suri & Vassilvitskii, WWW "
    "2011 'Counting Triangles and the Curse of the Last Reducer' / "
    "Chiba-Nishizeki, operators/graph.triangle_corner_counts): edges "
    "orient low-degree -> high-degree, wedges form only at each "
    "triangle's minimum corner, closure is a semi join — per-vertex "
    "wedge volume is bounded by out-degree <= O(sqrt(m)) even at hub "
    "vertices, where an id-ordered orientation would pile a hub\'s "
    "whole neighborhood onto one corner. Reuses ann_knn_graph\'s "
    "build (planes=4, tables=8, k=5) so the oracle\'s graph is "
    "bit-identical.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.graph import triangle_corner_counts

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=8, dim=64, k=5
    )
    und = _persist(
        g.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
    )
    return triangle_corner_counts(und)


_PCTS = (0.25, 0.5, 0.75)


@register(
    "agg_percentile_exact",
    oracle=f"""
        WITH g AS (
            SELECT event_type, list_sort(list(value)) AS vals
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(len(vals) AS BIGINT) AS n,
               {", ".join(
                   "vals[CAST(FLOOR((len(vals) - 1) * " + str(p) + ") AS BIGINT) + 1] "
                   "+ ((len(vals) - 1) * " + str(p)
                   + " - FLOOR((len(vals) - 1) * " + str(p) + ")) "
                   "* (vals[least(CAST(FLOOR((len(vals) - 1) * " + str(p)
                   + ") AS BIGINT) + 2, len(vals))] "
                   "- vals[CAST(FLOOR((len(vals) - 1) * " + str(p) + ") AS BIGINT) + 1])"
                   f" AS p{int(p * 100)}"
                   for p in _PCTS
               )}
        FROM g
    """,
    doc="Exact interpolated percentiles (p25/p50/p75) per event type, "
    "spelled with ONE shared formula in both engines — h = (n-1)p, "
    "linear interpolation v[lo] + frac*(v[hi]-v[lo]) over the sorted "
    "multiset — instead of trusting each engine's quantile_cont to "
    "round identically (their interpolation spellings differ by an "
    "ulp). The oracle materializes each group's sorted list (DuckDB-"
    "side, fine at oracle scale); the SPARK plan must not — "
    "event_type cardinality is tiny, so a per-group collect_list "
    "funnels billions of doubles through single aggregation buffers "
    "at 100x. Exact percentiles only need the VALUES AT TWO RANKS "
    "per (group, p): rank every row with the bucketed two-level rank "
    "(operators/prefix.bucketed_running_sum of 1 over a range bucket "
    "of value — widest window is (event_type, bucket)-partitioned), "
    "derive the target ranks floor((n-1)p)+1 / +2 from the per-group "
    "counts (a broadcast-sized relation), and pick the ranked rows "
    "that hit them with a broadcast join. No per-group list anywhere; "
    "identical result by construction.",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import (
        bucketed_running_sum,
        derived_rank_buckets,
        range_bucket,
    )

    ev = _persist(
        load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    )
    bounds = ev.agg(F.min("value").alias("__lo"), F.max("value").alias("__hi"))
    nb = derived_rank_buckets(ev.count())
    base = (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn("__one", F.lit(1).cast("long"))
        # Total order (value, event_id): ties on value must get SOME
        # fixed order for ranking; the value at a given rank in the
        # sorted multiset is independent of how ties are broken.
        .withColumn("__ord", F.struct(F.col("value"), F.col("event_id")))
    )
    ranked = bucketed_running_sum(
        base,
        part_cols=["event_type"],
        order_col="__ord",
        value_col="__one",
        bucket=range_bucket(F.col("value"), F.col("__lo"), F.col("__hi"), nb),
        out_col="__rank",
    )
    # Target ranks per (event_type, p): h = (n-1)p, lo = floor(h)+1,
    # hi = min(lo+1, n) — one row per group per percentile, built from
    # the per-group counts (group-cardinality relation, broadcast).
    counts = ev.groupBy(F.col("event_type").alias("__g")).agg(
        F.count("*").cast("long").alias("n")
    )
    h_structs = F.array(
        *[
            F.struct(
                F.lit(int(p * 100)).alias("pct"),
                ((F.col("n") - 1).cast("double") * F.lit(p)).alias("h"),
            )
            for p in _PCTS
        ]
    )
    targets = (
        counts.select("__g", "n", F.explode(h_structs).alias("t"))
        .select(
            "__g",
            "n",
            F.col("t.pct").alias("pct"),
            (F.floor("t.h").cast("long") + 1).alias("lo_rank"),
            F.least(F.floor("t.h").cast("long") + 2, F.col("n")).alias("hi_rank"),
            (F.col("t.h") - F.floor("t.h")).alias("frac"),
        )
    )
    hits = ranked.join(
        F.broadcast(targets),
        (F.col("event_type") == F.col("__g"))
        & (
            (F.col("__rank") == F.col("lo_rank"))
            | (F.col("__rank") == F.col("hi_rank"))
        ),
    )
    per_p = hits.groupBy("__g", "n", "pct", "lo_rank", "hi_rank", "frac").agg(
        F.max(F.when(F.col("__rank") == F.col("lo_rank"), F.col("value"))).alias(
            "v_lo"
        ),
        F.max(F.when(F.col("__rank") == F.col("hi_rank"), F.col("value"))).alias(
            "v_hi"
        ),
    )
    pv = per_p.select(
        "__g",
        "n",
        "pct",
        (F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))).alias(
            "pv"
        ),
    )
    return pv.groupBy(F.col("__g").alias("event_type"), "n").agg(
        *[
            F.max(F.when(F.col("pct") == int(p * 100), F.col("pv"))).alias(
                f"p{int(p * 100)}"
            )
            for p in _PCTS
        ]
    )


@register(
    "agg_mode_deterministic",
    oracle="""
        WITH c AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang, source
        ),
        r AS (
            SELECT lang, source, n,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, source) AS rk
            FROM c
        )
        SELECT lang, source AS mode_source, n AS mode_count
        FROM r WHERE rk = 1
    """,
    doc="Deterministic per-group mode: the most frequent source per "
    "language, ties broken to the lexicographically smallest source — "
    "built-in mode() is tie-nondeterministic in BOTH engines, which "
    "makes it oracle-unhashable; the count + rank spelling pins the "
    "answer. The rank window runs over the (lang, source) COUNT "
    "relation (bounded by the key product), never corpus rows: the "
    "corpus-sized work is exactly one map-side-combinable count "
    "aggregate.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("source"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("lang", F.col("source").alias("mode_source"), F.col("n").alias("mode_count"))
    )


@register(
    "events_feature_lags",
    oracle="""
        SELECT event_id, user_id, ts, value,
               lag(value, 1) OVER w AS lag1,
               lag(value, 2) OVER w AS lag2,
               value - lag(value, 1) OVER w AS delta1,
               CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS BIGINT)
                   AS micros_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Per-entity lag features — the bread-and-butter feature "
    "engineering pass for sequence models and churn/anomaly training "
    "sets: previous readings, first difference, and inter-event time, "
    "all from ONE user-keyed ordered window (high-cardinality "
    "partition key, one corpus shuffle, no funnel). Inter-event gap "
    "is exact integer microseconds (epoch_us both engines), not a "
    "float subtraction.",
)
def events_feature_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_micros = F.unix_micros(F.lag(F.col("ts").cast("timestamp"), 1).over(w))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta1"),
        (micros - prev_micros).cast("long").alias("micros_since_prev"),
    )


_ROLL_DISTINCT_W = 5


@register(
    "window_rolling_distinct",
    oracle=f"""
        SELECT event_id, user_id, ts,
               CAST(len(list_distinct(list(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_ROLL_DISTINCT_W - 1} PRECEDING AND CURRENT ROW
               ))) AS BIGINT) AS n_distinct_types
        FROM events
    """,
    doc="Rolling COUNT(DISTINCT) over a window frame — a capability "
    "neither engine's window syntax allows directly (DISTINCT "
    "aggregates are invalid in OVER clauses): spelled as "
    "size(array_distinct(collect_list)) over the bounded 5-row frame, "
    "identical in the oracle with list_distinct(list(...)). Frames "
    "are bounded so the materialized lists are constant-size; the "
    "window keys on user_id (high cardinality, one shuffle). The "
    "behavioral-diversity signal (how many distinct actions in the "
    "last N) feeds session-quality and bot-detection features.",
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_DISTINCT_W - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("long")
        .alias("n_distinct_types"),
    )


@register(
    "scan_partitioned_write_prune",
    oracle="""
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    """,
    doc="Hive-style partitioned write + partition-pruned read: events "
    "land partitioned by event_type (the layout choice that turns a "
    "100 TB 'WHERE type = X' from a full scan into a directory "
    "listing), then the read filters on the partition column and "
    "Catalyst prunes at PLANNING time — the plan's PartitionFilters "
    "carries the predicate and PartitionCount shows one directory "
    "scheduled (pinned in tests/test_r5_ops.py). The re-read equals "
    "the plain filtered scan, which is the oracle. Same posture as "
    "scan_zonemap_prune but for the engine-native layout instead of "
    "footer stats.",
)
def scan_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    ev = load(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="part_events_")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    return (
        spark.read.parquet(out)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )


@register(
    "streaming_reservoir_sample",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, lang,
                   md5('rsv1|' || CAST(doc_id AS VARCHAR)) AS hkey
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang, hkey,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY hkey, doc_id) AS BIGINT)
                       AS rank
            FROM h
        )
        SELECT doc_id, lang, hkey, rank FROM r WHERE rank <= {_RESERVOIR_K}
    """,
    doc="Streaming bottom-k-hash reservoir per language, maintained "
    "incrementally across micro-batches through the idempotent "
    "materialized view (streaming/matview.py): each batch contributes "
    "its own bottom-k, the merge keeps the k smallest of view+batch — "
    "legal precisely because bottom-k sketches are MERGEABLE (the "
    "property pinned in tests/test_r5_ops.py), so the drained stream "
    "converges to the batch reservoir EXACTLY (same oracle as "
    "sample_reservoir_per_key). View state is langs x k rows; "
    "per-trigger cost O(batch) + O(view).",
)
def streaming_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from sql_engine_spark.streaming.matview import IdempotentMatView

    def bottom_k(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
        return (
            df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= _RESERVOIR_K)
            .select("doc_id", "lang", "hkey")
        )

    view = IdempotentMatView(
        tempfile.mkdtemp(prefix="rsv_view_"),
        partial_of=lambda b: bottom_k(
            b.select(
                "doc_id",
                "lang",
                F.md5(
                    F.concat(F.lit("rsv1|"), F.col("doc_id").cast("string"))
                ).alias("hkey"),
            )
        ),
        combine=lambda cur, partial: bottom_k(cur.unionByName(partial)),
    )
    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.source import table_stream

    with _state_partitions(spark):
        stream = table_stream(spark, sf_dir, "documents", ["doc_id"], 4)
        q = (
            stream.select("doc_id", "lang")
            .writeStream.outputMode("append")
            .foreachBatch(view.merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return view.read(spark).withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def _sql_lpa_iter(prev: str, cur: str) -> str:
    return f"""c_{cur} AS (
            SELECT e.src AS node, l.label, CAST(COUNT(*) AS BIGINT) AS n
            FROM lpa_edges e JOIN {prev} l ON l.node = e.dst
            GROUP BY 1, 2
        ),
        {cur} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (
                           PARTITION BY node ORDER BY n DESC, label) AS rk
                FROM c_{cur}
            ) WHERE rk = 1
        )"""


@register(
    "graph_label_propagation",
    oracle=f"""
        WITH knn AS ({sql_knn_graph(planes=4, tables=8, dim=64, k=5)}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        lpa_edges AS (
            SELECT a AS src, b AS dst FROM und
            UNION ALL
            SELECT b AS src, a AS dst FROM und
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM lpa_edges),
        {_sql_lpa_iter('l0', 'l1')},
        {_sql_lpa_iter('l1', 'l2')}
        SELECT node, label FROM l2
    """,
    doc="Synchronous label propagation (Raghavan et al. 2007) over the "
    "kNN similarity graph, FIXED 2 iterations with a deterministic "
    "update (most frequent neighbor label, ties to the smallest) so "
    "the oracle unrolls the identical rounds — the community-detection "
    "sibling of connected components for semantic cluster discovery, "
    "converging on modularity structure instead of mere connectivity. "
    "Per round: one edge-sized join + one (node, label) count "
    "aggregate + a per-node argmax window (node cardinality = corpus, "
    "bounded candidate lists — the knn_graph window argument). At "
    "depth, add the localCheckpoint discipline (pagerank_fixed's "
    "checkpoint_every).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=8, dim=64, k=5
    )
    und = g.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    edges = _persist(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(2):
        counts = (
            edges.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").cast("long").alias("n"))
        )
        labels = (
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels


from sql_engine_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum  # noqa: E402

_NEAREST_TOL_US = 1_800_000_000  # 30 minutes


@register(
    "join_asof_nearest",
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
        ),
        pairs AS (
            SELECT p.event_id AS pid, v.event_id AS vid, v.ts AS vts,
                   abs(epoch_us(v.ts) - epoch_us(p.ts)) AS d,
                   CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END AS dir
            FROM p JOIN v ON p.user_id = v.user_id
             AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= {_NEAREST_TOL_US}
        ),
        best AS (
            SELECT pid, vid, vts FROM (
                SELECT pid, vid, vts,
                       row_number() OVER (
                           PARTITION BY pid ORDER BY d, dir, vid DESC) AS rk
                FROM pairs
            ) WHERE rk = 1
        )
        SELECT p.event_id, p.user_id, p.ts,
               best.vid AS nearest_view_id, best.vts AS nearest_view_ts
        FROM p LEFT JOIN best ON best.pid = p.event_id
    """,
    doc="NEAREST-neighbor temporal join (either direction, 30-minute "
    "tolerance): each purchase matched to the closest same-user view "
    "by |time delta|, ties to the earlier side then the larger id — "
    "the sensor-alignment primitive pandas calls merge_asof("
    "direction='nearest'). Spelled as TWO union+window as-of passes "
    "(operators/asof.py) — backward on event time, forward on NEGATED "
    "time (an as-of join under order reversal) — then a per-row pick "
    "of the closer candidate: two user-keyed shuffles, no quadratic "
    "pairing. The oracle is the naive tolerance join + rank, so the "
    "hash match proves the two-pass decomposition complete.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", micros.alias("tm")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_event_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
        micros.alias("v_tm"),
    )
    back = asof_join(
        p,
        v,
        key="user_id",
        left_ts="tm",
        right_ts="v_tm",
        right_payload=["v_event_id", "v_ts"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        "tm",
        F.col("asof_v_event_id").alias("b_id"),
        F.col("asof_v_ts").alias("b_ts"),
        # asof_ts is the matched right-side order value — here v_tm
        F.col("asof_ts").alias("b_tm"),
    )
    fwd = asof_join(
        p.withColumn("neg_tm", -F.col("tm")),
        v.withColumn("neg_v_tm", -F.col("v_tm")),
        key="user_id",
        left_ts="neg_tm",
        right_ts="neg_v_tm",
        right_payload=["v_event_id", "v_ts", "v_tm"],
    ).select(
        "event_id",
        F.col("asof_v_event_id").alias("f_id"),
        F.col("asof_v_ts").alias("f_ts"),
        F.col("asof_v_tm").alias("f_tm"),
    )
    both = back.join(fwd, "event_id", "left")
    b_d = F.col("tm") - F.col("b_tm")
    f_d = F.col("f_tm") - F.col("tm")
    b_ok = F.col("b_tm").isNotNull() & (b_d <= _NEAREST_TOL_US)
    f_ok = F.col("f_tm").isNotNull() & (f_d <= _NEAREST_TOL_US)
    # closer wins; ties -> backward (dir 0 first, matching the oracle)
    pick_b = b_ok & (~f_ok | (b_d <= f_d))
    pick_f = f_ok & ~pick_b
    return both.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id"))
        .when(pick_f, F.col("f_id"))
        .alias("nearest_view_id"),
        F.when(pick_b, F.col("b_ts"))
        .when(pick_f, F.col("f_ts"))
        .alias("nearest_view_ts"),
    )


@register(
    "agg_corr_manual",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {sql_dsum('value')} AS sx,
                   {sql_dsum('value * value')} AS sxx,
                   {sql_dsum('CAST(hour(ts) AS DOUBLE)')} AS sy,
                   {sql_dsum('CAST(hour(ts) AS DOUBLE) * CAST(hour(ts) AS DOUBLE)')}
                       AS syy,
                   {sql_dsum('value * CAST(hour(ts) AS DOUBLE)')} AS sxy
            FROM events GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_rows,
               ((n * sxy) - (sx * sy))
                   / sqrt(((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy)))
                   AS corr_value_hour,
               ((n * sxy) - (sx * sy)) / ((n * syy) - (sy * sy))
                   AS regr_slope_on_hour
        FROM s
    """,
    doc="Pearson correlation + regression slope per group, from "
    "DECIMAL-exact co-moment sums: the built-in corr()/regr_slope() "
    "stream co-moments in engine-specific update orders (result "
    "depends on partitioning and differs across engines in the last "
    "ulps), so the five sufficient statistics are reduced exactly "
    "(DECIMAL(27,6), order-free) and the closed form evaluates in "
    "deterministic double arithmetic — same discipline as every "
    "dsum-based aggregate here. One map-side-combinable shuffle; "
    "sqrt is IEEE correctly-rounded, no libm hazard.",
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts").cast("double")
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        dsum("value").alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
        dsum("hr").alias("sy"),
        dsum(F.col("hr") * F.col("hr")).alias("syy"),
        dsum(F.col("value") * F.col("hr")).alias("sxy"),
    )
    cov_n = (F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    var_x = (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    var_y = (F.col("n") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        (cov_n / F.sqrt(var_x * var_y)).alias("corr_value_hour"),
        (cov_n / var_y).alias("regr_slope_on_hour"),
    )


@register(
    "events_hourly_profile",
    oracle=f"""
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_davg('value')} AS avg_value
        FROM events GROUP BY event_type, hour(ts)
    """,
    doc="Hour-of-day seasonality profile per event type — the "
    "daily-rhythm baseline behind anomaly thresholds and traffic "
    "forecasting. One map-side-combinable aggregate over "
    "(type, hour); averages via exact decimal sums so the profile is "
    "partition-order-independent.",
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        davg("value").alias("avg_value"),
    )


_N_SHARDS = 8


@register(
    "curation_shard_manifest",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, lang,
                   CAST(length({sql_tokens('text')}) AS DOUBLE) AS n_toks,
                   list_reduce(list_transform(range(1, 9),
                       i -> CAST(instr('0123456789abcdef',
                            substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
                            AS BIGINT)), (a, b) -> a * 16 + b) % {_N_SHARDS}
                       AS shard
            FROM documents
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_dsum('n_toks')} AS n_tokens,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM assigned GROUP BY shard
    """,
    doc="Training-shard manifest: every document deterministically "
    "assigned to one of 8 shards by a content-id hash (stable across "
    "reruns, engines, partitionings — md5-derived, NOT xxhash which "
    "DuckDB lacks), with per-shard doc counts, exact-decimal token "
    "totals, and language coverage — the writer-side bookkeeping a "
    "distributed training job reads to size its data loaders. Hash "
    "sharding means shard sizes concentrate tightly (pinned in "
    "tests); one aggregate, no skew keys.",
)
def curation_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    return (
        docs.select(
            shard.alias("shard"),
            "lang",
            F.size(tokens("text")).cast("double").alias("n_toks"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            dsum("n_toks").alias("n_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )


@register(
    "pipeline_dataset_build",
    oracle=f"""
        WITH scored AS ({sql_hashed_linear_score()}),
        j AS (
            SELECT d.doc_id, d.source, s.score
            FROM documents d JOIN scored s USING (doc_id)
        ),
        capped AS (
            SELECT doc_id, source, score FROM (
                SELECT doc_id, source, score,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY score DESC, doc_id) AS rk
                FROM j
            ) WHERE rk <= {_CAP_PER_SOURCE}
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM capped),
        ranked AS (
            SELECT doc_id, source, score,
                   CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
                       AS curriculum_rank
            FROM capped
        )
        SELECT doc_id, source, score, curriculum_rank,
               CAST(FLOOR(((curriculum_rank - 1) * {_N_PHASES}) / total)
                    AS BIGINT) AS phase,
               list_reduce(list_transform(range(1, 9),
                   i -> CAST(instr('0123456789abcdef',
                        substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
                        AS BIGINT)), (a, b) -> a * 16 + b) % {_N_SHARDS}
                   AS shard
        FROM ranked CROSS JOIN n
    """,
    doc="End-to-end dataset build — the round-5 curation flagship "
    "composing three operators into the shape a real pretraining-data "
    "job ships: (1) per-source quality cap (salted two-level top-N, "
    "no per-source funnel), (2) global curriculum rank over the kept "
    "docs (bucketed two-level rank) with phase split, (3) "
    "deterministic md5 shard assignment. ONE corpus scoring pass "
    "feeds all three stages; every rank is the two-level spelling, "
    "so the widest window in the plan is (key, salt/bucket)-"
    "partitioned. Output is the per-document training manifest "
    "(source, score, curriculum position, phase, shard).",
)
def pipeline_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import bucketed_running_sum, range_bucket
    from sql_engine_spark.operators.similarity import two_level_topk

    docs = load(spark, sf_dir, "documents")
    scored = hashed_linear_score(
        docs, id_col="doc_id", text_col="text", carry_cols=["source"]
    ).select("doc_id", "source", "score")
    capped = _persist(
        two_level_topk(
            scored,
            score_col="score",
            k=_CAP_PER_SOURCE,
            query_col="source",
            id_col="doc_id",
        ).select("doc_id", "source", "score")
    )
    bounds = capped.agg(
        F.min("score").alias("__lo"),
        F.max("score").alias("__hi"),
        F.count("*").cast("long").alias("__n"),
    )
    base = (
        capped.crossJoin(F.broadcast(bounds))
        .withColumn("__one", F.lit(1).cast("long"))
        .withColumn("__ord", F.struct(F.col("score"), F.col("doc_id")))
    )
    from sql_engine_spark.operators.prefix import derived_rank_buckets

    nb = derived_rank_buckets(capped.count())
    ranked = bucketed_running_sum(
        base,
        part_cols=[],
        order_col="__ord",
        value_col="__one",
        bucket=range_bucket(F.col("score"), F.col("__lo"), F.col("__hi"), nb),
        out_col="curriculum_rank",
    )
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    return ranked.select(
        "doc_id",
        "source",
        "score",
        "curriculum_rank",
        (((F.col("curriculum_rank") - 1) * _N_PHASES) / F.col("__n"))
        .cast("long")
        .alias("phase"),
        shard.alias("shard"),
    )


@register(
    "streaming_ewma_half",
    oracle=f"""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM events
        )
        SELECT event_id, user_id, ts,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                           (a, x) -> a * 0.5 + x)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(vals, x -> CAST(1.0 AS DOUBLE))),
                           (a, x) -> a * 0.5 + x) AS ewma
        FROM w
    """,
    doc="Streaming per-user EWMA (streaming/ewma.py): the batch "
    "events_ewma_half window maintained ONLINE with "
    "applyInPandasWithState — state per user is the trailing 15 "
    "readings (constant size, user-sharded), every event emits its "
    "smoothed value immediately in append mode (no watermark or "
    "sentinel needed). The Python fold is the identical acc*0.5+x "
    "halving arithmetic, so the drained stream converges to the batch "
    "window — and the batch oracle — BIT-exactly.",
)
def streaming_ewma_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.streaming import N_CHUNKS, _state_partitions
    from sql_engine_spark.streaming.ewma import ewma_stateful
    from sql_engine_spark.streaming.source import events_stream, run_to_memory

    with _state_partitions(spark):
        stream = events_stream(spark, sf_dir, N_CHUNKS)
        res = run_to_memory(
            ewma_stateful(stream, window=_EWMA_W), "stream_ewma_half", "append"
        )
    return res


@register(
    "dedup_bloom_ingest",
    oracle="""
        WITH base AS (
            SELECT md5(text) AS h FROM documents WHERE doc_id % 3 <> 0
        ),
        new_docs AS (
            SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0
        )
        SELECT n.doc_id, n.h AS content_hash
        FROM new_docs n
        WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.h = n.h)
    """,
    doc="Bloom-gated ingest dedup: admit only NEW-content documents "
    "from an arriving batch against the existing corpus — the "
    "front-door exact dedup of a continuously-fed training store. The "
    "corpus's content hashes fold into a Bloom bitset "
    "(operators/bloom.py); most new docs are decided map-side by the "
    "literal bit probe (a definite miss IS new — Bloom has no false "
    "negatives, so no admitted duplicate can slip through), and only "
    "probe-positive docs — duplicates plus the tunable false-positive "
    "sliver — reach the exact anti join. Result equals the plain anti "
    "join (the oracle) bit-for-bit; at 100 TB the anti join's shuffle "
    "carries ~dup_rate x batch instead of the whole batch. The "
    "even/odd-style doc_id split stands in for corpus-vs-arriving "
    "batch (same device as dedup_minhash_incremental).",
)
def dedup_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom_bits,
    )

    docs = load(spark, sf_dir, "documents").withColumn("h", F.md5("text"))
    base = docs.where(F.col("doc_id") % 3 != 0).select("h")
    new_docs = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "h")
    words, bits = build_bloom_bits(base, "h", bits=None)
    probe = bloom_might_contain("h", words, bits=bits)
    # definite misses are new by construction; probe-positives get the
    # exact verify (anti join removes real dups AND false positives)
    misses = new_docs.where(~probe)
    maybe = new_docs.where(probe).join(base, "h", "left_anti")
    return misses.unionByName(maybe).select(
        "doc_id", F.col("h").alias("content_hash")
    )


_HIST_BINS = 10
_HIST_LO, _HIST_HI = 0.0, 1000.0


@register(
    "agg_histogram_fixed_bins",
    oracle=f"""
        SELECT event_type,
               CAST(least(FLOOR((value - {_HIST_LO})
                          * {_HIST_BINS} / ({_HIST_HI} - {_HIST_LO})),
                          {_HIST_BINS - 1}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(value) AS bin_min,
               MAX(value) AS bin_max
        FROM events
        WHERE value >= {_HIST_LO} AND value <= {_HIST_HI}
        GROUP BY 1, 2
    """,
    doc="Fixed-width histogram per event type (10 bins over the value "
    "domain, top edge closed) — the profiling aggregate behind every "
    "data-quality dashboard and the binned input to drift detection. "
    "Bin assignment is exact integer-from-double FLOOR arithmetic "
    "spelled identically in both engines; one map-side-combinable "
    "aggregate, (type x bins) output rows, pushed-down range filter.",
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        (F.col("value") >= _HIST_LO) & (F.col("value") <= _HIST_HI)
    )
    bin_col = F.least(
        F.floor(
            (F.col("value") - F.lit(_HIST_LO))
            * F.lit(_HIST_BINS)
            / F.lit(_HIST_HI - _HIST_LO)
        ),
        F.lit(_HIST_BINS - 1),
    ).cast("long")
    return ev.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
    )


_PCA_ITERS = 3
_PCA_DIM = 64


def _sql_pca_iter(prev_v: str, tag: str) -> str:
    """One power-iteration round: s = X^T (X v) with decimal-exact
    per-dimension sums, then L2-normalize in dimension order."""
    return f"""pca_xv_{tag} AS (
            SELECT e,
                   list_reduce(list_transform(list_zip(e, (SELECT l FROM {prev_v})),
                                              p -> p[1] * p[2]),
                               (a, b) -> a + b) AS xv
            FROM pca_vecs
        ),
        pca_s_{tag} AS (
            SELECT dim, CAST(SUM(CAST(x * xv AS DECIMAL(27,6))) AS DOUBLE) AS s
            FROM (
                SELECT unnest(e) AS x, generate_subscripts(e, 1) AS dim, xv
                FROM pca_xv_{tag}
            ) GROUP BY dim
        ),
        pca_raw_{tag} AS (
            SELECT list_transform(list_sort(list(struct_pack(dim := dim, s := s))),
                                  t -> t.s) AS raw
            FROM pca_s_{tag}
        ),
        pca_n_{tag} AS (
            SELECT raw,
                   sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                            list_transform(raw, y -> y * y)), (a, b) -> a + b))
                       AS nrm
            FROM pca_raw_{tag}
        ),
        pca_v_{tag} AS (
            SELECT list_transform(raw, x -> x / nrm) AS l FROM pca_n_{tag}
        )"""


def _pca_oracle() -> str:
    iters = ",\n        ".join(
        _sql_pca_iter("pca_v0" if i == 1 else f"pca_v_i{i - 1}", f"i{i}")
        for i in range(1, _PCA_ITERS + 1)
    )
    last = f"i{_PCA_ITERS}"
    return f"""
        WITH pca_vecs AS MATERIALIZED (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        pca_v0 AS (
            SELECT list_transform(range(1, {_PCA_DIM + 1}),
                                  i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
                                            ELSE CAST(0.0 AS DOUBLE) END) AS l
        ),
        {iters},
        pca_count AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pca_vecs)
        SELECT CAST(dim AS BIGINT) AS dim,
               l[dim] AS component,
               (SELECT nrm FROM pca_n_{last}) / n AS eigenvalue_est
        FROM pca_v_{last}
        CROSS JOIN pca_count
        CROSS JOIN (SELECT unnest(range(1, {_PCA_DIM + 1})) AS dim)
    """


@register(
    "ann_pca_power_iteration",
    oracle=_pca_oracle(),
    doc="Top principal direction of the embedding corpus by MATRIX-FREE "
    "power iteration (3 rounds of v <- normalize(X^T (X v)) from the "
    "e_1 start): the PCA/whitening primitive embedding pipelines run "
    "before semantic clustering (SemDeDup-style) without ever "
    "materializing the 64x64 covariance — each round is ONE "
    "distributed pass (per-row dot with the LITERAL v, per-dim "
    "DECIMAL-exact sums, 64 rows back to the driver: model-sized, the "
    "k-means-literal discipline from operators/similarity.py). "
    "Python-side normalization folds in dimension order with the same "
    "IEEE doubles the oracle's list_reduce produces, so the component "
    "is bit-identical cross-engine. Output: (dim, component, "
    "eigenvalue_est = |X^T X v| / n).",
)
def ann_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.pca import pca_power_component

    emb = _persist(load(spark, sf_dir, "embeddings").select("embedding"))
    v, eig = pca_power_component(
        emb, vec_col="embedding", dim=_PCA_DIM, iterations=_PCA_ITERS
    )
    rows = [(d + 1, v[d], eig) for d in range(_PCA_DIM)]
    return spark.createDataFrame(
        rows, "dim long, component double, eigenvalue_est double"
    )


@register(
    "streaming_histogram",
    oracle=f"""
        SELECT event_type,
               CAST(least(FLOOR((value - {_HIST_LO})
                          * {_HIST_BINS} / ({_HIST_HI} - {_HIST_LO})),
                          {_HIST_BINS - 1}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE value >= {_HIST_LO} AND value <= {_HIST_HI}
        GROUP BY 1, 2
    """,
    doc="Streaming histogram: the fixed-bin value histogram maintained "
    "incrementally across micro-batches through the idempotent "
    "materialized view (streaming/matview.py) — per-batch partial bin "
    "counts merge by addition (counts are a trivially mergeable "
    "sketch), view state is (type x bins) rows, per-trigger cost "
    "O(batch)+O(view). Converges exactly to the one-shot batch "
    "histogram (agg_histogram_fixed_bins' counting side), retry-safe "
    "under foreachBatch's at-least-once redelivery.",
)
def streaming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from sql_engine_spark.queries.streaming import N_CHUNKS, _state_partitions
    from sql_engine_spark.streaming.matview import IdempotentMatView
    from sql_engine_spark.streaming.source import events_stream

    bin_col = F.least(
        F.floor(
            (F.col("value") - F.lit(_HIST_LO))
            * F.lit(_HIST_BINS)
            / F.lit(_HIST_HI - _HIST_LO)
        ),
        F.lit(_HIST_BINS - 1),
    ).cast("long")

    view = IdempotentMatView(
        tempfile.mkdtemp(prefix="hist_view_"),
        partial_of=lambda b: (
            b.where((F.col("value") >= _HIST_LO) & (F.col("value") <= _HIST_HI))
            .groupBy("event_type", bin_col.alias("bin"))
            .agg(F.count("*").cast("long").alias("n"))
        ),
        combine=lambda cur, partial: (
            cur.unionByName(partial)
            .groupBy("event_type", "bin")
            .agg(F.sum("n").cast("long").alias("n"))
        ),
    )
    with _state_partitions(spark):
        stream = events_stream(spark, sf_dir, N_CHUNKS)
        q = (
            stream.select("event_type", "value")
            .writeStream.outputMode("append")
            .foreachBatch(view.merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return view.read(spark).select("event_type", "bin", "n")


_RAKE_TOPN = 3


def _rake_stop_sql() -> str:
    from sql_engine_spark.operators.text import STOPWORDS

    return "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "text_rake_keywords",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS tok,
                   CASE WHEN t[i] IN {_rake_stop_sql()} THEN 1 ELSE 0 END
                       AS is_stop
            FROM (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
                 unnest(range(1, len(t) + 1)) u(i)
        ),
        seg AS (
            SELECT doc_id, pos, tok, is_stop,
                   SUM(is_stop) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS phrase_id
            FROM pos
        ),
        phrases AS (
            SELECT doc_id, phrase_id,
                   array_to_string(
                       list_transform(
                           list_sort(list(struct_pack(pos := pos, tok := tok))),
                           s -> s.tok),
                       ' ') AS phrase,
                   CAST(COUNT(*) AS BIGINT) AS plen
            FROM seg WHERE is_stop = 0
            GROUP BY doc_id, phrase_id
        ),
        occ AS (
            SELECT s.tok, p.plen
            FROM seg s JOIN phrases p
              ON p.doc_id = s.doc_id AND p.phrase_id = s.phrase_id
            WHERE s.is_stop = 0
        ),
        wordstats AS (
            SELECT tok,
                   CAST(COUNT(*) AS DOUBLE) AS freq,
                   CAST(SUM(plen) AS DOUBLE) AS deg
            FROM occ GROUP BY tok
        ),
        scored AS (
            SELECT s.doc_id, s.phrase_id,
                   list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(
                               list_sort(list(struct_pack(pos := s.pos,
                                                          sc := w.deg / w.freq))),
                               t -> t.sc)),
                       (a, x) -> a + x) AS score
            FROM seg s JOIN wordstats w ON w.tok = s.tok
            WHERE s.is_stop = 0
            GROUP BY s.doc_id, s.phrase_id
        )
        SELECT doc_id, phrase, score, rank FROM (
            SELECT p.doc_id, p.phrase, sc.score,
                   CAST(row_number() OVER (
                       PARTITION BY p.doc_id
                       ORDER BY sc.score DESC, p.phrase) AS BIGINT) AS rank
            FROM phrases p JOIN scored sc
              ON sc.doc_id = p.doc_id AND sc.phrase_id = p.phrase_id
        ) WHERE rank <= {_RAKE_TOPN}
    """,
    doc="RAKE keyword extraction (Rose et al. 2010 'Automatic Keyword "
    "Extraction from Individual Documents'): token runs between "
    "stopwords are candidate phrases; word score = corpus "
    "degree/frequency over phrase co-occurrence; phrase score = sum "
    "of word scores (folded in phrase position order for "
    "cross-engine bit-equality); top-3 phrases per doc. Shape: one "
    "position explode, a per-doc running stopword count (doc-keyed "
    "window, high cardinality), a bounded word-stats aggregate joined "
    "back, a per-doc rank — all corpus-linear. The per-doc windows "
    "key on doc_id, never the corpus.",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.text import STOPWORDS

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    pos = docs.select(
        "doc_id",
        F.posexplode("__t").alias("pos0", "tok"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        "tok",
        F.expr(f"CASE WHEN array_contains({stop_arr}, tok) THEN 1 ELSE 0 END")
        .alias("is_stop"),
    )
    w_seg = Window.partitionBy("doc_id").orderBy("pos")
    seg = _persist(
        pos.withColumn("phrase_id", F.sum("is_stop").over(w_seg))
    )
    nonstop = seg.where(F.col("is_stop") == 0)
    phrases = nonstop.groupBy("doc_id", "phrase_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))), "
            "s -> s.tok), ' ')"
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    occ = nonstop.join(
        phrases.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"]
    )
    wordstats = occ.groupBy("tok").agg(
        F.count("*").cast("double").alias("freq"),
        F.sum("plen").cast("double").alias("deg"),
    )
    scored = (
        nonstop.join(wordstats, "tok")
        .withColumn("sc", F.col("deg") / F.col("freq"))
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, sc))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.sc)"
            ).alias("score")
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        phrases.join(scored, ["doc_id", "phrase_id"])
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= _RAKE_TOPN)
        .select("doc_id", "phrase", "score", "rank")
    )


_PAY_BLOCK = 16  # base64 chars per digest block


def _sql_payload_digs() -> str:
    """Base64-chunk digests of the binary payload (DuckDB spelling).
    Spark's base64 MIME-wraps with \\r\\n every 76 chars; the Spark side
    strips them so both engines chunk the identical unwrapped string."""
    b64 = "to_base64(CAST(text AS BLOB))"
    return (
        f"list_transform(range(1, CAST(ceil(length({b64}) / {_PAY_BLOCK}.0) "
        f"AS BIGINT) + 1), i -> md5(substring({b64}, "
        f"CAST((i - 1) * {_PAY_BLOCK} + 1 AS BIGINT), {_PAY_BLOCK})))"
    )


@register(
    "multimodal_payload_simhash",
    oracle=f"""
        WITH sigs AS MATERIALIZED (
            SELECT doc_id AS id,
                   {{sig}} AS sig
            FROM documents
        ),
        blocks AS (
            SELECT id, b, substring(sig, b * 16 + 1, 16) AS key
            FROM sigs CROSS JOIN range(0, 4) t(b)
        ),
        candidates AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM blocks a JOIN blocks b
              ON a.b = b.b AND a.key = b.key AND a.id < b.id
        )
        SELECT id_a, id_b,
               CAST({{ham}} AS BIGINT) AS hamming
        FROM candidates
        JOIN sigs sa ON id_a = sa.id
        JOIN sigs sb ON id_b = sb.id
        WHERE {{ham}} <= 2
    """.format(
        sig="concat((CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 2, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 3, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 4, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 5, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 6, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 7, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 8, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 9, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 10, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 11, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 12, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 13, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 14, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 15, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 16, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 17, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 18, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 19, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 20, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 21, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 22, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 23, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 24, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 25, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 26, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 27, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 28, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 29, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 30, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 31, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 32, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 1, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 2, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 3, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 4, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 5, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 6, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 7, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 8, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 9, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 10, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 11, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 12, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 13, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 14, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 15, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 16, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 17, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 18, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 19, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 20, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 21, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 22, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 23, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 24, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 25, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 26, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 27, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 28, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 29, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 30, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 31, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END), (CASE WHEN (list_reduce(list_transform(list_transform(range(1, CAST(ceil(length(to_base64(CAST(text AS BLOB))) / 16.0) AS BIGINT) + 1), i -> md5(substring(to_base64(CAST(text AS BLOB)), CAST((i - 1) * 16 + 1 AS BIGINT), 16))), d -> CASE WHEN substring(d, 32, 1) IN ('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END), (a, b) -> a + b)) > 0 THEN '1' ELSE '0' END))",
        ham="((CASE WHEN substring(sa.sig, 1, 1) <> substring(sb.sig, 1, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 2, 1) <> substring(sb.sig, 2, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 3, 1) <> substring(sb.sig, 3, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 4, 1) <> substring(sb.sig, 4, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 5, 1) <> substring(sb.sig, 5, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 6, 1) <> substring(sb.sig, 6, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 7, 1) <> substring(sb.sig, 7, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 8, 1) <> substring(sb.sig, 8, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 9, 1) <> substring(sb.sig, 9, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 10, 1) <> substring(sb.sig, 10, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 11, 1) <> substring(sb.sig, 11, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 12, 1) <> substring(sb.sig, 12, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 13, 1) <> substring(sb.sig, 13, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 14, 1) <> substring(sb.sig, 14, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 15, 1) <> substring(sb.sig, 15, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 16, 1) <> substring(sb.sig, 16, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 17, 1) <> substring(sb.sig, 17, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 18, 1) <> substring(sb.sig, 18, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 19, 1) <> substring(sb.sig, 19, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 20, 1) <> substring(sb.sig, 20, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 21, 1) <> substring(sb.sig, 21, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 22, 1) <> substring(sb.sig, 22, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 23, 1) <> substring(sb.sig, 23, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 24, 1) <> substring(sb.sig, 24, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 25, 1) <> substring(sb.sig, 25, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 26, 1) <> substring(sb.sig, 26, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 27, 1) <> substring(sb.sig, 27, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 28, 1) <> substring(sb.sig, 28, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 29, 1) <> substring(sb.sig, 29, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 30, 1) <> substring(sb.sig, 30, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 31, 1) <> substring(sb.sig, 31, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 32, 1) <> substring(sb.sig, 32, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 33, 1) <> substring(sb.sig, 33, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 34, 1) <> substring(sb.sig, 34, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 35, 1) <> substring(sb.sig, 35, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 36, 1) <> substring(sb.sig, 36, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 37, 1) <> substring(sb.sig, 37, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 38, 1) <> substring(sb.sig, 38, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 39, 1) <> substring(sb.sig, 39, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 40, 1) <> substring(sb.sig, 40, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 41, 1) <> substring(sb.sig, 41, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 42, 1) <> substring(sb.sig, 42, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 43, 1) <> substring(sb.sig, 43, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 44, 1) <> substring(sb.sig, 44, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 45, 1) <> substring(sb.sig, 45, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 46, 1) <> substring(sb.sig, 46, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 47, 1) <> substring(sb.sig, 47, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 48, 1) <> substring(sb.sig, 48, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 49, 1) <> substring(sb.sig, 49, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 50, 1) <> substring(sb.sig, 50, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 51, 1) <> substring(sb.sig, 51, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 52, 1) <> substring(sb.sig, 52, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 53, 1) <> substring(sb.sig, 53, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 54, 1) <> substring(sb.sig, 54, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 55, 1) <> substring(sb.sig, 55, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 56, 1) <> substring(sb.sig, 56, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 57, 1) <> substring(sb.sig, 57, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 58, 1) <> substring(sb.sig, 58, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 59, 1) <> substring(sb.sig, 59, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 60, 1) <> substring(sb.sig, 60, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 61, 1) <> substring(sb.sig, 61, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 62, 1) <> substring(sb.sig, 62, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 63, 1) <> substring(sb.sig, 63, 1) THEN 1 ELSE 0 END) + (CASE WHEN substring(sa.sig, 64, 1) <> substring(sb.sig, 64, 1) THEN 1 ELSE 0 END))",
    ),
    doc="Near-duplicate BINARY payloads by SimHash over fixed-width "
    "base64 chunks — the perceptual-hash posture for opaque media "
    "blobs (catches payloads differing in a localized byte region, "
    "where exact digest dedup sees two distinct files): chunk the "
    "payload's base64 into 16-char blocks, md5 each, 64-bit simhash "
    "over chunk digests, Manku pigeonhole block pairing (d <= 2), "
    "unrolled Hamming verify. Reuses the text pipeline's entire "
    "simhash machinery via simhash_hamming_pairs_from_digests "
    "(operators/dedup.py); one map pass + 4 bounded-key equi-joins. "
    "Spark's MIME base64 wrapping is stripped so both engines chunk "
    "the identical string.",
)
def multimodal_payload_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import (
        simhash_hamming_pairs_from_digests,
    )
    from sql_engine_spark.operators.multimodal import with_binary_payload

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    b64 = "regexp_replace(base64(payload), '[\\r\\n]', '')"
    digs = docs.select(
        F.col("doc_id").alias("__id"),
        F.expr(
            f"transform(sequence(1, CAST(ceil(length({b64}) / {_PAY_BLOCK}.0) "
            f"AS INT)), i -> md5(substring({b64}, ({_PAY_BLOCK} * (i - 1)) + 1, "
            f"{_PAY_BLOCK})))"
        ).alias("__digs"),
    )
    return simhash_hamming_pairs_from_digests(
        digs, bits=64, n_blocks=4, max_hamming=2
    )


@register(
    "events_time_to_convert",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT user_id, ts FROM events WHERE event_type = 'view'
        ),
        matched AS (
            SELECT p.event_id,
                   epoch_us(p.ts) - max(epoch_us(v.ts)) AS delay_us
            FROM p JOIN v
              ON v.user_id = p.user_id AND v.ts <= p.ts
            GROUP BY p.event_id, p.ts
        ),
        d AS (
            SELECT list_sort(list(CAST(delay_us AS DOUBLE) / 1000000.0))
                       AS vals
            FROM matched
        )
        SELECT CAST(len(vals) AS BIGINT) AS n_converted,
               vals[CAST(FLOOR((len(vals) - 1) * 0.5) AS BIGINT) + 1]
               + ((len(vals) - 1) * 0.5 - FLOOR((len(vals) - 1) * 0.5))
                 * (vals[least(CAST(FLOOR((len(vals) - 1) * 0.5) AS BIGINT) + 2,
                               len(vals))]
                    - vals[CAST(FLOOR((len(vals) - 1) * 0.5) AS BIGINT) + 1])
                   AS p50_seconds,
               vals[CAST(FLOOR((len(vals) - 1) * 0.9) AS BIGINT) + 1]
               + ((len(vals) - 1) * 0.9 - FLOOR((len(vals) - 1) * 0.9))
                 * (vals[least(CAST(FLOOR((len(vals) - 1) * 0.9) AS BIGINT) + 2,
                               len(vals))]
                    - vals[CAST(FLOOR((len(vals) - 1) * 0.9) AS BIGINT) + 1])
                   AS p90_seconds,
               vals[len(vals)] AS max_seconds
        FROM d
    """,
    doc="View-to-purchase conversion latency: each purchase matched to "
    "the user's LATEST prior view (the as-of semantics, spelled as a "
    "max-per-purchase group in the oracle and the union+window as-of "
    "join in Spark — two independent spellings), delays summarized as "
    "exact interpolated p50/p90/max in integer-microsecond-derived "
    "seconds. Funnel *latency* is the metric product teams pair with "
    "funnel *counts* (events_user_funnel). The final exact percentile "
    "necessarily materializes the converted-purchase delays in one "
    "list (bounded by purchase count; the 100 TB posture is "
    "approx_percentile, as in agg_percentile_exact).",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", micros.alias("tm")
    )
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", micros.alias("v_tm")
    )
    matched = (
        asof_join(
            p,
            v.withColumn("__one", F.lit(1)),
            key="user_id",
            left_ts="tm",
            right_ts="v_tm",
            right_payload=["__one"],
        )
        .where(F.col("asof_ts").isNotNull())
        .select(
            ((F.col("tm") - F.col("asof_ts")).cast("double") / 1e6).alias(
                "delay_s"
            )
        )
    )
    d = matched.agg(F.array_sort(F.collect_list("delay_s")).alias("__vals"))
    cols = [F.size("__vals").cast("long").alias("n_converted")]
    for p_, name in ((0.5, "p50_seconds"), (0.9, "p90_seconds")):
        h = f"CAST((size(__vals) - 1) AS DOUBLE) * {p_}D"
        lo = f"CAST(FLOOR({h}) AS INT) + 1"
        hi = f"least({lo} + 1, size(__vals))"
        frac = f"({h} - FLOOR({h}))"
        cols.append(
            F.expr(
                f"element_at(__vals, {lo}) + {frac} * "
                f"(element_at(__vals, {hi}) - element_at(__vals, {lo}))"
            ).alias(name)
        )
    cols.append(F.expr("element_at(__vals, size(__vals))").alias("max_seconds"))
    return d.select(*cols)


_KANON_K = 5


@register(
    "privacy_k_anonymity",
    oracle=f"""
        WITH g AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_size
            FROM documents GROUP BY lang, source
        )
        SELECT lang, source, group_size,
               group_size >= {_KANON_K} AS k_anonymous,
               CASE WHEN group_size >= {_KANON_K} THEN lang
                    ELSE '*' END AS lang_released,
               CASE WHEN group_size >= {_KANON_K} THEN source
                    ELSE '*' END AS source_released
        FROM g
    """,
    doc="k-anonymity audit + suppression over the quasi-identifier "
    "tuple (lang, source): groups smaller than k=5 are re-"
    "identification risks and get their quasi-identifiers suppressed "
    "to '*' (generalization's simplest form) — the data-governance "
    "gate run before releasing per-document metadata alongside a "
    "corpus. One map-side-combinable aggregate; the released view "
    "derives per group, never per row.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("group_size")
    )
    anon = F.col("group_size") >= _KANON_K
    return g.select(
        "lang",
        "source",
        "group_size",
        anon.alias("k_anonymous"),
        F.when(anon, F.col("lang")).otherwise("*").alias("lang_released"),
        F.when(anon, F.col("source")).otherwise("*").alias("source_released"),
    )


_BPE_ROUNDS = 5


def _sql_bpe_round(prev_vocab: str, r: int) -> str:
    """One BPE round: weighted adjacent-pair counts over the symbol
    vocabulary, deterministic argmax pick, string-replace merge."""
    return f"""bpe_p{r} AS (
            SELECT pr[1] AS l, pr[2] AS rr, SUM(wcount) AS cnt
            FROM (
                SELECT unnest(list_transform(
                           range(1, len(syms)),
                           i -> [syms[i], syms[i + 1]])) AS pr,
                       wcount
                FROM (
                    SELECT string_split(trim(sym_str), ' ') AS syms, wcount
                    FROM {prev_vocab}
                )
            ) GROUP BY 1, 2
        ),
        bpe_pick{r} AS (
            SELECT l, rr, CAST(cnt AS BIGINT) AS cnt,
                   CAST({r} AS BIGINT) AS round
            FROM (
                SELECT l, rr, cnt,
                       row_number() OVER (ORDER BY cnt DESC, l, rr) AS k
                FROM bpe_p{r}
            ) WHERE k = 1
        ),
        bpe_v{r} AS (
            SELECT replace(v.sym_str, ' ' || p.l || ' ' || p.rr || ' ',
                           ' ' || p.l || p.rr || ' ') AS sym_str,
                   v.wcount
            FROM {prev_vocab} v CROSS JOIN bpe_pick{r} p
        )"""


def _bpe_oracle() -> str:
    rounds = ",\n        ".join(
        _sql_bpe_round("bpe_v0" if r == 1 else f"bpe_v{r - 1}", r)
        for r in range(1, _BPE_ROUNDS + 1)
    )
    picks = " UNION ALL ".join(
        f"SELECT round, l AS left_sym, rr AS right_sym, l || rr AS merged, cnt "
        f"FROM bpe_pick{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
        WITH bpe_words AS (
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
            FROM (SELECT unnest({sql_tokens('text')}) AS w FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        bpe_v0 AS MATERIALIZED (
            SELECT ' ' || array_to_string(
                       list_transform(range(1, length(word) + 1),
                                      i -> substring(word, i, 1)), ' ')
                   || ' ' AS sym_str,
                   wcount
            FROM bpe_words
        ),
        {rounds}
        SELECT * FROM ({picks})
    """


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = _BPE_ROUNDS
) -> list[tuple]:
    """Run `rounds` BPE merge rounds; returns [(round, l, r, merged, cnt)].
    Shared by the trainer query and the encoder.

    Scale posture: the corpus-sized work is exactly ONE tokenize + word
    count; every merge round runs over the word-frequency VOCABULARY
    (bounded, ~100k rows for web-scale corpora) with a 1-row argmax
    collect. At a real operating point (10k+ merges) the per-round
    Spark-job overhead dominates — by then the vocabulary relation is
    model-sized, so the right move is to collect it ONCE and run the
    merge loop driver-side (as reference BPE trainers do), or batch k
    non-overlapping merges per Spark round. The distributed loop here
    is the corpus-to-vocab bridge, not the inner trainer.
    """
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    words = (
        docs.select(F.explode("__t").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wcount"))
    )
    vocab = _persist(
        words.select(
            F.expr(
                "concat(' ', array_join(transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1)), ' '), ' ')"
            ).alias("sym_str"),
            "wcount",
        )
    )
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            # single-symbol words contribute no pairs; the filter also
            # dodges Spark's sequence(1, 0) yielding a DESCENDING [1,0]
            # instead of empty
            vocab.where(F.expr("size(split(trim(sym_str), ' ')) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(trim(sym_str), ' ')) - 1), "
                        "i -> struct(element_at(split(trim(sym_str), ' '), i) AS l, "
                        "element_at(split(trim(sym_str), ' '), i + 1) AS rr))"
                    )
                ).alias("pr"),
                "wcount",
            )
            .groupBy("pr.l", "pr.rr")
            .agg(F.sum("wcount").cast("long").alias("cnt"))
        )
        pick = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("rr")).limit(1).collect()[0]
        merges.append((r, pick.l, pick.rr, pick.l + pick.rr, pick.cnt))
        old_vocab = vocab
        vocab = _persist(
            vocab.select(
                # Column-safe literals (never f-string SQL): a learned
                # symbol can contain quotes/backslashes ("don't"), which
                # would break an interpolated expression string.
                F.replace(
                    F.col("sym_str"),
                    F.lit(f" {pick.l} {pick.rr} "),
                    F.lit(f" {pick.l}{pick.rr} "),
                ).alias("sym_str"),
                "wcount",
            )
        )
        old_vocab.unpersist()
    return merges



@register(
    "text_bpe_train_merges",
    oracle=_bpe_oracle(),
    doc="Byte-pair-encoding tokenizer training, 5 merge rounds "
    "(Sennrich et al. 2016): per round, ONE weighted adjacent-pair "
    "count over the word-frequency VOCABULARY (bounded relation, not "
    "the corpus — the standard BPE trick), a deterministic argmax "
    "pick (count desc, pair asc — a TakeOrdered top-1, no global "
    "sort), and the merge applied as a delimiter-guarded string "
    "replace whose left-to-right non-overlapping semantics are "
    "identical in the JVM and DuckDB — so both engines learn the "
    "IDENTICAL merge table, which is the output (round, left, right, "
    "merged, count). The picked pair returns to the driver per round "
    "(1 row — the kmeans-literal discipline); corpus-sized work is "
    "exactly one tokenize + word count.",
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round long, left_sym string, right_sym string, merged string, cnt long"
    )


def _bpe_encode_oracle() -> str:
    """Training CTEs (identical to the trainer) + per-doc encoding: each
    word's symbol string passes through the 5 learned replaces, then
    symbols are summed per document."""
    rounds = ",\n        ".join(
        _sql_bpe_round("bpe_v0" if r == 1 else f"bpe_v{r - 1}", r)
        for r in range(1, _BPE_ROUNDS + 1)
    )
    enc = "enc0"
    steps = []
    for r in range(1, _BPE_ROUNDS + 1):
        steps.append(
            f"""enc{r} AS (
            SELECT doc_id,
                   replace(sym_str,
                           ' ' || (SELECT l FROM bpe_pick{r}) || ' '
                               || (SELECT rr FROM bpe_pick{r}) || ' ',
                           ' ' || (SELECT l FROM bpe_pick{r})
                               || (SELECT rr FROM bpe_pick{r}) || ' ')
                       AS sym_str
            FROM enc{r - 1}
        )"""
        )
        enc = f"enc{r}"
    steps_sql = ",\n        ".join(steps)
    return f"""
        WITH bpe_words AS (
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
            FROM (SELECT unnest({sql_tokens('text')}) AS w FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        bpe_v0 AS MATERIALIZED (
            SELECT ' ' || array_to_string(
                       list_transform(range(1, length(word) + 1),
                                      i -> substring(word, i, 1)), ' ')
                   || ' ' AS sym_str,
                   wcount
            FROM bpe_words
        ),
        {rounds},
        enc0 AS MATERIALIZED (
            SELECT doc_id,
                   ' ' || array_to_string(
                       list_transform(range(1, length(w) + 1),
                                      i -> substring(w, i, 1)), ' ')
                   || ' ' AS sym_str
            FROM (SELECT doc_id, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        {steps_sql}
        SELECT doc_id,
               CAST(SUM(length(trim(sym_str))
                        - length(replace(trim(sym_str), ' ', '')) + 1)
                    AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(length(replace(trim(sym_str), ' ', ''))) AS BIGINT)
                   AS n_chars
        FROM {enc}
        GROUP BY doc_id
    """


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc="Apply the corpus-trained BPE merges to ENCODE every document: "
    "each word's character-symbol string passes through the 5 learned "
    "merge replaces (literal patterns — the merge table is model-"
    "sized driver state, exactly like trained centroids), then "
    "per-doc BPE token and character counts come from delimiter "
    "arithmetic. Train-then-apply in one pipeline: the token-count "
    "ratio n_chars/n_bpe_tokens is the compression the tokenizer "
    "bought — the metric tokenizer ablations report. Encoding is a "
    "pure map stage (5 string replaces per word), one explode + one "
    "per-doc aggregate around it.",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    enc = docs.select(
        "doc_id", F.explode("__t").alias("w")
    ).where(F.col("w") != "").select(
        "doc_id",
        F.expr(
            "concat(' ', array_join(transform(sequence(1, length(w)), "
            "i -> substring(w, i, 1)), ' '), ' ')"
        ).alias("sym_str"),
    )
    for _, l, rr, merged, _cnt in merges:
        # Column-safe literals — see _bpe_train's merge apply.
        enc = enc.withColumn(
            "sym_str",
            F.replace(
                F.col("sym_str"), F.lit(f" {l} {rr} "), F.lit(f" {merged} ")
            ),
        )
    return enc.groupBy("doc_id").agg(
        F.expr(
            "CAST(SUM(length(trim(sym_str)) "
            "- length(replace(trim(sym_str), ' ', '')) + 1) AS BIGINT)"
        ).alias("n_bpe_tokens"),
        F.expr(
            "CAST(SUM(length(replace(trim(sym_str), ' ', ''))) AS BIGINT)"
        ).alias("n_chars"),
    )


def _median_from_sorted(vals_expr: str, spark_side: bool) -> str:
    """Exact interpolated median over a sorted array column — the one
    shared formula (see agg_percentile_exact)."""
    size = f"size({vals_expr})" if spark_side else f"len({vals_expr})"
    el = (
        (lambda i: f"element_at({vals_expr}, {i})")
        if spark_side
        else (lambda i: f"({vals_expr})[{i}]")
    )
    h = f"CAST(({size} - 1) AS DOUBLE) * 0.5"
    lo = f"CAST(FLOOR({h}) AS {'INT' if spark_side else 'BIGINT'}) + 1"
    hi = f"least({lo} + 1, {size})"
    frac = f"({h} - FLOOR({h}))"
    return f"({el(lo)} + {frac} * ({el(hi)} - {el(lo)}))"


_MAD_K = 3.0


@register(
    "events_anomaly_mad",
    oracle=f"""
        WITH med AS (
            SELECT event_type,
                   {_median_from_sorted('list_sort(list(value))', False)} AS med
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type,
                   {_median_from_sorted(
                       'list_sort(list(abs(e.value - m.med)))', False)} AS mad,
                   MIN(m.med) AS med
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type
        )
        SELECT e.event_id, e.event_type, e.value, m.med, m.mad,
               CASE WHEN m.mad > 0.0
                        AND abs(e.value - m.med) / m.mad > {_MAD_K}
                    THEN TRUE ELSE FALSE END AS is_outlier
        FROM events e JOIN mad m USING (event_type)
    """,
    doc="Robust outlier detection by median absolute deviation: flag "
    "events where |value - median| / MAD > 3 per event type — the "
    "robust alternative to z-scores (events_anomaly_zscore), immune "
    "to the outliers it hunts inflating the threshold. Two exact "
    "grouped medians (the shared interpolation formula of "
    "agg_percentile_exact; per-group lists are the honest cost of "
    "exactness — approx_percentile at 100 TB) then a broadcast "
    "stats join; zero-MAD groups flag nothing, explicitly, in both "
    "engines.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.array_sort(F.collect_list("value")).alias("__v")
    ).select(
        "event_type", F.expr(_median_from_sorted("__v", True)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.abs(F.col("value") - F.col("med")))
            ).alias("__d"),
            F.min("med").alias("med"),
        )
        .select(
            "event_type",
            F.expr(_median_from_sorted("__d", True)).alias("mad"),
            "med",
        )
    )
    return ev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        (
            (F.col("mad") > 0.0)
            & (F.abs(F.col("value") - F.col("med")) / F.col("mad") > _MAD_K)
        ).alias("is_outlier"),
    )


@register(
    "curation_gini_balance",
    oracle="""
        WITH c AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ),
        r AS (
            SELECT n,
                   CAST(row_number() OVER (ORDER BY n, source) AS BIGINT) AS i
            FROM c
        ),
        t AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS tot
            FROM r
        )
        SELECT k AS n_sources, tot AS n_docs,
               CAST(SUM((2 * i - k - 1) * n) AS DOUBLE)
                   / (CAST(k AS DOUBLE) * CAST(tot AS DOUBLE)) AS gini
        FROM r CROSS JOIN t
        GROUP BY k, tot
    """,
    doc="Gini coefficient of the per-source document distribution — "
    "the one-number balance report for a training mixture (0 = "
    "perfectly uniform sources, ->1 = one source dominates; the "
    "dataset-card companion to curation_mixture_sample's rebalancing)."
    " Exact integer arithmetic until the final division (the classic "
    "sum((2i-k-1)*n) identity over counts ranked ascending), windows "
    "only over the bounded source-count relation.",
)
def curation_gini_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy("n", "source")
    r = c.withColumn("i", F.row_number().over(w).cast("long"))
    t = r.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("tot"),
    )
    return (
        r.crossJoin(F.broadcast(t))
        .groupBy("k", "tot")
        .agg(
            F.sum((2 * F.col("i") - F.col("k") - 1) * F.col("n"))
            .cast("double")
            .alias("__s")
        )
        .select(
            F.col("k").alias("n_sources"),
            F.col("tot").alias("n_docs"),
            (
                F.col("__s")
                / (F.col("k").cast("double") * F.col("tot").cast("double"))
            ).alias("gini"),
        )
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM du),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        contrib AS (
            SELECT d.day AS target_day, u.user_id
            FROM du u JOIN days d
              ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        ),
        wau AS (
            SELECT target_day AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib GROUP BY target_day
        )
        SELECT day, dau, wau,
               CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        FROM dau JOIN wau USING (day)
    """,
    doc="DAU / trailing-7-day WAU / stickiness per day — the product-"
    "analytics staple, spelled EXACTLY (no sketch): daily (day, user) "
    "distinct pairs, each contributing to its 7 covering target days "
    "via a bounded interval join (a 7-day band keyed on the day "
    "column, day-cardinality relation — never a row-level window, "
    "and COUNT(DISTINCT) inside a window is invalid SQL anyway). "
    "Corpus-sized work is ONE distinct over (day, user); everything "
    "after is day x users-per-day scale. Stickiness = DAU/WAU, the "
    "engagement ratio.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    ev = load(spark, sf_dir, "events")
    du = _persist(
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
        ).distinct()
    )
    dau = du.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    # Each (day, user) contributes to exactly the 7 target days
    # [day, day+6]: GENERATE them (explode of a 7-element sequence — a
    # pure map stage, constant 7 rows out per row in) instead of a
    # range-predicate join against the distinct-days relation, which
    # Catalyst plans as a broadcast nested loop whose per-row probe
    # count grows with history length. Target days with no activity
    # of their own drop at the final inner join with dau.
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@register(
    "text_source_drift_tv",
    oracle=f"""
        WITH toks AS (
            SELECT source, w
            FROM (SELECT source, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        per_source AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS nsw
            FROM toks GROUP BY source, w
        ),
        source_totals AS (
            SELECT source, CAST(SUM(nsw) AS BIGINT) AS ns
            FROM per_source GROUP BY source
        ),
        corpus AS (
            SELECT w, CAST(SUM(nsw) AS BIGINT) AS nw FROM per_source GROUP BY w
        ),
        corpus_total AS (SELECT CAST(SUM(nw) AS BIGINT) AS n FROM corpus),
        sums AS (
            SELECT s.source, t.ns, ct.n,
                   SUM(abs(CAST(s.nsw AS DECIMAL(19,0)) * CAST(ct.n AS DECIMAL(19,0))
                           - CAST(c.nw AS DECIMAL(19,0)) * CAST(t.ns AS DECIMAL(19,0))))
                       AS a,
                   CAST(SUM(c.nw) AS BIGINT) AS b
            FROM per_source s
            JOIN source_totals t USING (source)
            JOIN corpus c USING (w)
            CROSS JOIN corpus_total ct
            GROUP BY s.source, t.ns, ct.n
        )
        SELECT source, ns AS n_tokens,
               CAST(a AS DOUBLE)
                   / (2.0 * CAST(ns AS DOUBLE) * CAST(n AS DOUBLE))
               + (1.0 - CAST(b AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0
                   AS tv_distance
        FROM sums
    """,
    doc="Per-source distribution drift as TOTAL-VARIATION distance "
    "from the corpus unigram distribution: TV = 0.5 * sum |p_s(w) - "
    "p(w)| — the log-free drift/contamination monitor (KL/JS need "
    "libm log, which is not cross-engine bit-stable; TV is a proper "
    "metric with only abs/ratios). Words absent from a source "
    "contribute p(w)/2, folded in CLOSED FORM: over present words sum "
    "|p_s-p|/2 and add (1 - sum_present p)/2 — no per-source "
    "materialization of the full vocabulary. The sums are EXACT "
    "integers (TV numerators scaled by ns*n as decimal products — "
    "order-free, overflow-safe), converted to double once at the end: "
    "per-term decimal->double conversions round differently across "
    "engines in the last ulp, which a first draft of this operator "
    "hit on one source.",
)
def text_source_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    toks = docs.select("source", F.explode("__t").alias("w")).where(
        F.col("w") != ""
    )
    per_source = _persist(
        toks.groupBy("source", "w").agg(F.count("*").cast("long").alias("nsw"))
    )
    source_totals = per_source.groupBy("source").agg(
        F.sum("nsw").cast("long").alias("ns")
    )
    corpus = per_source.groupBy("w").agg(F.sum("nsw").cast("long").alias("nw"))
    corpus_total = corpus.agg(F.sum("nw").cast("long").alias("n"))
    D19 = "decimal(19,0)"
    term = F.abs(
        F.col("nsw").cast(D19) * F.col("n").cast(D19)
        - F.col("nw").cast(D19) * F.col("ns").cast(D19)
    )
    sums = (
        per_source.join(source_totals, "source")
        .join(corpus, "w")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source", "ns", "n")
        .agg(
            F.sum(term).alias("a"),
            F.sum("nw").cast("long").alias("b"),
        )
    )
    return sums.select(
        "source",
        F.col("ns").alias("n_tokens"),
        (
            F.col("a").cast("double")
            / (2.0 * F.col("ns").cast("double") * F.col("n").cast("double"))
            + (1.0 - F.col("b").cast("double") / F.col("n").cast("double")) / 2.0
        ).alias("tv_distance"),
    )


@register(
    "text_vocab_coverage_curve",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(
                       {sql_shingles(sql_tokens('text'), _NOVEL_K)})) AS g
            FROM documents
        ),
        first_doc AS (SELECT g, MIN(doc_id) AS first_id FROM sh GROUP BY g),
        per_doc AS (
            SELECT sh.doc_id,
                   CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM sh JOIN first_doc f USING (g)
            GROUP BY sh.doc_id
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM first_doc)
        SELECT doc_id, n_novel,
               CAST(SUM(n_novel) OVER (ORDER BY doc_id) AS BIGINT)
                   AS cum_novel,
               CAST(SUM(n_novel) OVER (ORDER BY doc_id) AS DOUBLE)
                   / CAST(vocab AS DOUBLE) AS vocab_frac
        FROM per_doc CROSS JOIN tot
    """,
    doc="Vocabulary-coverage curve: cumulative distinct 5-grams as the "
    "corpus is consumed in doc_id order — the saturation curve that "
    "tells a data buyer when additional documents stop contributing "
    "new content (the marginal-value sibling of text_ngram_novelty, "
    "whose per-doc counts feed it). The cumulative sum is the "
    "bucketed two-level prefix scan over a doc_id range bucket "
    "(operators/prefix) with corpus-scaled bucket count — never a "
    "bare ORDER BY window; the oracle is the single-window spelling, "
    "identical by the associativity argument.",
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import (
        bucketed_running_sum,
        derived_rank_buckets,
        range_bucket,
    )
    from sql_engine_spark.operators.textprep import shingles

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    sh = _persist(
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(shingles("__t", _NOVEL_K))).alias("g"),
        )
    )
    first_doc = sh.groupBy("g").agg(F.min("doc_id").alias("first_id"))
    per_doc = _persist(
        sh.join(first_doc, "g")
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("first_id") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel")
        )
    )
    vocab = first_doc.agg(F.count("*").cast("long").alias("vocab"))
    bounds = per_doc.agg(
        F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi")
    )
    nb = derived_rank_buckets(per_doc.count())
    cum = bucketed_running_sum(
        per_doc.crossJoin(F.broadcast(bounds)),
        part_cols=[],
        order_col="doc_id",
        value_col="n_novel",
        bucket=range_bucket(F.col("doc_id"), F.col("__lo"), F.col("__hi"), nb),
        out_col="cum_novel",
    )
    return cum.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "n_novel",
        F.col("cum_novel").cast("long").alias("cum_novel"),
        (F.col("cum_novel").cast("double") / F.col("vocab").cast("double")).alias(
            "vocab_frac"
        ),
    )


from sql_engine_spark.queries.dedup import _sql_minhash_lsh  # noqa: E402


@register(
    "curation_dedup_rate_report",
    oracle=f"""
        WITH pairs AS ({_sql_minhash_lsh(3, 8, 4, 0.2)}),
        dup_docs AS (
            SELECT DISTINCT id FROM (
                SELECT id_a AS id FROM pairs
                UNION ALL SELECT id_b FROM pairs
            )
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(dd.id) AS BIGINT) AS n_in_dup_pair,
               CAST(COUNT(dd.id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS dup_rate
        FROM documents d LEFT JOIN dup_docs dd ON dd.id = d.doc_id
        GROUP BY d.source
    """,
    doc="Per-source near-duplicate rate report: the fraction of each "
    "source's documents that participate in at least one MinHash-LSH "
    "duplicate pair (same 3-shingle/8-hash/4-band parameters as "
    "dedup_minhash_lsh) — the dataset-card number that tells a "
    "curator WHICH feed is polluting the corpus, not just that "
    "duplicates exist. Shape: the LSH pair pipeline + one distinct + "
    "one broadcast-joined per-source count; nothing quadratic.",
)
def curation_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_k=3, num_hashes=8, bands=4, threshold=0.2
    )
    dup_docs = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .distinct()
        .withColumn("__dup", F.lit(1).cast("long"))
    )
    return (
        docs.join(dup_docs, docs["doc_id"] == dup_docs["id"], "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("id").cast("long").alias("n_in_dup_pair"),
            (
                F.count("id").cast("double") / F.count("*").cast("double")
            ).alias("dup_rate"),
        )
    )


from sql_engine_spark.operators import text as _T  # noqa: E402
from sql_engine_spark.queries.text import _PII_SYNTH_SQL, _pii_synth_col  # noqa: E402

_PII_EXPRS = _T.sql_pii_redact_exprs("synth")


@register(
    "privacy_pii_density_report",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, source,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks,
                   {_PII_SYNTH_SQL} AS synth
            FROM documents
        )
        SELECT source,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               CAST(SUM({_PII_EXPRS['n_emails']}) AS BIGINT) AS n_emails,
               CAST(SUM({_PII_EXPRS['n_ips']}) AS BIGINT) AS n_ips,
               CAST(SUM({_PII_EXPRS['n_emails']} + {_PII_EXPRS['n_ips']})
                    AS DOUBLE) * 1000.0 / CAST(SUM(n_toks) AS DOUBLE)
                   AS pii_per_1k_tokens
        FROM s GROUP BY source
    """,
    doc="PII density report per source: email + IPv4 hits per 1,000 "
    "tokens (same synthesized PII column and Java/RE2-identical "
    "regexes as text_pii_redact) — the governance dashboard that "
    "ranks feeds by redaction burden BEFORE the redaction pass runs. "
    "One map pass (regex counts + token counts), one bounded "
    "per-source aggregate; integer sums until the final ratio.",
)
def privacy_pii_density_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("n_toks"),
        _pii_synth_col().alias("__synth"),
    )
    counted = _T.pii_redact(docs, "__synth", "doc_id").select(
        "doc_id", "n_emails", "n_ips"
    )
    j = docs.select("doc_id", "source", "n_toks").join(counted, "doc_id")
    return j.groupBy("source").agg(
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_emails").cast("long").alias("n_emails"),
        F.sum("n_ips").cast("long").alias("n_ips"),
        (
            F.sum(F.col("n_emails") + F.col("n_ips")).cast("double")
            * 1000.0
            / F.sum("n_toks").cast("double")
        ).alias("pii_per_1k_tokens"),
    )


@register(
    "streaming_source_drift",
    oracle=f"""
        WITH toks AS (
            SELECT source, w
            FROM (SELECT source, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        per_source AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS nsw
            FROM toks GROUP BY source, w
        ),
        source_totals AS (
            SELECT source, CAST(SUM(nsw) AS BIGINT) AS ns
            FROM per_source GROUP BY source
        ),
        corpus AS (
            SELECT w, CAST(SUM(nsw) AS BIGINT) AS nw FROM per_source GROUP BY w
        ),
        corpus_total AS (SELECT CAST(SUM(nw) AS BIGINT) AS n FROM corpus),
        sums AS (
            SELECT s.source, t.ns, ct.n,
                   SUM(abs(CAST(s.nsw AS DECIMAL(19,0)) * CAST(ct.n AS DECIMAL(19,0))
                           - CAST(c.nw AS DECIMAL(19,0)) * CAST(t.ns AS DECIMAL(19,0))))
                       AS a,
                   CAST(SUM(c.nw) AS BIGINT) AS b
            FROM per_source s
            JOIN source_totals t USING (source)
            JOIN corpus c USING (w)
            CROSS JOIN corpus_total ct
            GROUP BY s.source, t.ns, ct.n
        )
        SELECT source, ns AS n_tokens,
               CAST(a AS DOUBLE)
                   / (2.0 * CAST(ns AS DOUBLE) * CAST(n AS DOUBLE))
               + (1.0 - CAST(b AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0
                   AS tv_distance
        FROM sums
    """,
    doc="Streaming drift monitor: the per-(source, word) count relation "
    "is maintained across document micro-batches through the "
    "idempotent matview (counts merge by addition — the same "
    "mergeable-sketch argument as streaming_histogram), and the "
    "total-variation computation of text_source_drift_tv runs over "
    "the drained view — converging EXACTLY to the batch TV since the "
    "exact-integer sums are a pure function of the final counts. "
    "View state is vocabulary-sized; per-trigger cost O(batch) + "
    "O(view).",
)
def streaming_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.matview import IdempotentMatView
    from sql_engine_spark.streaming.source import table_stream

    view = IdempotentMatView(
        tempfile.mkdtemp(prefix="drift_view_"),
        partial_of=lambda b: (
            b.select("source", F.explode(tokens("text")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("source", "w")
            .agg(F.count("*").cast("long").alias("nsw"))
        ),
        combine=lambda cur, partial: (
            cur.unionByName(partial)
            .groupBy("source", "w")
            .agg(F.sum("nsw").cast("long").alias("nsw"))
        ),
    )
    with _state_partitions(spark):
        stream = table_stream(spark, sf_dir, "documents", ["doc_id"], 4)
        q = (
            stream.select("source", "text")
            .writeStream.outputMode("append")
            .foreachBatch(view.merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    per_source = view.read(spark)
    source_totals = per_source.groupBy("source").agg(
        F.sum("nsw").cast("long").alias("ns")
    )
    corpus = per_source.groupBy("w").agg(F.sum("nsw").cast("long").alias("nw"))
    corpus_total = corpus.agg(F.sum("nw").cast("long").alias("n"))
    D19 = "decimal(19,0)"
    term = F.abs(
        F.col("nsw").cast(D19) * F.col("n").cast(D19)
        - F.col("nw").cast(D19) * F.col("ns").cast(D19)
    )
    sums = (
        per_source.join(source_totals, "source")
        .join(corpus, "w")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source", "ns", "n")
        .agg(F.sum(term).alias("a"), F.sum("nw").cast("long").alias("b"))
    )
    return sums.select(
        "source",
        F.col("ns").alias("n_tokens"),
        (
            F.col("a").cast("double")
            / (2.0 * F.col("ns").cast("double") * F.col("n").cast("double"))
            + (1.0 - F.col("b").cast("double") / F.col("n").cast("double")) / 2.0
        ).alias("tv_distance"),
    )
