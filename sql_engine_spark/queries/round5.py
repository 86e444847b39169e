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
    from sql_engine_spark.operators.prefix import bucketed_running_sum, range_bucket

    docs = load(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs, id_col="doc_id", text_col="text").select(
        "doc_id", "score"
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
    ranked = bucketed_running_sum(
        base,
        part_cols=[],
        order_col="__ord",
        value_col="__one",
        bucket=range_bucket(F.col("score"), F.col("__lo"), F.col("__hi"), 32),
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
