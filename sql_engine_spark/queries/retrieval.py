"""Retrieval queries: inverted index + BM25 search over `documents`.

Engine-beyond-reference coverage (the reference's single-SELECT Rust
executor, /root/reference/src/planner/mod.rs:202-207, cannot express a
GROUP BY + join pipeline); the LLM-data-pipeline rationale is corpus
search: contamination audits, probe matching, retrieval baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.io import load
from sql_engine_spark.operators import retrieval as R
from sql_engine_spark.registry import register

_IDX_MAX_DF = 400

# Literal query set: drawn from the synthetic corpus vocabulary so tf /
# length normalization actually discriminates.
_BM25_QUERIES = [
    ("q_join", "hash join merge sort"),
    ("q_stream", "window stream batch"),
    ("q_scan", "vector scan filter"),
]
_BM25_K = 10


@register(
    "text_inverted_index",
    oracle=R.sql_inverted_index(max_df=_IDX_MAX_DF),
    doc="Inverted index build: token -> document frequency + postings "
    "list sorted by doc id ('doc:tf,...'), hot tokens (df > "
    f"{_IDX_MAX_DF}) dropped — the stopword cap that bounds posting "
    "width. One corpus shuffle (hash agg on token); postings sorted "
    "after collect_list so output is deterministic under any "
    "partitioning.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return R.inverted_index(
        docs, id_col="doc_id", text_col="text", max_df=_IDX_MAX_DF
    )


@register(
    "text_bm25_topk",
    oracle=R.sql_bm25_topk(_BM25_QUERIES, k=_BM25_K),
    doc="BM25-family top-10 per literal query (Robertson k1=1.2, "
    "b=0.75; rational odds-ratio idf — libm ln differs JVM-vs-glibc "
    "by an ulp; NOTE multi-term rankings can diverge from log-idf "
    "canonical BM25, not just rescale — operators/retrieval.py): "
    "broadcast query terms filter the corpus explode map-side, one "
    "(doc, term) hash agg, 1-row global stats broadcast, per-doc term "
    "scores folded in sorted-term order (bit-deterministic double "
    "sums), and the per-query ranking runs through the salted "
    "two-level top-k — no single-task corpus-sized sort. Round 9: "
    "reads the SHARED materialized index (operators/retrieval."
    "bm25_index_shared) — identical scores, the (doc, term) aggregate "
    "IS what the index stores.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_ranked_shared(spark, sf_dir)


def bm25_ranked_shared(
    spark: SparkSession, sf_dir: str, *, k: int = _BM25_K
) -> DataFrame:
    """The house BM25 first-pass ranking (query_id, doc_id, score,
    rank <= k) over _BM25_QUERIES, built once per (process, dataset)
    and materialized (operators/retrieval.ranked_shared). `k` must be
    <= the house {_BM25_K} and filters the shared table by rank — a
    rank-prefix is bit-identical to ranking at the smaller k under the
    (score DESC, doc ASC) strict total order."""
    if k > _BM25_K:
        raise ValueError(f"k={k} exceeds the shared ranking's k={_BM25_K}")

    def build() -> DataFrame:
        tf, docstats = R.bm25_index_shared(spark, sf_dir)
        return R.bm25_topk_from_index(tf, docstats, _BM25_QUERIES, k=_BM25_K)

    ranked = R.ranked_shared(spark, sf_dir, "bm25", build)
    if k < _BM25_K:
        from pyspark.sql import functions as F

        ranked = ranked.where(F.col("rank") <= k)
    return ranked
