"""Round-10 retrieval batch 2: positional-index operators — exact
phrase matching (the positional-postings join every search engine
runs for quoted queries) and best-snippet extraction (the max-density
passage window behind result highlighting and RAG chunk selection).

Both are position-join compositions: one posexplode of the tokenized
doc (positions are 1-based in both engines), bounded window passes.
The snippet stage runs only over the BM25 top-3 docs per query — a
broadcast semi-join prunes the corpus scan to <= 9 docs before any
position work.

The reference engine has no string/position surface beyond concat
(/root/reference/src/executor/expression.rs:119-260).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.operators.retrieval import (
    bm25_index_shared,
    bm25_topk_from_index,
)
from sql_engine_spark.operators.textprep import sql_tokens
from sql_engine_spark.queries.retrieval import _BM25_QUERIES
from sql_engine_spark.queries.round9_retrieval import _qterms_df
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# retrieval_phrase_match — exact adjacent-pair phrase search
# ---------------------------------------------------------------------------

_PHRASES = [
    ("p_hash_join", "hash", "join"),
    ("p_window_stream", "window", "stream"),
    ("p_vector_scan", "vector", "scan"),
]

_SQL_PHRASE_ROWS = ", ".join(
    f"('{pid}', '{w1}', '{w2}')" for pid, w1, w2 in _PHRASES
)


@register(
    "retrieval_phrase_match",
    oracle=f"""
        WITH ph(phrase_id, w1, w2) AS (VALUES {_SQL_PHRASE_ROWS}),
        pos AS (
            SELECT doc_id, tok, p
            FROM (SELECT doc_id,
                         unnest({sql_tokens('text')}) AS tok,
                         generate_subscripts({sql_tokens('text')}, 1) AS p
                  FROM documents)
        ),
        hits AS (
            SELECT ph.phrase_id, a.doc_id
            FROM ph
            JOIN pos a ON a.tok = ph.w1
            JOIN pos b ON b.doc_id = a.doc_id
                      AND b.tok = ph.w2
                      AND b.p = a.p + 1
        )
        SELECT ph.phrase_id,
               CAST(COUNT(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(h.doc_id) AS BIGINT) AS n_occurrences
        FROM ph LEFT JOIN hits h USING (phrase_id)
        GROUP BY ph.phrase_id
    """,
    doc="Exact phrase matching via a positional join (the quoted-query "
    "primitive; Manning, Raghavan & Schuetze ch.2's positional "
    "postings intersection): for each 2-word literal phrase, adjacent "
    "occurrences are position pairs (p, p+1) of the two terms within "
    "a doc — one posexplode plus a self-equi-join on (doc, position). "
    "Reports per phrase: matching docs and total occurrences "
    "(phrases with no hits report 0 via the left join — the empty "
    "case is part of the contract). The phrase relation is literal "
    "and broadcast; corpus-side work is one scan of the shared "
    "index's positional token arrays (no re-tokenize) + the position "
    "join, with the term filter pushed into the join key so only "
    "phrase-term positions shuffle. What dedup/BM25 token-set ops "
    "can't express — order matters.",
)
def retrieval_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.retrieval import token_arrays_shared

    ph = spark.createDataFrame(
        _PHRASES, ["phrase_id", "w1", "w2"]
    )
    pos = token_arrays_shared(spark, sf_dir).select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    a = pos.alias("a")
    b = pos.alias("b")
    hits = (
        F.broadcast(ph)
        .join(a, F.col("a.tok") == F.col("w1"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.tok") == F.col("w2"))
            & (F.col("b.p") == F.col("a.p") + 1),
        )
        .select("phrase_id", F.col("a.doc_id").alias("doc_id"))
    )
    return (
        ph.join(hits, "phrase_id", "left")
        .groupBy("phrase_id")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("doc_id").cast("long").alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# retrieval_snippet_best_window — max query-term density passage
# ---------------------------------------------------------------------------

_SNIP_W = 8
_SNIP_TOPD = 3


def _snippet_oracle() -> str:
    from sql_engine_spark.operators.retrieval import sql_bm25_index
    from sql_engine_spark.queries.round9_retrieval import (
        _sql_bm25_ranked,
        _SQL_QTERMS,
    )

    return f"""
        WITH {sql_bm25_index()},
        {_SQL_QTERMS},
        {_sql_bm25_ranked(_SNIP_TOPD)},
        top_docs AS (SELECT query_id, doc_id FROM branked),
        pos AS (
            SELECT d.doc_id, tok, p
            FROM (SELECT doc_id,
                         unnest({sql_tokens('text')}) AS tok,
                         generate_subscripts({sql_tokens('text')}, 1) AS p
                  FROM documents) d
            WHERE d.doc_id IN (SELECT doc_id FROM top_docs)
        ),
        marked AS (
            SELECT t.query_id, p.doc_id, p.p,
                   CASE WHEN q.token IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM top_docs t
            JOIN pos p USING (doc_id)
            LEFT JOIN qterms q ON q.query_id = t.query_id
                              AND q.token = p.tok
        ),
        winsum AS (
            SELECT query_id, doc_id, p AS win_start,
                   CAST(SUM(hit) OVER (
                       PARTITION BY query_id, doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND {_SNIP_W - 1} FOLLOWING
                   ) AS BIGINT) AS n_hits
            FROM marked
        )
        SELECT query_id, doc_id, win_start, n_hits FROM (
            SELECT query_id, doc_id, win_start, n_hits,
                   row_number() OVER (PARTITION BY query_id, doc_id
                       ORDER BY n_hits DESC, win_start ASC) AS rk
            FROM winsum
        ) WHERE rk = 1
    """


@register(
    "retrieval_snippet_best_window",
    oracle=_snippet_oracle(),
    doc=f"Best-snippet extraction: for each query's BM25 top-{_SNIP_TOPD} "
    f"docs (shared index), the {_SNIP_W}-token window with the most "
    "query-term occurrences — (n_hits DESC, win_start ASC) "
    "deterministic argmax via one bounded window sum over the doc's "
    "positions. The passage-selection primitive behind result "
    "highlighting and RAG chunk picking. Corpus discipline: the "
    "position explode runs AFTER a semi-join against the <= "
    f"{3 * _SNIP_TOPD} top doc ids (filter pushed to the scan), so "
    "snippet work never touches the full corpus; the BM25 pass "
    "scans the shared materialized index.",
)
def retrieval_snippet_best_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sql_engine_spark.queries.retrieval import bm25_ranked_shared

    # r13: the BM25 first pass is the process-shared materialized
    # ranking (rank <= 3 is a prefix of the house top-10). The two
    # consumers below (`wanted` + the broadcast into `marked`)
    # previously re-evaluated the whole unpersisted first pass each.
    top = bm25_ranked_shared(spark, sf_dir, k=_SNIP_TOPD).select(
        "query_id", "doc_id"
    )
    from sql_engine_spark.operators.retrieval import token_arrays_shared

    wanted = top.select("doc_id").distinct()
    pos = (
        token_arrays_shared(spark, sf_dir)
        .join(F.broadcast(wanted), "doc_id", "left_semi")
        .select("doc_id", F.posexplode("t").alias("p0", "tok"))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    )
    qterms = _qterms_df(spark)
    q = qterms.select(
        F.col("query_id").alias("qq"), F.col("token").alias("qtok")
    ).withColumn("qhit", F.lit(1))
    marked = (
        F.broadcast(top)
        .join(pos, "doc_id")
        .join(
            F.broadcast(q),
            (F.col("qq") == F.col("query_id")) & (F.col("qtok") == F.col("tok")),
            "left",
        )
        .select(
            "query_id",
            "doc_id",
            "p",
            F.coalesce("qhit", F.lit(0)).alias("hit"),
        )
    )
    wsum = (
        Window.partitionBy("query_id", "doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, _SNIP_W - 1)
    )
    winsum = marked.select(
        "query_id",
        "doc_id",
        F.col("p").alias("win_start"),
        F.sum("hit").over(wsum).cast("long").alias("n_hits"),
    )
    wrk = Window.partitionBy("query_id", "doc_id").orderBy(
        F.col("n_hits").desc(), F.col("win_start").asc()
    )
    return (
        winsum.withColumn("rk", F.row_number().over(wrk))
        .where(F.col("rk") == 1)
        .select("query_id", "doc_id", "win_start", "n_hits")
    )
