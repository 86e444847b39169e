"""Round-7 extras: quantified subquery comparisons (ANY/ALL — the SQL
surface Spark lacks natively, rewritten through min/max aggregates),
3-hop harmonic centrality over the kNN graph (exact sixth-integer
spelling, verified against a genuine DuckDB WITH RECURSIVE), a
Flesch-Kincaid readability profile per source, and a streaming CDC
apply whose materialized view converges exactly to the batch change-log
apply (pipeline_cdc_apply).

Reference parity: the reference engine plans single SELECTs with no
subqueries, recursion, or streaming (/root/reference/src/planner/
mod.rs:202-207); these compose the repo's own surfaces on top.

Determinism: ANY/ALL flags are exact boolean algebra on min/max
aggregates; centrality is an exact integer (6*c1 + 3*c2 + 2*c3 clears
the 1/2 and 1/3); readability counts are exact integers with the
Flesch-Kincaid constants embedded as shared literals and single double
divisions; the CDC view resolves to verbatim input values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import _REGISTRY, register

_SEED_MAX = 5
_MAX_HOPS = 3


@register(
    "subquery_any_all",
    oracle="""
        SELECT c_custkey, c_acctbal,
               c_acctbal > ALL (
                   SELECT o_totalprice FROM orders
                   WHERE o_custkey = c_custkey
                     AND o_orderpriority = '1-URGENT'
               ) AS beats_all_orders,
               c_acctbal < ANY (
                   SELECT o_totalprice FROM orders
                   WHERE o_custkey = c_custkey
                     AND o_orderpriority = '1-URGENT'
               ) AS below_some_order
        FROM customer
    """,
    doc="Quantified subquery comparisons — x > ALL(...) and x < ANY(...) "
    "— a SQL:92 surface Spark SQL does not parse natively. Rewritten "
    "with the textbook quantifier elimination: > ALL(S) == S empty OR "
    "x > max(S); < ANY(S) == S non-empty AND x < max(S) (o_totalprice "
    "is non-null, so the three-valued-logic NULL leg is vacuous and "
    "the rewrite is exact). One grouped max over the urgent orders, "
    "one left join; the DuckDB oracle runs the REAL correlated "
    "ANY/ALL, and the urgent-only subquery leaves some customers with "
    "an EMPTY set, so the empty-set semantics (ALL over empty = TRUE, "
    "ANY over empty = FALSE) are exercised in data, not just on "
    "paper.",
)
def subquery_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    omax = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("__max_price"))
    )
    j = cust.join(omax, cust.c_custkey == omax.o_custkey, "left")
    return j.select(
        "c_custkey",
        "c_acctbal",
        (
            F.col("__max_price").isNull()
            | (F.col("c_acctbal") > F.col("__max_price"))
        ).alias("beats_all_orders"),
        (
            F.col("__max_price").isNotNull()
            & (F.col("c_acctbal") < F.col("__max_price"))
        ).alias("below_some_order"),
    )


@register(
    "graph_harmonic_centrality",
    oracle=f"""
        WITH RECURSIVE knn AS ({{knn}}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        adj AS (
            SELECT a AS node, b AS nb FROM und
            UNION ALL
            SELECT b AS node, a AS nb FROM und
        ),
        seeds AS (
            SELECT DISTINCT node AS seed FROM adj WHERE node < {_SEED_MAX}
        ),
        walk AS (
            SELECT seed, seed AS node, 0 AS hops FROM seeds
            UNION ALL
            SELECT walk.seed, adj.nb AS node, walk.hops + 1 AS hops
            FROM walk JOIN adj ON walk.node = adj.node
            WHERE walk.hops < {_MAX_HOPS}
        ),
        mind AS (
            SELECT seed, node, MIN(hops) AS d
            FROM walk GROUP BY seed, node
        )
        SELECT seed,
               CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
               CAST(SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
               CAST(SUM(CASE WHEN d = 1 THEN 6
                             WHEN d = 2 THEN 3
                             WHEN d = 3 THEN 2 ELSE 0 END) AS BIGINT)
                   AS harmonic_x6
        FROM mind WHERE d > 0
        GROUP BY seed
    """,
    doc="Bounded-depth harmonic centrality (Boldi & Vigna 2014) of the "
    f"seed nodes (id < {_SEED_MAX}) over the kNN graph: sum of 1/d for "
    f"min-hop d <= {_MAX_HOPS}, kept EXACT as the integer 6/d sum "
    "(6*c1 + 3*c2 + 2*c3 — no float harmonic accumulation). The "
    "multi-source BFS carries (seed, node) pairs and DEDUPES the "
    "frontier every hop, so its width is capped at seeds x |reachable "
    "nodes|, never path-multiplied; the DuckDB oracle is a genuine "
    "WITH RECURSIVE, verifying the unrolled iteration against real "
    "recursion.",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared, und_edges

    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g)
    adj = _persist(
        und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
            und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
        )
    )
    seeds = (
        adj.select("node")
        .distinct()
        .where(F.col("node") < _SEED_MAX)
        .select(F.col("node").alias("seed"))
    )
    frontier = seeds.select("seed", F.col("seed").alias("node"))
    reach = frontier.withColumn("hops", F.lit(0))
    for r in range(1, _MAX_HOPS + 1):
        frontier = (
            adj.join(frontier, "node")
            .select("seed", F.col("nb").alias("node"))
            .distinct()
        )
        reach = reach.unionAll(frontier.withColumn("hops", F.lit(r)))
    mind = reach.groupBy("seed", "node").agg(F.min("hops").alias("d"))
    return (
        mind.where(F.col("d") > 0)
        .groupBy("seed")
        .agg(
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(F.col("d") == 2, 1).otherwise(0)).cast("long").alias("c2"),
            F.sum(F.when(F.col("d") == 3, 1).otherwise(0)).cast("long").alias("c3"),
            F.sum(
                F.when(F.col("d") == 1, 6)
                .when(F.col("d") == 2, 3)
                .when(F.col("d") == 3, 2)
                .otherwise(0)
            )
            .cast("long")
            .alias("harmonic_x6"),
        )
    )


def _fix_harmonic_oracle() -> None:
    from sql_engine_spark.operators.graph import sql_knn_shared

    q = _REGISTRY["graph_harmonic_centrality"]
    q.oracle = q.oracle.replace(
        "{knn}", sql_knn_shared()
    )


_fix_harmonic_oracle()

# Flesch-Kincaid grade-level constants (Kincaid et al. 1975), shared
# literals in both engines.
_FK_WPS, _FK_SPW, _FK_OFF = "0.39", "11.8", "15.59"


@register(
    "text_readability",
    oracle=f"""
        WITH per_doc AS (
            SELECT source,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                        AS BIGINT) AS words,
                   GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                                 AS BIGINT), 1) AS sentences,
                   CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
                        AS BIGINT) AS syllables
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(words) AS BIGINT) AS words,
               CAST(SUM(sentences) AS BIGINT) AS sentences,
               CAST(SUM(syllables) AS BIGINT) AS syllables,
               CAST({_FK_WPS} AS DOUBLE)
                   * (CAST(SUM(words) AS DOUBLE)
                      / CAST(SUM(sentences) AS DOUBLE))
               + CAST({_FK_SPW} AS DOUBLE)
                   * (CAST(SUM(syllables) AS DOUBLE)
                      / CAST(SUM(words) AS DOUBLE))
               - CAST({_FK_OFF} AS DOUBLE) AS fk_grade
        FROM per_doc
        GROUP BY source
    """,
    doc="Flesch-Kincaid grade level per source (Kincaid et al. 1975): "
    "words = '[a-z]+' matches, sentences = '[.!?]+' runs (floored at "
    "1 per doc), syllables approximated as vowel groups '[aeiou]+' — "
    "the standard codeless syllable proxy. All three are exact "
    "per-doc integers summed as BIGINTs (one corpus map pass + one "
    "source-sized aggregate, zero shuffles beyond the group); the "
    "grade is two integer-ratio divisions against shared constant "
    "literals, so it hashes identically cross-engine.",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0)))
        .cast("long")
        .alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0)))
            .cast("long"),
            F.lit(1).cast("long"),
        ).alias("sentences"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiou]+"), F.lit(0))
        )
        .cast("long")
        .alias("syllables"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("sentences").cast("long").alias("sentences"),
        F.sum("syllables").cast("long").alias("syllables"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        (
            F.lit(float(_FK_WPS))
            * (F.col("words").cast("double") / F.col("sentences").cast("double"))
            + F.lit(float(_FK_SPW))
            * (F.col("syllables").cast("double") / F.col("words").cast("double"))
            - F.lit(float(_FK_OFF))
        ).alias("fk_grade"),
    )


def _cdc_log(od: DataFrame) -> DataFrame:
    """The synthetic CDC change log shared with pipeline_cdc_apply
    (queries/round7_stats3.py): base load at seq 0, inserts/updates at
    seq 1 (disjoint key sets), deletes at seq 2 — derived row-wise from
    orders, so any subset of orders rows produces its own log slice."""
    base = od.where(F.col("o_orderkey") % 10 != 0).select(
        "*", F.lit(0).alias("__seq"), F.lit("I").alias("__op")
    )
    inserts = od.where(F.col("o_orderkey") % 10 == 0).select(
        "*", F.lit(1).alias("__seq"), F.lit("I").alias("__op")
    )
    updates = (
        od.where((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 10 != 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .select("*", F.lit(1).alias("__seq"), F.lit("U").alias("__op"))
    )
    deletes = od.where(F.col("o_orderkey") % 13 == 0).select(
        "*", F.lit(2).alias("__seq"), F.lit("D").alias("__op")
    )
    return base.unionByName(inserts).unionByName(updates).unionByName(deletes)


@register(
    "streaming_cdc_apply",
    oracle=None,  # patched below to pipeline_cdc_apply's oracle
    doc="Streaming CDC apply: the change log of pipeline_cdc_apply "
    "replayed through micro-batches, with an idempotent materialized "
    "view keeping ONE row per order key — the latest (seq, op, "
    "payload) via max_by, a mergeable per-key state (latest-wins is "
    "associative and commutative because per-key seqs are distinct), "
    "so the view is O(live keys) regardless of log length. Reading "
    "the view, dropping op='D', and aggregating converges EXACTLY to "
    "the batch apply — same DuckDB oracle, green at row/schema/hash "
    "granularity. The lakehouse MERGE maintenance loop as a stream, "
    "maintained by the shared orders replay fleet (streaming/fleet.py); "
    "per-view state untouched.",
)
def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    view = fleet_view(spark, sf_dir, "streaming_cdc_apply")
    final = view.read(spark).where(F.col("__op") != "D")
    return final.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )


def _cdc_latest(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderkey").agg(
        F.max("__seq").alias("__seq"),
        F.max_by("__op", "__seq").alias("__op"),
        F.max_by("o_orderstatus", "__seq").alias("o_orderstatus"),
        F.max_by("o_totalprice", "__seq").alias("o_totalprice"),
    )


from sql_engine_spark.streaming.fleet import register_fleet_view  # noqa: E402

register_fleet_view(
    "streaming_cdc_apply",
    table="orders",
    partial_of=lambda b: _cdc_latest(
        _cdc_log(b.select("o_orderkey", "o_orderstatus", "o_totalprice"))
    ),
    combine=lambda cur, partial: _cdc_latest(cur.unionByName(partial)),
)


def _fix_cdc_oracle() -> None:
    _REGISTRY["streaming_cdc_apply"].oracle = _REGISTRY["pipeline_cdc_apply"].oracle


_fix_cdc_oracle()
