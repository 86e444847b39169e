"""Round-8 vectors set 2: multi-entry greedy graph-ANN recall sweep —
the self-audit the single-entry ann_graph_greedy_search docstring
promises ("production adds beam width and layers"): the cheapest beam
dimension is MORE ENTRY POINTS, and this operator measures exactly what
each additional entry buys on the real shared graph.

Walk shape: E independent greedy cursors per query (entries = the E
smallest corpus ids, deterministic), each taking the same fixed hops as
the single-entry primitive; for each budget e in {1, 2, 4} the answer
is the best end-state among the first e entries. The DuckDB oracle
unrolls the identical hops with the (query, entry) key carried through
every round (the ann_graph_greedy_search code-generation device).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import _REGISTRY, register

_HOPS = 3
_MAX_ENTRIES = 4
_BUDGETS = [1, 2, 4]


@register(
    "ann_greedy_entries_sweep",
    oracle=None,  # composed below (generated hop unroll)
    doc="Recall-vs-entry-points sweep for greedy graph-ANN search: "
    f"{_MAX_ENTRIES} independent greedy walks per query (entry points "
    "= the smallest corpus ids, deterministic), same "
    f"{_HOPS}-hop budget as ann_graph_greedy_search; for each entry "
    f"budget e in {_BUDGETS} the per-query answer is the best "
    "end-state among the first e entries, scored as top-1 hit rate "
    "and mean regret against the exact brute-force answer. The "
    "measured version of the primitive's documented plateau trade — "
    "how much recall each extra restart buys is THE capacity knob of "
    "graph search at scale (restarts parallelize perfectly; deeper "
    "beams serialize). Each hop is one edge join keyed by the "
    "(query x entry) cursors + a cursor-partitioned argmax over "
    "degree-bounded candidates; the walk composes the SHARED graph "
    "relation. Oracle unrolls the identical hops with the cursor key "
    "carried through every round; the regret fold crosses engines "
    "via ssum.",
)
def ann_greedy_entries_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.vectors import dot, l2_norm
    from sql_engine_spark.operators.graph import knn_graph_shared, und_both_dirs, und_edges
    from sql_engine_spark.operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph_shared(spark, sf_dir)
    und = und_edges(g).where((F.col("a") >= 10) & (F.col("b") >= 10))
    adj = _persist(und_both_dirs(und, out_src="node", out_dst="nb"))
    vq = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        l2_norm("embedding").alias("__qn"),
    )
    vc = _persist(
        emb.where(F.col("vec_id") >= 10).select(
            F.col("vec_id").alias("__cid"),
            F.col("embedding").alias("__cv"),
            l2_norm("embedding").alias("__cn"),
        )
    )

    def scored(cands: DataFrame) -> DataFrame:
        # (query_id, entry, cand) -> + cosine(query, cand)
        return (
            cands.join(vc, cands["cand"] == vc["__cid"])
            .join(F.broadcast(vq), "query_id")
            .select(
                "query_id",
                "entry",
                "cand",
                (dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                    "cosine"
                ),
            )
        )

    # TakeOrdered (distributed) picks the E smallest ids; the rank
    # window then runs on E rows — never a corpus-wide global window.
    we = Window.orderBy("__cid")
    entries = (
        vc.select("__cid")
        .orderBy("__cid")
        .limit(_MAX_ENTRIES)
        .withColumn("entry", F.row_number().over(we))
        .select("entry", F.col("__cid").alias("cand"))
    )
    state = scored(
        vq.select("query_id").crossJoin(F.broadcast(entries))
    ).select(
        "query_id",
        "entry",
        F.col("cand").alias("cur"),
        F.col("cosine").alias("cur_cos"),
    )
    w = Window.partitionBy("query_id", "entry").orderBy(
        F.desc("cosine"), F.asc("cand")
    )
    for _ in range(_HOPS):
        # No .distinct() (r12, guide §2.4, same argument as
        # ann_graph_greedy_search): adj rows are unique, and the
        # rank-1 argmax below is insensitive to duplicate candidate
        # rows anyway — the distinct was one full shuffle per hop.
        cands = (
            state.join(adj, state["cur"] == adj["node"])
            .select("query_id", "entry", F.col("nb").alias("cand"))
            .unionByName(
                state.select("query_id", "entry", F.col("cur").alias("cand"))
            )
        )
        state = (
            scored(cands)
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(
                "query_id",
                "entry",
                F.col("cand").alias("cur"),
                F.col("cosine").alias("cur_cos"),
            )
        )
    state = _persist(state)
    brute1 = brute_force_topk(
        emb.where(F.col("vec_id") < 10),
        emb.where(F.col("vec_id") >= 10),
        id_col="vec_id",
        vec_col="embedding",
        k=1,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("brute_id"),
        F.col("cosine").alias("brute_cosine"),
    )
    budgets = F.broadcast(
        spark.createDataFrame([(e,) for e in _BUDGETS], "n_entries int")
    )
    wb = Window.partitionBy("n_entries", "query_id").orderBy(
        F.desc("cur_cos"), F.asc("cur")
    )
    best = (
        state.crossJoin(budgets)
        .where(F.col("entry") <= F.col("n_entries"))
        .withColumn("__rk", F.row_number().over(wb))
        .where(F.col("__rk") == 1)
    )
    j = best.join(F.broadcast(brute1), "query_id")
    return (
        j.groupBy("n_entries")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.sum(
                F.when(F.col("cur") == F.col("brute_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_hits"),
            ssum(F.col("brute_cosine") - F.col("cur_cos")).alias("total_regret"),
        )
        .select(
            F.col("n_entries").cast("long").alias("n_entries"),
            "n_queries",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_queries").cast("double")).alias(
                "hit_rate"
            ),
            (F.col("total_regret") / F.col("n_queries").cast("double")).alias(
                "mean_regret"
            ),
        )
    )


def _fix_entries_oracle() -> None:
    from sql_engine_spark.operators.graph import sql_knn_shared

    cos = """
        list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]),
                    (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
    """
    rounds = []
    prev = "s0"
    for r in range(1, _HOPS + 1):
        cur = f"s{r}"
        rounds.append(
            f"""cand_{r} AS (
            SELECT DISTINCT query_id, entry, cand FROM (
                SELECT s.query_id, s.entry, a.nb AS cand
                FROM {prev} s JOIN adj a ON a.node = s.cur
                UNION ALL
                SELECT query_id, entry, cur AS cand FROM {prev}
            )
        ),
        {cur} AS (
            SELECT query_id, entry, cand AS cur, cosine AS cur_cos FROM (
                SELECT x.query_id, x.entry, x.cand, {cos} AS cosine,
                       row_number() OVER (PARTITION BY x.query_id, x.entry
                           ORDER BY {cos} DESC, x.cand) AS rk
                FROM cand_{r} x
                JOIN v c ON c.vec_id = x.cand
                JOIN v q ON q.vec_id = x.query_id
            ) WHERE rk = 1
        )"""
        )
        prev = cur
    rounds_sql = ",\n        ".join(rounds)
    # MATERIALIZED is load-bearing at scale: the hop unroll references
    # `adj` once per hop, and DuckDB re-evaluates plain CTEs per
    # reference — at sf1 that rebuilt the whole LSH kNN construction
    # 4x and spilled ~70+ GB of temp (ENOSPC in the r11 sf1 seal).
    _REGISTRY["ann_greedy_entries_sweep"].oracle = f"""
        WITH knn AS MATERIALIZED ({sql_knn_shared()}),
        v AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn WHERE src >= 10 AND dst >= 10
        ),
        adj AS MATERIALIZED (
            SELECT a AS node, b AS nb FROM und
            UNION ALL
            SELECT b AS node, a AS nb FROM und
        ),
        entries AS (
            SELECT entry, vec_id AS cand FROM (
                SELECT vec_id,
                       CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER)
                           AS entry
                FROM v WHERE vec_id >= 10
            ) WHERE entry <= {_MAX_ENTRIES}
        ),
        s0 AS (
            SELECT q.vec_id AS query_id, en.entry, en.cand AS cur,
                   {cos.replace("c.e", "ce.e")} AS cur_cos
            FROM v q
            CROSS JOIN entries en
            JOIN v ce ON ce.vec_id = en.cand
            WHERE q.vec_id < 10
        ),
        {rounds_sql},
        budgets(n_entries) AS (VALUES {", ".join(f"({e})" for e in _BUDGETS)}),
        best AS (
            SELECT n_entries, query_id, cur, cur_cos FROM (
                SELECT b.n_entries, s.query_id, s.cur, s.cur_cos,
                       row_number() OVER (PARTITION BY b.n_entries, s.query_id
                           ORDER BY s.cur_cos DESC, s.cur) AS rk
                FROM {prev} s JOIN budgets b ON s.entry <= b.n_entries
            ) WHERE rk = 1
        ),
        brute1 AS (
            SELECT query_id, neighbor_id AS brute_id, cosine AS brute_cosine
            FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       {cos} AS cosine,
                       row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY {cos} DESC, c.vec_id) AS rk
                FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10
            ) WHERE rk = 1
        )
        SELECT CAST(best.n_entries AS BIGINT) AS n_entries,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN best.cur = brute1.brute_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN best.cur = brute1.brute_id
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS hit_rate,
               {sql_ssum('brute1.brute_cosine - best.cur_cos')}
                   / CAST(COUNT(*) AS DOUBLE) AS mean_regret
        FROM best JOIN brute1 USING (query_id)
        GROUP BY best.n_entries
    """


_fix_entries_oracle()
