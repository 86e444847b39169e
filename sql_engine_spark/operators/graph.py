"""Fixed-iteration PageRank (Brin & Page 1998) — distributed, and
bit-reproducible across engines.

The standard large-graph PageRank loop is one join + one aggregate per
iteration (contributions flow along edges, sum per target) — the same
shape as the connected-components loop in operators/dedup.py. Two
disciplines make it oracle-hashable:

- FIXED iteration count (like connected_components_fixed): the result
  is a pure function of the edge set, so the oracle unrolls the same
  rounds. At scale you loop to a convergence tolerance instead.
- DECIMAL-rounded contributions: per-edge contribution rank/out_degree
  is deterministic double arithmetic, but SUMMING doubles depends on
  partition order — so each contribution is cast to DECIMAL(27,6)
  (exact, order-independent sum; functions/numeric.py) and only the
  finished per-node total returns to double. The rounding is part of
  the operator's definition, applied identically in the oracle.

Dangling nodes (no out-edges) keep receiving the teleport term but
their mass is not redistributed — a documented simplification that
keeps every round a single join+aggregate (full dangling handling adds
one bounded global aggregate per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import DEC

DAMPING = 0.85


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = DAMPING,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(node, pagerank) after `iterations` rounds from a uniform start.

    `nodes` must contain every vertex (isolated vertices keep the
    teleport rank). The per-round shuffles are the edge join keyed by
    src and the contribution aggregate keyed by dst — both
    corpus-of-edges sized, nothing quadratic; rank state is one row
    per node.

    The rank lineage nests one join+aggregate per round; at the
    default 3 iterations that is a fine single plan, at 10+ the plan
    tree (and Catalyst analysis time) grows superlinearly.
    `checkpoint_every=k` truncates lineage with localCheckpoint every
    k rounds — the connected_components_fixed discipline
    (operators/dedup.py): downstream plans see a flat LogicalRDD scan.
    Defaults to None (pure lazy plan) for <=5 iterations and should be
    set (e.g. 2-3) beyond that; on a real cluster swap in checkpoint()
    to reliable storage so the loop survives executor loss.
    """
    from sql_engine_spark.operators.dedup import _persist

    n_df = nodes.agg(F.count("*").cast("double").alias("__N"))
    base = nodes.select(F.col(node_col).alias("__node")).crossJoin(F.broadcast(n_df))
    # Every iteration re-reads the edge list and its out-degrees; if
    # `edges` is itself a pipeline (here: the kNN-graph build), an
    # unpersisted loop recomputes it per round. Caller-owned lifetime.
    e = _persist(edges.select(F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")))
    deg = _persist(
        e.groupBy("__src").agg(F.count("*").cast("double").alias("__deg"))
    )
    ranks = base.withColumn("__r", F.lit(1.0) / F.col("__N"))
    for it in range(iterations):
        contrib = (
            e.join(ranks.select(F.col("__node").alias("__src"), "__r"), "__src")
            .join(deg, "__src")
            .select("__dst", (F.col("__r") / F.col("__deg")).alias("__c"))
        )
        sums = contrib.groupBy("__dst").agg(
            F.sum(F.col("__c").cast(DEC)).cast("double").alias("__in")
        )
        ranks = (
            base.join(sums, base["__node"] == sums["__dst"], "left")
            .select(
                "__node",
                "__N",
                (
                    F.lit(1.0 - damping) / F.col("__N")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("__r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("__node").alias(node_col), F.col("__r").alias("pagerank"))


def sql_pagerank_fixed(
    nodes_cte: str,
    edges_cte: str,
    *,
    iterations: int = 3,
    damping: float = DAMPING,
) -> str:
    """DuckDB oracle: identical rounds unrolled. `nodes_cte` must yield
    column `node`; `edges_cte` columns `src`, `dst`."""
    rounds = []
    prev = "r0"
    for i in range(1, iterations + 1):
        cur = f"r{i}"
        rounds.append(
            f"""{cur} AS (
            SELECT b.node,
                   {1.0 - damping} / b.N + {damping} * COALESCE(s.inm, 0.0) AS r,
                   b.N AS N
            FROM pr_base b LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(SUM(CAST(p.r / d.deg AS DECIMAL(27,6))) AS DOUBLE) AS inm
                FROM pr_edges e
                JOIN {prev} p ON p.node = e.src
                JOIN pr_deg d ON d.src = e.src
                GROUP BY e.dst
            ) s ON s.node = b.node
        )"""
        )
        prev = cur
    rounds_sql = ",\n        ".join(rounds)
    return f"""
        WITH pr_nodes AS ({nodes_cte}),
        pr_edges AS ({edges_cte}),
        pr_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS N FROM pr_nodes),
        pr_base AS (SELECT node, N FROM pr_nodes CROSS JOIN pr_n),
        pr_deg AS (
            SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM pr_edges GROUP BY src
        ),
        r0 AS (SELECT node, 1.0 / N AS r, N FROM pr_base),
        {rounds_sql}
        SELECT node, r AS pagerank FROM {prev}
    """
