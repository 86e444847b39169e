"""Round-10 engine-surface batch: NATURAL JOIN / USING parity (the
SQL-92 join shorthands; the reference planner only binds explicit ON
expressions, /root/reference/src/planner/mod.rs:330-378), a date/
INTERVAL arithmetic parity grid (the reference's Caster has no
temporal types at all, /root/reference/src/types/value.rs), and
local-bridge detection over the shared kNN graph (an edge whose
endpoints share NO common neighbor — Granovetter's 'local bridge',
exactly the edges spanning communities; zero marginal cost on top of
the shared triangle relation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# join_natural_using — NATURAL JOIN and USING shorthand parity
# ---------------------------------------------------------------------------


@register(
    "join_natural_using",
    oracle="""
        WITH n AS (
            SELECT n_nationkey AS nationkey, n_name AS nation_name,
                   n_regionkey AS regionkey
            FROM nation
        ),
        r AS (
            SELECT r_regionkey AS regionkey, r_name AS region_name
            FROM region
        ),
        j AS (SELECT * FROM n NATURAL JOIN r),
        c AS (
            SELECT c_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer GROUP BY 1
        )
        SELECT j.nationkey, j.nation_name, j.region_name,
               COALESCE(c.n_customers, CAST(0 AS BIGINT)) AS n_customers
        FROM j LEFT JOIN c USING (nationkey)
    """,
    doc="NATURAL JOIN + USING shorthand parity: nation and region "
    "renamed onto a shared 'regionkey' then joined with NATURAL JOIN "
    "(implicit equi-key discovery by column NAME — one output "
    "regionkey, not two), then customer counts attached with LEFT "
    "JOIN ... USING (nationkey) (coalesced join column per SQL-92). "
    "Both shorthands plan to the same broadcast hash joins as "
    "explicit ON in Spark — the parity claim is that name-based key "
    "binding resolves identically in both engines, including the "
    "USING column's left-coalescing under an outer join. The "
    "reference binds only explicit ON expressions "
    "(planner/mod.rs:330-378).",
)
def join_natural_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("__nat_nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("__nat_region")
    load(spark, sf_dir, "customer").createOrReplaceTempView("__nat_customer")
    return spark.sql(
        """
        WITH n AS (
            SELECT n_nationkey AS nationkey, n_name AS nation_name,
                   n_regionkey AS regionkey
            FROM __nat_nation
        ),
        r AS (
            SELECT r_regionkey AS regionkey, r_name AS region_name
            FROM __nat_region
        ),
        j AS (SELECT * FROM n NATURAL JOIN r),
        c AS (
            SELECT c_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM __nat_customer GROUP BY 1
        )
        SELECT j.nationkey, j.nation_name, j.region_name,
               COALESCE(c.n_customers, CAST(0 AS BIGINT)) AS n_customers
        FROM j LEFT JOIN c USING (nationkey)
        """
    )


# ---------------------------------------------------------------------------
# scalar_interval_arithmetic — date/INTERVAL parity grid
# ---------------------------------------------------------------------------


@register(
    "scalar_interval_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS d,
               CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month,
               CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS plus_90d,
               CAST(o_orderdate - INTERVAL 1 YEAR AS DATE) AS minus_year,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
               CAST(date_diff('day', CAST('1995-01-01' AS DATE),
                    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch0
        FROM orders
        WHERE o_orderkey % 1000 = 0
    """,
    doc="Date/INTERVAL arithmetic parity grid over a deterministic "
    "1/1000 order sample: + INTERVAL 1 MONTH (calendar month "
    "addition with end-of-month clamping — the semantic seam where "
    "engines historically diverge), + 90 days, - 1 year, last_day, "
    "quarter truncation, and day difference from a fixed origin. "
    "All pure date arithmetic — integer-exact, no floats anywhere. "
    "The reference's Caster has no temporal types "
    "(types/value.rs); Spark and DuckDB agree on every cell, "
    "pinned by the oracle hash.",
)
def scalar_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 1000 == 0
    )
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 1).alias("plus_month"),
        F.date_add(d, 90).alias("plus_90d"),
        F.add_months(d, -12).alias("minus_year"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", F.col("o_orderdate"))
        .cast("date")
        .alias("qtr_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch0"),
    )


# ---------------------------------------------------------------------------
# graph_local_bridges — edges in no triangle (Granovetter's local bridges)
# ---------------------------------------------------------------------------


def _bridges_oracle() -> str:
    from sql_engine_spark.operators.graph import (
        sql_knn_shared,
        sql_triangle_corner_counts,
    )

    und = "SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn"
    return f"""
        WITH knn AS ({sql_knn_shared()}),
        {sql_triangle_corner_counts(und)},
        tri_edges AS (
            SELECT DISTINCT least(p.u, p.v) AS a, greatest(p.u, p.v) AS b
            FROM (
                SELECT x AS u, y AS v FROM tri_tri
                UNION ALL SELECT x, z FROM tri_tri
                UNION ALL SELECT y, z FROM tri_tri
            ) p
        )
        SELECT CAST((SELECT COUNT(*) FROM tri_und) AS BIGINT) AS n_edges,
               CAST((SELECT COUNT(*) FROM tri_edges) AS BIGINT)
                   AS n_triangle_edges,
               CAST((SELECT COUNT(*) FROM tri_und u
                     LEFT JOIN tri_edges t ON t.a = u.a AND t.b = u.b
                     WHERE t.a IS NULL) AS BIGINT) AS n_local_bridges,
               CAST((SELECT COUNT(*) FROM tri_und u
                     LEFT JOIN tri_edges t ON t.a = u.a AND t.b = u.b
                     WHERE t.a IS NULL) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM tri_und) AS DOUBLE)
                   AS bridge_frac
    """


@register(
    "graph_local_bridges",
    oracle=_bridges_oracle(),
    doc="Local-bridge census over the shared kNN graph: an undirected "
    "edge is a LOCAL BRIDGE iff its endpoints share no common "
    "neighbor — equivalently, it lies in no triangle (Granovetter "
    "1973; Easley & Kleinberg ch.3). These are precisely the edges "
    "whose removal lengthens paths — the community-spanning links a "
    "dedup/cluster pipeline should NOT contract across. Costs one "
    "anti-join of the undirected edge relation against the pair "
    "projection of the SHARED materialized triangle relation "
    "(operators/graph.triangle_triples_shared — the 5th consumer, "
    "zero extra enumeration; the r8 shared-build template). Output "
    "is the 1-row census: edges, triangle edges, bridges, fraction.",
)
def graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import (
        knn_graph_shared,
        triangle_triples_shared,
        und_edges,
    )

    und = und_edges(knn_graph_shared(spark, sf_dir))
    tri = triangle_triples_shared(spark, sf_dir)
    pairs = (
        tri.select(F.col("x").alias("u"), F.col("y").alias("v"))
        .unionAll(tri.select(F.col("x").alias("u"), F.col("z").alias("v")))
        .unionAll(tri.select(F.col("y").alias("u"), F.col("z").alias("v")))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
    )
    n_edges = und.agg(F.count("*").cast("long").alias("n_edges"))
    n_tri = pairs.agg(F.count("*").cast("long").alias("n_triangle_edges"))
    n_bridge = (
        und.join(pairs, ["a", "b"], "left_anti")
        .agg(F.count("*").cast("long").alias("n_local_bridges"))
    )
    return (
        n_edges.crossJoin(n_tri)
        .crossJoin(n_bridge)
        .select(
            "n_edges",
            "n_triangle_edges",
            "n_local_bridges",
            (
                F.col("n_local_bridges").cast("double")
                / F.col("n_edges").cast("double")
            ).alias("bridge_frac"),
        )
    )
