"""Round-7 data-quality constraint suite (Deequ-style; Schelter et al.,
VLDB 2018, "Automating Large-Scale Data Quality Verification"): the five
reports a production ingest runs on every batch — completeness, key
uniqueness, referential integrity, value-domain constraints, and
freshness — each emitted as long-format report rows so a scheduler can
diff them run-over-run and alert on drift.

Scale posture: every report is one aggregate pass per audited table
(conditional counters, map-side combinable) or one key-distinct left
join per FK edge; report cardinality is O(columns + rules + edges),
never O(rows). All counters are exact integers, so the reports hash
bit-identically cross-engine; the only doubles are final ratios of
those integers (deterministic single divisions). Rules are picked so
the suite demonstrates BOTH outcomes on the driver data: some pass
clean (RI, positivity) and some trip (tax bound, status enum, value
cap) — a report that can only say "pass" is untested wiring.

The reference engine has no audit surface (its planner rejects
everything beyond single-SELECT, /root/reference/src/planner/mod.rs:202-207);
this suite is part of the beyond-reference pipeline layer the build
plan calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register


def _miss_str(c: str) -> F.Column:
    col = F.col(c)
    return F.when(col.isNull() | (F.trim(col) == ""), 1).otherwise(0)


def _sql_miss_str(c: str) -> str:
    return f"SUM(CASE WHEN {c} IS NULL OR trim({c}) = '' THEN 1 ELSE 0 END)"


@register(
    "quality_completeness_report",
    oracle=f"""
        WITH d AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST({_sql_miss_str('text')} AS BIGINT) AS m_text,
                   CAST({_sql_miss_str('lang')} AS BIGINT) AS m_lang,
                   CAST({_sql_miss_str('source')} AS BIGINT) AS m_source
            FROM documents
        ),
        e AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS m_value,
                   CAST({_sql_miss_str('props')} AS BIGINT) AS m_props,
                   CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS m_user
            FROM events
        ),
        long AS (
            SELECT 'documents' AS table_name, 'text' AS column_name,
                   n_rows, m_text AS n_missing FROM d
            UNION ALL
            SELECT 'documents', 'lang', n_rows, m_lang FROM d
            UNION ALL
            SELECT 'documents', 'source', n_rows, m_source FROM d
            UNION ALL
            SELECT 'events', 'value', n_rows, m_value FROM e
            UNION ALL
            SELECT 'events', 'props', n_rows, m_props FROM e
            UNION ALL
            SELECT 'events', 'user_id', n_rows, m_user FROM e
        )
        SELECT table_name, column_name, n_rows, n_missing,
               1.0 - CAST(n_missing AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   AS completeness
        FROM long
    """,
    doc="Per-column completeness report over documents and events "
    "(missing = NULL, or NULL/blank for strings) — Deequ's "
    "Completeness constraint in long format. ONE conditional-counter "
    "aggregate pass per table (map-side combinable; the UNION branches "
    "read the 1-row aggregate, not the table), O(columns) output "
    "rows; ratios are single divisions of exact integers so the "
    "report hashes.",
)
def quality_completeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(_miss_str("text")).cast("long").alias("m_text"),
            F.sum(_miss_str("lang")).cast("long").alias("m_lang"),
            F.sum(_miss_str("source")).cast("long").alias("m_source"),
        )
        .select(
            F.lit("documents").alias("table_name"),
            F.expr(
                "stack(3, 'text', m_text, 'lang', m_lang, "
                "'source', m_source) AS (column_name, n_missing)"
            ),
            F.col("n_rows"),
        )
    )
    e = (
        load(spark, sf_dir, "events")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("m_value"),
            F.sum(_miss_str("props")).cast("long").alias("m_props"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("m_user"),
        )
        .select(
            F.lit("events").alias("table_name"),
            F.expr(
                "stack(3, 'value', m_value, 'props', m_props, "
                "'user_id', m_user) AS (column_name, n_missing)"
            ),
            F.col("n_rows"),
        )
    )
    return d.unionByName(e).select(
        "table_name",
        "column_name",
        "n_rows",
        "n_missing",
        (
            F.lit(1.0)
            - F.col("n_missing").cast("double") / F.col("n_rows").cast("double")
        ).alias("completeness"),
    )


_UNIQ_KEYS = [
    ("documents", "doc_id", ["doc_id"]),
    ("events", "event_id", ["event_id"]),
    ("orders", "o_orderkey", ["o_orderkey"]),
    ("lineitem", "l_orderkey,l_linenumber", ["l_orderkey", "l_linenumber"]),
    ("customer", "c_custkey", ["c_custkey"]),
]


def _sql_uniq(table: str, key_name: str, cols: list[str]) -> str:
    key_list = ", ".join(cols)
    return f"""
            SELECT '{table}' AS table_name, '{key_name}' AS key_name,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_keys,
                   CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                       AS n_dup_rows
            FROM (SELECT {key_list}, COUNT(*) AS c
                  FROM {table} GROUP BY {key_list})"""


@register(
    "quality_uniqueness_report",
    oracle=f"""
        WITH long AS (
            {" UNION ALL ".join(_sql_uniq(t, k, c) for t, k, c in _UNIQ_KEYS)}
        )
        SELECT table_name, key_name, n_rows, n_keys, n_dup_keys, n_dup_rows,
               CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE) AS uniqueness
        FROM long
    """,
    doc="Candidate-key uniqueness report (Deequ's Uniqueness) for the "
    "five primary keys, including the composite "
    "(l_orderkey, l_linenumber): per key, total rows, distinct keys, "
    "duplicated-key count and the rows they cover. On the driver data "
    "the composite lineitem key genuinely fails (the generator reuses "
    "line numbers; ~77% uniqueness), so the report demonstrates a real "
    "duplicate finding alongside the four clean keys. Spelled as a "
    "grouped count per key then a counter aggregate over the group "
    "relation — the groupBy is the one shuffle per table and is "
    "map-side combinable; no COUNT(DISTINCT struct) engine seam.",
)
def quality_uniqueness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for table, key_name, cols in _UNIQ_KEYS:
        g = load(spark, sf_dir, table).groupBy(*cols).agg(
            F.count("*").alias("c")
        )
        parts.append(
            g.agg(
                F.sum("c").cast("long").alias("n_rows"),
                F.count("*").cast("long").alias("n_keys"),
                F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_dup_keys"),
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                .cast("long")
                .alias("n_dup_rows"),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(key_name).alias("key_name"),
                "n_rows",
                "n_keys",
                "n_dup_keys",
                "n_dup_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "uniqueness",
        F.col("n_keys").cast("double") / F.col("n_rows").cast("double"),
    )


_RI_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
]


def _sql_ri(child: str, fk: str, parent: str, pk: str) -> str:
    rel = f"{child}.{fk}->{parent}.{pk}"
    return f"""
            SELECT '{rel}' AS relationship,
                   CAST(COUNT(*) AS BIGINT) AS n_child,
                   CAST(SUM(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_fk,
                   CAST(SUM(CASE WHEN c.{fk} IS NOT NULL AND p.__pk IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM {child} c
            LEFT JOIN (SELECT DISTINCT {pk} AS __pk FROM {parent}) p
                   ON c.{fk} = p.__pk"""


@register(
    "quality_referential_integrity",
    oracle=f"""
        WITH long AS (
            {" UNION ALL ".join(_sql_ri(*e) for e in _RI_EDGES)}
        )
        SELECT relationship, n_child, n_null_fk, n_orphans,
               CAST(n_orphans AS DOUBLE)
                   / CAST(n_child - n_null_fk AS DOUBLE) AS orphan_rate
        FROM long
    """,
    doc="Referential-integrity report over the five FK edges of the "
    "schema: per edge, child rows, NULL foreign keys (not violations "
    "under SQL RI semantics — counted separately), and orphans "
    "(non-NULL FK with no parent). Each edge is one left join against "
    "the key-distinct parent projection + a counter aggregate — "
    "Catalyst broadcasts the small parents (nation/supplier/part at "
    "their real cardinalities) and AQE handles the orders-sized ones; "
    "output is O(edges).",
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for child, fk, parent, pk in _RI_EDGES:
        keys = (
            load(spark, sf_dir, parent)
            .select(F.col(pk).alias("__pk"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        j = load(spark, sf_dir, child).select(F.col(fk).alias("__fk")).join(
            keys, F.col("__fk") == F.col("__pk"), "left"
        )
        parts.append(
            j.agg(
                F.count("*").cast("long").alias("n_child"),
                F.sum(F.when(F.col("__fk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_fk"),
                F.sum(
                    F.when(
                        F.col("__fk").isNotNull() & F.col("__hit").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
            ).select(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("relationship"),
                "n_child",
                "n_null_fk",
                "n_orphans",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "orphan_rate",
        F.col("n_orphans").cast("double")
        / (F.col("n_child") - F.col("n_null_fk")).cast("double"),
    )


# (table, rule_name, SQL violation predicate — identical text in both
# engines; NULL predicate counts as non-violation via CASE ELSE 0.)
_RULES = {
    "lineitem": [
        ("quantity_in_1_50", "NOT (l_quantity >= 1 AND l_quantity <= 50)"),
        ("tax_le_0.05", "l_tax > 0.05"),
        ("price_positive", "l_extendedprice <= 0"),
    ],
    "orders": [
        ("status_in_F_O", "o_orderstatus NOT IN ('F', 'O')"),
        ("totalprice_positive", "o_totalprice <= 0"),
    ],
    "events": [
        ("value_in_0_100", "value < 0 OR value > 100"),
    ],
    "documents": [
        ("n_chars_matches_text", "n_chars <> length(text)"),
    ],
}


def _sql_rules(table: str) -> tuple[str, str]:
    counters = ",\n                   ".join(
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS v{i}"
        for i, (_, pred) in enumerate(_RULES[table])
    )
    branches = " UNION ALL ".join(
        f"SELECT '{table}' AS table_name, '{name}' AS rule_name, "
        f"n_rows, v{i} AS n_violations FROM a_{table}"
        for i, (name, _) in enumerate(_RULES[table])
    )
    return (
        f"a_{table} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"{counters} FROM {table})",
        branches,
    )


_RULE_CTES = [_sql_rules(t) for t in _RULES]


@register(
    "quality_constraint_violations",
    oracle=f"""
        WITH {", ".join(c for c, _ in _RULE_CTES)},
        long AS ({" UNION ALL ".join(b for _, b in _RULE_CTES)})
        SELECT table_name, rule_name, n_rows, n_violations,
               CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   AS violation_rate
        FROM long
    """,
    doc="Value-domain constraint report (Deequ's Compliance): seven "
    "rules over four tables — range checks, enum membership, "
    "positivity, and the n_chars==length(text) consistency invariant "
    "— each a conditional counter in ONE aggregate pass per table "
    "(the rule predicates share the scan; violation rows are counted, "
    "never materialized). The driver data trips tax_le_0.05, "
    "status_in_F_O, and value_in_0_100 and passes the rest, so both "
    "report outcomes are exercised. NULLs are non-violations (CASE "
    "ELSE 0), matching SQL constraint semantics.",
)
def quality_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for table, rules in _RULES.items():
        agg = load(spark, sf_dir, table).agg(
            F.count("*").cast("long").alias("n_rows"),
            *[
                F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
                .cast("long")
                .alias(f"v{i}")
                for i, (_, pred) in enumerate(rules)
            ],
        )
        stack_args = ", ".join(
            f"'{name}', v{i}" for i, (name, _) in enumerate(rules)
        )
        parts.append(
            agg.select(
                F.lit(table).alias("table_name"),
                F.expr(
                    f"stack({len(rules)}, {stack_args}) "
                    "AS (rule_name, n_violations)"
                ),
                F.col("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "table_name",
        "rule_name",
        "n_rows",
        "n_violations",
        (
            F.col("n_violations").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("violation_rate"),
    )


_HOUR_US = 3_600_000_000
_WEEK_US = 604_800_000_000


@register(
    "quality_freshness_report",
    oracle=f"""
        WITH wm AS (SELECT MAX(epoch_us(ts)) AS g_us FROM events)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(ts) AS max_ts,
               CAST((g.g_us - MAX(epoch_us(ts))) // {_HOUR_US} AS BIGINT)
                   AS lag_hours,
               CAST(SUM(CASE WHEN epoch_us(ts) >= g.g_us - {_WEEK_US}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_last_7d,
               CAST(CASE WHEN (g.g_us - MAX(epoch_us(ts))) // {_HOUR_US} >= 24
                    THEN 1 ELSE 0 END AS BIGINT) AS stale_flag
        FROM events CROSS JOIN wm g
        GROUP BY event_type, g.g_us
    """,
    doc="Per-event-type freshness report against the batch watermark "
    "(global max timestamp): staleness lag in whole hours (exact "
    "integer microsecond arithmetic, epoch_us/unix_micros both "
    "engines, // = Spark div), last-7-day volume, and a >=24h stale "
    "flag — Deequ's freshness check generalized per type. One "
    "broadcast of the 1-row watermark + one grouped counter pass; "
    "output is O(event types).",
)
def quality_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    glob = ev.agg(F.max(us).alias("g_us"))
    lag_h = F.expr(f"(g_us - max_us) div {_HOUR_US}")
    return (
        ev.select("event_type", "ts", us.alias("us"))
        .crossJoin(F.broadcast(glob))
        .groupBy("event_type", "g_us")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("ts").alias("max_ts"),
            F.max("us").alias("max_us"),
            F.sum(
                F.when(F.col("us") >= F.col("g_us") - F.lit(_WEEK_US), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_last_7d"),
        )
        .select(
            "event_type",
            "n_events",
            "max_ts",
            lag_h.cast("long").alias("lag_hours"),
            "n_last_7d",
            F.when(lag_h >= 24, 1).otherwise(0).cast("long").alias("stale_flag"),
        )
    )
