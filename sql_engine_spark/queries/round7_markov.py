"""Round-7 Markov-chain channel attribution: first-order journey model
with removal effects (Anderl et al. 2016, "Mapping the customer
journey") — the data-driven attribution standard that replaces
heuristic first/last-touch credit (events_attribution_first_touch)
with each channel's causal-ish contribution: how much does the
chain's conversion probability drop if the channel is removed?

Model: states = START + the four non-purchase event types; 'purchase'
absorbs as conversion, journey end without purchase absorbs as loss.
Transition probabilities come from per-user event journeys truncated
at the first purchase. Conversion probability is the L-step truncated
absorption probability v_L(START), computed by L value-iteration
steps v_{k+1}(s) = sum_t p(s,t) * v_k(t) with v(purchase) pinned to
1 — the standard practical truncation (exact absorption needs a
matrix inverse; at L=7 the residual mass is the documented remainder
and BOTH engines compute the identical truncated quantity). Removal
of channel c reroutes every transition into c to loss (drop its
terms), per the removal-effect definition.

Determinism: the per-state sum over successor terms is an ORDERED
LEFT-FOLD (terms sorted by successor state; the driver-side Python
loop vs DuckDB list_reduce over a list(... ORDER BY dst) — identical
IEEE add sequence); transition probabilities are single divisions of
exact counts; the removal effect is one subtract + one divide. No
libm.

Scale: the corpus-sized work is ONE windowed journey pass + one pair
count. The transition matrix is O(states^2) ~ 30 rows; it returns to
the driver (the kmeans-literal discipline — collecting a model-sized
relation, never corpus rows) and the 5 x 7-step value iteration runs
there: running it as 35 relational joins was measured at ~200 Spark
stages of pure scheduling overhead on 30-row inputs, the wrong trade
at ANY scale. The oracle still runs the full iteration relationally
(generated CTEs), so the algebra is independently exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

_CHANNELS = ("click", "error", "signup", "view")
_L = 7


def _mat_sql() -> str:
    return """
        seqd AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS seq
            FROM events
        ),
        fp AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'purchase' THEN seq END) AS pseq,
                   MAX(seq) AS maxseq
            FROM seqd GROUP BY user_id
        ),
        J AS (
            SELECT s.user_id, s.event_type, s.seq, f.pseq, f.maxseq
            FROM seqd s JOIN fp f ON s.user_id = f.user_id
            WHERE f.pseq IS NULL OR s.seq <= f.pseq
        ),
        pairs AS (
            SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
                                                  ORDER BY seq),
                            'START') AS src,
                   event_type AS dst
            FROM J
            UNION ALL
            SELECT event_type AS src, 'END' AS dst
            FROM J WHERE pseq IS NULL AND seq = maxseq
        ),
        cnts AS (
            SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM pairs GROUP BY src, dst
        ),
        mat AS (
            SELECT src, dst, cnt,
                   CAST(cnt AS DOUBLE)
                   / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE) AS p
            FROM cnts
        )
    """


def _variant_sql(tag: str, removed: str | None) -> str:
    """CTE chain v_{tag}_0 .. v_{tag}_L for one removal variant."""
    excl = (
        f"AND m.dst <> '{removed}' AND m.src <> '{removed}'" if removed else ""
    )
    out = [
        f"v_{tag}_0 AS (SELECT 'purchase' AS t, CAST(1.0 AS DOUBLE) AS val)"
    ]
    for k in range(1, _L + 1):
        out.append(f"""v_{tag}_{k} AS (
            SELECT m.src AS t,
                   list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                                    list(m.p * v.val ORDER BY m.dst)),
                       (a, b) -> a + b) AS val
            FROM mat m JOIN v_{tag}_{k - 1} v ON m.dst = v.t
            WHERE 1 = 1 {excl}
            GROUP BY m.src
            UNION ALL SELECT 'purchase', CAST(1.0 AS DOUBLE)
        )""")
    return ",\n        ".join(out)


def _markov_oracle() -> str:
    variants = [_variant_sql("base", None)] + [
        _variant_sql(c, c) for c in _CHANNELS
    ]
    rows = " UNION ALL ".join(
        f"""SELECT '{c}' AS channel,
                   b.val AS p_base, r.val AS p_removed,
                   (b.val - r.val) / b.val AS removal_effect
            FROM (SELECT val FROM v_base_{_L} WHERE t = 'START') b
            CROSS JOIN (SELECT val FROM v_{c}_{_L} WHERE t = 'START') r"""
        for c in _CHANNELS
    )
    return f"""
        WITH {_mat_sql()},
        {",        ".join(variants)}
        SELECT * FROM ({rows})
    """


def _build_mat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = ev.select(
        "user_id", "event_type", F.row_number().over(w_seq).alias("seq")
    )
    fp = seqd.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("seq"))
        ).alias("pseq"),
        F.max("seq").alias("maxseq"),
    )
    j = seqd.join(fp, "user_id").where(
        F.col("pseq").isNull() | (F.col("seq") <= F.col("pseq"))
    )
    w_lag = Window.partitionBy("user_id").orderBy("seq")
    pairs = j.select(
        F.coalesce(F.lag("event_type").over(w_lag), F.lit("START")).alias("src"),
        F.col("event_type").alias("dst"),
    ).unionByName(
        j.where(F.col("pseq").isNull() & (F.col("seq") == F.col("maxseq"))).select(
            F.col("event_type").alias("src"), F.lit("END").alias("dst")
        )
    )
    cnts = pairs.groupBy("src", "dst").agg(F.count("*").cast("long").alias("cnt"))
    w_src = Window.partitionBy("src")
    return cnts.select(
        "src",
        "dst",
        "cnt",
        (
            F.col("cnt").cast("double") / F.sum("cnt").over(w_src).cast("double")
        ).alias("p"),
    )


def _iterate_local(
    mat: list[tuple[str, str, float]], removed: str | None
) -> float:
    """L-step value iteration over the collected model-sized matrix,
    replicating the oracle's fold order exactly: per state, terms
    sorted by successor, left-fold add from 0.0, each term one IEEE
    multiply p * v[dst] — the identical float-op sequence DuckDB's
    list_reduce(list_prepend(0.0, list(p*val ORDER BY dst))) runs, so
    the two independent implementations agree bit-for-bit."""
    m = [
        (src, dst, p)
        for src, dst, p in mat
        if removed is None or (src != removed and dst != removed)
    ]
    v = {"purchase": 1.0}
    for _ in range(_L):
        nxt: dict[str, float] = {}
        by_src: dict[str, list[tuple[str, float]]] = {}
        for src, dst, p in m:
            if dst in v:
                by_src.setdefault(src, []).append((dst, p * v[dst]))
        for src, terms in by_src.items():
            acc = 0.0
            for _, term in sorted(terms):
                acc = acc + term
            nxt[src] = acc
        nxt["purchase"] = 1.0
        v = nxt
    return v.get("START", 0.0)


@register(
    "events_markov_removal",
    oracle=_markov_oracle(),
    doc="Markov removal-effect attribution (see module docstring): "
    "per channel, the L=7-step truncated conversion probability from "
    "START with and without the channel, and the removal effect "
    "(p_base - p_removed) / p_base. Journeys truncate at first "
    "purchase; journey ends absorb as loss. The corpus-sized Spark "
    "work is the journey window pass + the pair count; the resulting "
    "~30-row transition matrix returns to the driver (the "
    "kmeans-literal discipline) and the 5 x 7-step value iteration "
    "runs there with the oracle's exact fold order (terms sorted by "
    "successor, left-fold from 0.0) — while the oracle unrolls the "
    "SAME iteration as generated relational CTEs in DuckDB, an "
    "INDEPENDENT implementation of the algebra, so agreement is a "
    "genuine two-sided check and every double hashes bit-exactly.",
)
def events_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    mat_rows = [
        (r.src, r.dst, r.p) for r in _build_mat(spark, sf_dir).collect()
    ]
    p_base = _iterate_local(mat_rows, None)
    rows = []
    for c in _CHANNELS:
        p_rem = _iterate_local(mat_rows, c)
        rows.append((c, p_base, p_rem, (p_base - p_rem) / p_base))
    return spark.createDataFrame(
        rows,
        "channel string, p_base double, p_removed double, "
        "removal_effect double",
    )
