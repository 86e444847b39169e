"""Round-7 pipeline set 2: streaming MinHash-LSH dedup (the live-ingest
near-dup gate), an IVF nprobe sweep (recall-vs-probe-budget tuning
table), cohort LTV curves, funnel step-latency medians, and bitwise
scalar surface — closing the loop between the batch dedup/ANN
pipelines and their streaming/tuning counterparts.

Scale/determinism posture follows the house rules: corpus ranks go
through the bucketed two-level machinery, double sums through DECIMAL,
durations through exact integer microseconds, streaming state is keyed
and sharded (one row per band bucket), and the sweep reuses ONE index
build per probe budget — the audit reads the index, it never rebuilds
the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.queries.extras import _exact_double
from sql_engine_spark.operators.dedup import (
    _persist,
    minhash_signature,
    shingle_digests,
)
from sql_engine_spark.operators.textprep import shingles, sql_shingles, sql_tokens, tokens
from sql_engine_spark.queries.round5_events import (
    _median_from_sorted,
    _ranked_group_median,
)
from sql_engine_spark.registry import register

_SMH_K = 3  # shingle size
_SMH_HASHES = 8
_SMH_BANDS = 4


def _smh_buckets_sql() -> str:
    r = _SMH_HASHES // _SMH_BANDS
    width = 32 // _SMH_HASHES
    toks = sql_tokens("text")
    return f"""
        smh_docs AS (
            SELECT doc_id AS id, {sql_shingles(toks, _SMH_K)} AS sh
            FROM documents
        ),
        smh_digs AS (
            SELECT id, list_transform(list_distinct(sh), s -> md5(s)) AS dig
            FROM smh_docs
        ),
        smh_sigs AS (
            SELECT id,
                   list_transform(range(0, {_SMH_HASHES}), j ->
                       list_aggregate(list_transform(dig, h ->
                           substring(h, j * {width} + 1, {width})), 'min')) AS sig
            FROM smh_digs
        ),
        smh_buckets AS (
            SELECT id, b,
                   md5(array_to_string(sig[b*{r}+1 : b*{r}+{r}], '|')) AS key
            FROM smh_sigs CROSS JOIN range(0, {_SMH_BANDS}) t(b)
        )
    """


@register(
    "streaming_minhash_dedup",
    oracle=f"""
        WITH {_smh_buckets_sql()},
        owners AS (
            SELECT b, key, MIN(id) AS owner
            FROM smh_buckets GROUP BY b, key
        )
        SELECT owner AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bands_owned,
               COUNT(*) = {_SMH_BANDS} AS is_fully_novel
        FROM owners GROUP BY owner
    """,
    doc="Streaming MinHash-LSH near-dup gate: documents arrive in "
    "micro-batches, each computes its 8-lane one-permutation minhash "
    "signature and 4 LSH band keys (the EXACT pipeline of "
    "dedup_minhash_lsh), and a stateful MIN(doc_id) aggregation per "
    "(band, key) registers band ownership — an arriving document "
    "that owns NO band collided everywhere with earlier docs (a "
    "near-dup suspect to hold for verify); one that owns all 4 is "
    "novel. This is the live-ingest half of the batch dedup family: "
    "state is one row per DISTINCT band bucket (sharded by key hash, "
    "watermark-evictable in production), per-batch work is the "
    "linear signature map — no joins against the history corpus "
    "ever. Under the time-ordered replay min == first arrival, so "
    "this is the batch min-doc_id band-ownership relation; min being "
    "order-insensitive (unlike a first-wins dropDuplicates) also "
    "lets each micro-batch fan its signature map out across cores "
    "instead of inheriting the chunk file's single partition.",
)
def streaming_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: the band-ownership state is maintained by the shared
    # documents replay fleet — per-batch partial MIN(doc_id) per
    # (band, key) merges by MIN, which is exactly the stateful
    # aggregation state the solo stream held (r12 already legalized the
    # order-insensitive MIN spelling), so the drained view is
    # bit-identical to the solo drain for any batch composition. One
    # availableNow replay per (process, dataset, table) instead of one
    # per invocation (drain priced in shared_builds).
    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.fleet import fleet_view

    with _state_partitions(spark):
        res = fleet_view(spark, sf_dir, "streaming_minhash_dedup").read(spark)
    # Per-doc ownership counts over the drained (bounded, one row per
    # distinct band bucket) owners relation — batch post-processing of
    # the stream's stateful result, same as the final select.
    return (
        res.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_bands_owned"))
        .select(
            "doc_id",
            "n_bands_owned",
            (F.col("n_bands_owned") == _SMH_BANDS).alias("is_fully_novel"),
        )
    )


def _smh_partial(b: DataFrame) -> DataFrame:
    rows_per_band = _SMH_HASHES // _SMH_BANDS
    spark = b.sparkSession
    sig = (
        b.select("doc_id", "text")
        # One chunk file = one scan partition; the signature map is
        # the whole per-batch cost, so spread it (r12, guide §2.5
        # input skew) — safe because ownership is an order-
        # insensitive MIN, not arrival-order dropDuplicates.
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", tokens("text").alias("__tokens"))
        .withColumn("__shset", F.array_distinct(shingles("__tokens", _SMH_K)))
        .withColumn("__dig", shingle_digests("__shset"))
        .withColumn("__sig", minhash_signature("__dig", _SMH_HASHES))
    )
    key_cols = [
        F.md5(
            F.concat_ws(
                "|", F.slice("__sig", b_i * rows_per_band + 1, rows_per_band)
            )
        ).alias(f"__k{b_i}")
        for b_i in range(_SMH_BANDS)
    ]
    bands = sig.select(F.col("doc_id"), *key_cols).select(
        "doc_id",
        F.expr(
            f"stack({_SMH_BANDS}, "
            + ", ".join(f"{b_i}, __k{b_i}" for b_i in range(_SMH_BANDS))
            + ") as (band, key)"
        ),
    )
    return bands.groupBy("band", "key").agg(F.min("doc_id").alias("doc_id"))


def _register_smh_fleet_view() -> None:
    from sql_engine_spark.streaming.fleet import register_fleet_view

    register_fleet_view(
        "streaming_minhash_dedup",
        table="documents",
        partial_of=_smh_partial,
        combine=lambda cur, partial: (
            cur.unionByName(partial)
            .groupBy("band", "key")
            .agg(F.min("doc_id").alias("doc_id"))
        ),
    )


_register_smh_fleet_view()


_NPROBES = (1, 2, 4)


def _nprobe_sweep_oracle() -> str:
    from sql_engine_spark.queries.similarity import _BRUTE_ORACLE, _ivf_oracle

    legs = " UNION ALL ".join(
        f"""SELECT {np} AS nprobe,
                   CAST((SELECT COUNT(*) FROM brute) AS BIGINT) AS n_true,
                   CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM brute b JOIN ({_ivf_oracle(4, np, 5)}) i
              ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id"""
        for np in _NPROBES
    )
    return f"""
        WITH brute AS ({_BRUTE_ORACLE})
        SELECT nprobe, n_true, n_hits,
               CAST(n_hits AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall
        FROM ({legs})
    """


@register(
    "ann_ivf_nprobe_sweep",
    oracle=_nprobe_sweep_oracle(),
    doc="IVF nprobe sweep: overall recall@5 (vs the exact brute-force "
    "top-5) at probe budgets 1, 2 and 4 over the SAME 4-centroid "
    "index — the recall-vs-cost tuning table an index owner reads "
    "before picking a probe budget (FAISS tuning practice), extending "
    "the audit family (ann_ivf_recall_report fixed nprobe=2; "
    "dedup_threshold_sweep did the same for the dedup threshold). "
    "Centroid seeding and assignment are deterministic, so the three "
    "legs share the identical index and differ ONLY in probed cells; "
    "recall is monotone in nprobe BY CONSTRUCTION (probed-cell sets "
    "nest), pinned in tests. Hit counting is an id-sized join per "
    "leg; nothing corpus-sized runs more than the documented index "
    "paths.",
)
def ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import brute_force_topk, ivf_topk_sweep

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    brute = _persist(
        brute_force_topk(q, c, id_col="vec_id", vec_col="embedding", k=5).select(
            "query_id", "neighbor_id"
        )
    )
    n_true = brute.count()
    # One shared index evaluation for all three probe budgets (r12,
    # guide §1.2): the solo spelling ran 3 full ivf_topk passes — 3
    # seed collects, 3 corpus scans+assignments, every pair's cosine
    # up to 3x — whose candidate sets nest by construction. The sweep
    # operator ranks every leg in one pipeline; the per-leg hit count
    # is then one groupBy instead of 3 unioned single-row aggregates.
    sweep = ivf_topk_sweep(
        q, c, id_col="vec_id", vec_col="embedding", k=5,
        num_centroids=4, nprobes=_NPROBES,
    )
    hits = (
        brute.join(
            sweep.select("nprobe", "query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("nprobe")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    # Left join from the literal leg list so a (theoretical) zero-hit
    # budget still yields its row with n_hits = 0, exactly like the
    # old per-leg global aggregate did.
    legs_lit = spark.range(1).select(
        F.explode(F.array(*[F.lit(int(p)) for p in _NPROBES])).alias("nprobe")
    )
    return legs_lit.join(hits, "nprobe", "left").select(
        F.col("nprobe").cast("long").alias("nprobe"),
        F.lit(n_true).cast("long").alias("n_true"),
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        (
            F.coalesce("n_hits", F.lit(0).cast("long")).cast("double")
            / F.lit(n_true).cast("double")
        ).alias("recall"),
    )


@register(
    "events_cohort_ltv",
    # NOTE day_value stays DECIMAL through the running-total window and
    # converts to double ONCE via the split cast (_exact_double): a
    # per-cell CAST AS DOUBLE before the window makes the cumulative sum
    # a float reduction, and DuckDB's windowed SUM over doubles is a
    # segment tree (different addition order than Spark's sequential
    # running frame) — observed 6e-12 divergence on the gen_sf.py sf0.1
    # clone (r10), invisible on the driver data by luck.
    oracle=f"""
        WITH firsts AS (
            SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT f.cohort_day,
                   date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                       AS age_days,
                   SUM(CAST(e.value AS DECIMAL(27,6))) AS day_value
            FROM events e JOIN firsts f ON e.user_id = f.user_id
            GROUP BY 1, 2
        ),
        sizes AS (
            SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_users
            FROM firsts GROUP BY cohort_day
        ),
        cum AS (
            SELECT c.cohort_day, c.age_days, s.cohort_users,
                   SUM(c.day_value) OVER (
                       PARTITION BY c.cohort_day ORDER BY c.age_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_dec
            FROM cells c JOIN sizes s ON c.cohort_day = s.cohort_day
        )
        SELECT cohort_day, age_days, cohort_users,
               {_exact_double('cum_dec')} AS cum_value
        FROM cum
    """,
    doc="Cohort lifetime-value curve: users grouped by first-seen day, "
    "cumulative event value by cohort age — the LTV table under every "
    "payback-period decision. The corpus pass is ONE grouped "
    "aggregate to (cohort, age) day-cells with the DECIMAL-detour "
    "sum; the running total is a window over the BOUNDED cell "
    "relation (cohorts x horizon days, never event-sized) summing "
    "DECIMALs — exact, order-independent, no float accumulation "
    "drift — cast to double once at the end. Cohort sizes join from "
    "the user-relation aggregate.",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    cells = (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "age_days"
            ),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(27,6)")).alias("day_value")
        )
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # day_value stays DECIMAL through the window (exact running total,
    # matching the oracle's split-cast finish) — see the register() note.
    return (
        cells.join(sizes, "cohort_day")
        .withColumn("cum_dec", F.sum("day_value").over(w))
        .select(
            "cohort_day",
            "age_days",
            "cohort_users",
            (
                (F.col("cum_dec") - (F.col("cum_dec") % 1))
                .cast("decimal(27,0)")
                .cast("double")
                + (F.col("cum_dec") % 1).cast("double")
            ).alias("cum_value"),
        )
    )


@register(
    "events_funnel_step_time",
    oracle=f"""
        WITH v1 AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s1 AS (
            SELECT e.user_id, MIN(e.ts) AS t_signup
            FROM events e JOIN v1 ON e.user_id = v1.user_id
            WHERE e.event_type = 'signup' AND e.ts > v1.t_view
            GROUP BY e.user_id
        ),
        p1 AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s1.t_signup
            GROUP BY e.user_id
        ),
        gaps AS (
            SELECT 'view_to_signup' AS step, v1.user_id,
                   CAST(epoch_us(s1.t_signup) - epoch_us(v1.t_view)
                        AS DOUBLE) / 1000000.0 AS gap_s
            FROM v1 JOIN s1 ON v1.user_id = s1.user_id
            UNION ALL
            SELECT 'signup_to_purchase', s1.user_id,
                   CAST(epoch_us(p1.t_purchase) - epoch_us(s1.t_signup)
                        AS DOUBLE) / 1000000.0
            FROM s1 JOIN p1 ON s1.user_id = p1.user_id
        ),
        agg AS (
            SELECT step,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   {_median_from_sorted("list_sort(list(gap_s))", False)}
                       AS median_gap_s,
                   {sql_dsum('gap_s')} AS sum_gap,
                   MAX(gap_s) AS max_gap_s
            FROM gaps GROUP BY step
        )
        SELECT step, n_users, median_gap_s,
               CAST(sum_gap AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_gap_s,
               max_gap_s
        FROM agg
    """,
    doc="Funnel step latency: median/mean/max seconds between the "
    "ordered funnel milestones (first view -> first subsequent signup "
    "-> first subsequent purchase, per user) — the latency companion "
    "to events_user_funnel's conversion counts and "
    "events_time_to_convert's single-step view. Durations are exact "
    "integer microseconds divided once; the per-step exact median "
    "runs through the bucketed rank + rank-target machinery "
    "(_ranked_group_median — no per-step value list on the Spark "
    "side); means are DECIMAL-detour sums over exact per-user gaps. "
    "Milestone extraction is three grouped MIN passes with "
    "monotonically shrinking user relations.",
)
def events_funnel_step_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    # v1/s1 each feed the next milestone AND a gaps leg; persisting them
    # was TRIED in r13 and measured ~75% SLOWER at sf0.1 (4.3s vs 2.4s
    # adjacent runs): runtime exchange reuse already dedupes the
    # identical grouped-MIN subtrees here, and the persists serialize
    # the pipeline behind two cache-materialization barriers. Reverted;
    # the downstream `gaps` persist (below) is the load-bearing one.
    v1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(micros).alias("t_view"))
    )
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", micros.alias("tm"))
        .join(v1, "user_id")
        .where(F.col("tm") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("tm").alias("t_signup"))
    )
    p1 = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", micros.alias("tm"))
        .join(s1, "user_id")
        .where(F.col("tm") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("tm").alias("t_purchase"))
    )
    gaps = _persist(
        v1.join(s1, "user_id")
        .select(
            F.lit("view_to_signup").alias("step"),
            "user_id",
            ((F.col("t_signup") - F.col("t_view")).cast("double") / 1e6).alias(
                "gap_s"
            ),
        )
        .unionByName(
            s1.join(p1, "user_id").select(
                F.lit("signup_to_purchase").alias("step"),
                "user_id",
                (
                    (F.col("t_purchase") - F.col("t_signup")).cast("double") / 1e6
                ).alias("gap_s"),
            )
        )
    )
    med = _ranked_group_median(
        gaps,
        group_col="step",
        value_col="gap_s",
        tie_col="user_id",
        n_rows=gaps.count(),
        out_col="median_gap_s",
    )
    agg = gaps.groupBy("step").agg(
        F.count("*").cast("long").alias("n_users"),
        dsum(F.col("gap_s")).alias("sum_gap"),
        F.max("gap_s").alias("max_gap_s"),
    )
    return agg.join(med, "step").select(
        "step",
        "n_users",
        "median_gap_s",
        (F.col("sum_gap").cast("double") / F.col("n_users").cast("double")).alias(
            "mean_gap_s"
        ),
        "max_gap_s",
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT) AS k_and,
               CAST(o_orderkey | 4096 AS BIGINT) AS k_or,
               CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS k_xor,
               CAST((o_orderkey & 15) << 3 AS BIGINT) AS k_shl,
               CAST(o_orderkey >> 2 AS BIGINT) AS k_shr,
               CAST(bit_count(o_orderkey) AS BIGINT) AS k_popcnt
        FROM orders
        WHERE o_orderkey < 500
    """,
    doc="Bitwise scalar surface: AND/OR/XOR, shifts, popcount over "
    "integer keys — the ops under every hash-partitioner, bitmap "
    "index, bloom position and feature hasher in this repo, pinned "
    "here as first-class scalars. Engine seam: Spark spells xor as "
    "the ^ operator and shifts as shiftleft/shiftright functions; "
    "DuckDB spells xor() as a function and shifts as << >> operators "
    "(its ^ is exponentiation — the trap this operator documents). "
    "All exact integers; row-local, zero shuffles.",
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return od.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").cast("long").alias("k_and"),
        F.expr("o_orderkey | 4096").cast("long").alias("k_or"),
        F.expr("o_orderkey ^ o_custkey").cast("long").alias("k_xor"),
        F.expr("shiftleft(o_orderkey & 15, 3)").cast("long").alias("k_shl"),
        F.expr("shiftright(o_orderkey, 2)").cast("long").alias("k_shr"),
        F.expr("bit_count(o_orderkey)").cast("long").alias("k_popcnt"),
    )
