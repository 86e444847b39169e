"""Property and known-value pins for the round-7 engine-surface set 2,
the causal/survival stats, and Markov removal attribution — beyond the
cross-engine oracle gate, these check the MATH against independent
Python recomputations and the semantics against first principles."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_multiset_algebra_identity(spark, sf_dir):
    """|A INTERSECT ALL B| + |A EXCEPT ALL B| == |A| row-for-row (the
    defining multiset identity min(m1,m2) + max(m1-m2,0) = m1)."""
    li = load(spark, sf_dir, "lineitem")
    n_a = li.where(F.col("l_discount") >= 0.03).count()
    n_int = _build(spark, sf_dir, "setop_intersect_all").count()
    n_exc = _build(spark, sf_dir, "setop_except_all").count()
    assert n_exc + n_int == n_a
    assert n_int > 0 and n_exc > 0  # both non-degenerate on driver data


def test_locf_matches_python_replay(spark, sf_dir):
    """Gap-filled series equals a per-user Python forward-fill; leading
    NULLs (user starts with an error event) stay NULL."""
    rows = sorted(
        _build(spark, sf_dir, "window_ignore_nulls_locf").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    state: dict[int, float] = {}
    saw_leading_null = False
    for r in rows:
        if r.raw_value is not None:
            state[r.user_id] = r.raw_value
        want = state.get(r.user_id)
        if want is None:
            saw_leading_null = saw_leading_null or r.filled_value is None
            assert r.filled_value is None
        else:
            assert r.filled_value == want
    # the masked-to-NULL rows exist (error events), so the fill did work
    assert any(r.raw_value is None and r.filled_value is not None for r in rows)


def test_schema_evolution_backfills_missing_column(spark, sf_dir):
    rows = _build(spark, sf_dir, "scan_schema_evolution").collect()
    docs_n = load(spark, sf_dir, "documents").count()
    assert len(rows) == docs_n
    for r in rows:
        if r.doc_id % 2 == 0:
            assert r.n_chars is None  # v1 file lacked the column
        else:
            assert r.n_chars is not None


def test_bh_stepup_rejects_a_prefix(spark, sf_dir):
    """BH step-up semantics: the rejected set is exactly ranks
    1..k* — never a gap — and m equals the hypothesis count."""
    rows = sorted(
        _build(spark, sf_dir, "agg_bh_fdr").collect(), key=lambda r: r.bh_rank
    )
    assert [r.bh_rank for r in rows] == list(range(1, len(rows) + 1))
    flags = [r.rejected for r in rows]
    # monotone: once False, stays False
    assert flags == sorted(flags, reverse=True)
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert r.p_num <= r.p_den


def test_roc_auc_matches_python(spark, sf_dir):
    got = _build(spark, sf_dir, "quality_roc_auc").collect()[0]
    docs = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    pos = sorted(d.n_chars for d in docs if d.lang == "en")
    neg = sorted(d.n_chars for d in docs if d.lang != "en")
    import bisect

    num2 = 0
    for s in pos:
        lt = bisect.bisect_left(neg, s)
        eq = bisect.bisect_right(neg, s) - lt
        num2 += 2 * lt + eq
    assert got.auc_num2 == num2
    assert got.auc == pytest.approx(num2 / (2.0 * len(pos) * len(neg)), abs=1e-12)
    assert got.gini == pytest.approx(2.0 * got.auc - 1.0, abs=1e-12)


def test_kaplan_meier_survival_is_the_ordered_product(spark, sf_dir):
    rows = sorted(
        _build(spark, sf_dir, "events_kaplan_meier").collect(),
        key=lambda r: r.day,
    )
    assert rows, "no event days"
    s = 1.0
    prev = 1.0
    for r in rows:
        assert r.n_events > 0 and r.n_risk >= r.n_events
        s = s * (1.0 - r.n_events / r.n_risk)
        assert r.survival == pytest.approx(s, rel=1e-12)
        assert r.survival <= prev + 1e-15  # monotone nonincreasing
        prev = r.survival


def test_did_identity(spark, sf_dir):
    r = _build(spark, sf_dir, "events_did_estimator").collect()[0]
    assert r.did == pytest.approx(
        (r.m_t_post - r.m_t_pre) - (r.m_c_post - r.m_c_pre), abs=1e-12
    )
    assert r.n_t1 > 0 and r.n_t0 > 0 and r.n_c1 > 0 and r.n_c0 > 0


def test_cohens_d_matches_python(spark, sf_dir):
    import statistics

    got = {r.event_type: r for r in _build(spark, sf_dir, "agg_cohens_d").collect()}
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    by_type: dict[str, dict[bool, list[float]]] = {}
    for e in ev:
        wknd = e.ts.isoweekday() in (6, 7)
        by_type.setdefault(e.event_type, {True: [], False: []})[wknd].append(e.value)
    for t, groups in by_type.items():
        w, d = groups[True], groups[False]
        vw, vd = statistics.variance(w), statistics.variance(d)
        pooled = ((len(w) - 1) * vw + (len(d) - 1) * vd) / (len(w) + len(d) - 2)
        want = (statistics.fmean(w) - statistics.fmean(d)) / pooled**0.5
        assert got[t].cohens_d == pytest.approx(want, rel=1e-9)
        assert got[t].n_w == len(w) and got[t].n_d == len(d)


def test_markov_removal_matches_matrix_power(spark, sf_dir):
    """The driver-side fold iteration equals an independent numpy
    L-step absorption computation on the same journey pairs, and the
    removal effects are sane (removing paths can only lower the
    truncated conversion probability)."""
    import numpy as np

    from sql_engine_spark.queries.round7_markov import _L

    got = {r.channel: r for r in _build(spark, sf_dir, "events_markov_removal").collect()}
    assert set(got) == {"click", "error", "signup", "view"}

    # Independent journey extraction in Python
    ev = sorted(
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    pairs: Counter = Counter()
    cur_user, prev, absorbed = None, None, False
    journeys: dict[int, list[str]] = {}
    for r in ev:
        journeys.setdefault(r.user_id, []).append(r.event_type)
    for _, seq in journeys.items():
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
            term = None
        else:
            term = "END"
        prev = "START"
        for t in seq:
            pairs[(prev, t)] += 1
            prev = t
        if term:
            pairs[(prev, term)] += 1

    states = ["START", "click", "error", "signup", "view"]
    row_tot: Counter = Counter()
    for (s, _), c in pairs.items():
        row_tot[s] += c

    def p_conv(removed):
        idx = {s: i for i, s in enumerate(states)}
        T = np.zeros((len(states), len(states)))
        conv = np.zeros(len(states))
        for (s, t), c in pairs.items():
            if s not in idx or (removed and removed in (s, t)):
                continue
            p = c / row_tot[s]
            if t == "purchase":
                conv[idx[s]] += p
            elif t in idx:
                T[idx[s], idx[t]] += p
        v = np.zeros(len(states))
        for _ in range(_L):
            v = conv + T @ v
        return v[idx["START"]]

    base = p_conv(None)
    for c, r in got.items():
        assert r.p_base == pytest.approx(base, rel=1e-9)
        assert r.p_removed == pytest.approx(p_conv(c), rel=1e-9)
        assert -1e-12 <= r.removal_effect <= 1.0
        assert r.p_removed <= r.p_base + 1e-12


def test_hybrid_rrf_score_identity(spark, sf_dir):
    rows = _build(spark, sf_dir, "ann_hybrid_rrf").collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {"q_join", "q_stream", "q_scan"}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        prev = float("inf")
        for r in rs:
            want = (1.0 / (60.0 + r.text_rank) if r.text_rank else 0.0) + (
                1.0 / (60.0 + r.vec_rank) if r.vec_rank else 0.0
            )
            assert r.rrf_score == pytest.approx(want, abs=1e-15)
            assert r.text_rank is not None or r.vec_rank is not None
            assert r.rrf_score <= prev + 1e-15
            prev = r.rrf_score


def test_edit_distance_dedup_pair_count_and_dp(spark, sf_dir):
    """Candidate pairs are exactly the 3-successor neighborhood
    (3n - 6 pairs), and a sample of distances matches an independent
    Python DP."""
    rows = _build(spark, sf_dir, "dedup_edit_distance").collect()
    n = load(spark, sf_dir, "documents").count()
    assert len(rows) == 3 * n - 6

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    texts = {
        r.doc_id: r.text[:120]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for r in rows[:25]:
        assert r.edit_dist == lev(texts[r.id_a], texts[r.id_b])
        assert r.is_near_dup == (r.edit_dist <= 40)


def test_jaccard_linkpred_identities(spark, sf_dir):
    rows = _build(spark, sf_dir, "graph_jaccard_linkpred").collect()
    assert rows
    per_a: dict[int, list] = {}
    for r in rows:
        assert r.common_neighbors >= 2
        assert r.union_size >= r.common_neighbors
        assert r.jaccard == pytest.approx(r.common_neighbors / r.union_size, abs=1e-15)
        assert 0.0 < r.jaccard <= 1.0
        per_a.setdefault(r.a, []).append(r)
    for a, rs in per_a.items():
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= 3


def test_copurchase_projection_shape(spark, sf_dir):
    rows = _build(spark, sf_dir, "graph_copurchase_projection").collect()
    assert len(rows) == 20
    counts = [r.n_coorders for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_coorders >= 1


def test_interleave_sources_round_robin_balance(spark, sf_dir):
    rows = sorted(
        _build(spark, sf_dir, "curation_interleave_sources").collect(),
        key=lambda r: r.position,
    )
    assert [r.position for r in rows] == list(range(1, 101))
    n_sources = (
        load(spark, sf_dir, "documents").select("source").distinct().count()
    )
    # complete rank-groups: if 100 is a multiple of the source count,
    # each source appears exactly 100/n times in the head
    if 100 % n_sources == 0:
        cnt = Counter(r.source for r in rows)
        assert set(cnt.values()) == {100 // n_sources}
    # src_rank nondecreasing along the merged order
    ranks = [r.src_rank for r in rows]
    assert ranks == sorted(ranks)


def test_streaming_minhash_dedup_conservation(spark, sf_dir):
    """Every distinct (band, key) bucket has exactly one owner, so the
    owned-band counts sum to the distinct bucket count; ownership is
    bounded by the band count per doc."""
    from sql_engine_spark.operators.dedup import (
        minhash_signature,
        shingle_digests,
    )
    from sql_engine_spark.operators.textprep import shingles, tokens

    rows = _build(spark, sf_dir, "streaming_minhash_dedup").collect()
    assert all(1 <= r.n_bands_owned <= 4 for r in rows)
    assert all(r.is_fully_novel == (r.n_bands_owned == 4) for r in rows)

    docs = load(spark, sf_dir, "documents")
    sig = (
        docs.select("doc_id", tokens("text").alias("__tokens"))
        .withColumn("__shset", F.array_distinct(shingles("__tokens", 3)))
        .withColumn("__dig", shingle_digests("__shset"))
        .withColumn("__sig", minhash_signature("__dig", 8))
    )
    keys = sig.select(
        F.col("doc_id"),
        *[
            F.md5(F.concat_ws("|", F.slice("__sig", b * 2 + 1, 2))).alias(f"k{b}")
            for b in range(4)
        ],
    )
    n_buckets = (
        keys.select(
            F.explode(
                F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"k{b}").alias("k")) for b in range(4)])
            ).alias("e")
        )
        .select("e.b", "e.k")
        .distinct()
        .count()
    )
    assert sum(r.n_bands_owned for r in rows) == n_buckets


def test_nprobe_sweep_monotone_and_exhaustive(spark, sf_dir):
    rows = {r.nprobe: r for r in _build(spark, sf_dir, "ann_ivf_nprobe_sweep").collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].recall <= rows[2].recall <= rows[4].recall
    # probing all 4 of 4 cells IS brute force: recall must be exactly 1
    assert rows[4].n_hits == rows[4].n_true
    assert rows[4].recall == 1.0


def test_cohort_ltv_conservation(spark, sf_dir):
    from decimal import Decimal

    rows = _build(spark, sf_dir, "events_cohort_ltv").collect()
    assert all(r.age_days >= 0 for r in rows)
    last_by_cohort: dict = {}
    for r in rows:
        cur = last_by_cohort.get(r.cohort_day)
        if cur is None or r.age_days > cur.age_days:
            last_by_cohort[r.cohort_day] = r
    # the final cumulative value equals the cohort's total value
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    totals = {
        r.cohort_day: r.total
        for r in ev.join(firsts, "user_id")
        .groupBy("cohort_day")
        .agg(
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total")
        )
        .collect()
    }
    for cd, r in last_by_cohort.items():
        assert r.cum_value == pytest.approx(totals[cd], rel=1e-12)


def test_funnel_step_time_shrinks(spark, sf_dir):
    rows = {r.step: r for r in _build(spark, sf_dir, "events_funnel_step_time").collect()}
    assert set(rows) == {"view_to_signup", "signup_to_purchase"}
    assert rows["view_to_signup"].n_users >= rows["signup_to_purchase"].n_users
    for r in rows.values():
        assert 0.0 < r.median_gap_s <= r.max_gap_s
        assert 0.0 < r.mean_gap_s <= r.max_gap_s


def test_bitwise_funcs_match_python(spark, sf_dir):
    rows = _build(spark, sf_dir, "scalar_bitwise_funcs").collect()
    assert rows
    for r in rows:
        k = r.o_orderkey
        assert r.k_and == k & 255
        assert r.k_or == k | 4096
        assert r.k_shl == (k & 15) << 3
        assert r.k_shr == k >> 2
        assert r.k_popcnt == bin(k).count("1")


def test_corrupt_records_quarantine_counts(spark, sf_dir):
    rows = {r.bucket: r.n_rows for r in _build(spark, sf_dir, "scan_corrupt_records").collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    n_corrupt = sum(1 for d in docs if d.doc_id % 25 == 0)
    assert rows["__CORRUPT__"] == n_corrupt
    assert sum(rows.values()) == len(docs)
    good = Counter(d.lang for d in docs if d.doc_id % 25 != 0)
    for lang, n in good.items():
        assert rows[lang] == n


def test_dynamic_partition_overwrite_touches_only_target(spark, sf_dir, tmp_path):
    """Direct write-path pin: after a dynamic overwrite of the 'click'
    partition, every other partition's files are byte-identical (same
    names, sizes, mtimes) and clicks carry the corrected values."""
    import os

    ev = load(spark, sf_dir, "events")
    out = str(tmp_path / "dynpart")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    def snapshot(part):
        d = os.path.join(out, f"event_type={part}")
        return {
            f: (os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {p: snapshot(p) for p in ("view", "signup", "error", "purchase")}
    (
        ev.where(F.col("event_type") == "click")
        .withColumn("value", F.col("value") * 2.0)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(out)
    )
    for p in ("view", "signup", "error", "purchase"):
        assert snapshot(p) == before[p]
    got = {
        r.event_type: r.s
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("s"))
        .collect()
    }
    want = {
        r.event_type: r.s
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", F.col("value") * 2.0)
                .otherwise(F.col("value"))
                .cast("decimal(27,6)")
            ).alias("s")
        )
        .collect()
    }
    assert got == want


def test_order_violations_match_python(spark, sf_dir):
    rows = {r.rule: r for r in _build(spark, sf_dir, "events_order_violations").collect()}
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    t_view: dict = {}
    t_purch: dict = {}
    for e in ev:
        if e.event_type == "view":
            t_view[e.user_id] = min(t_view.get(e.user_id, e.ts), e.ts)
        elif e.event_type == "purchase":
            t_purch[e.user_id] = min(t_purch.get(e.user_id, e.ts), e.ts)
    p_checked = p_viol = s_checked = s_viol = 0
    for e in ev:
        if e.event_type == "purchase":
            p_checked += 1
            if e.user_id not in t_view or e.ts < t_view[e.user_id]:
                p_viol += 1
        elif e.event_type == "signup":
            s_checked += 1
            if e.user_id in t_purch and e.ts > t_purch[e.user_id]:
                s_viol += 1
    r1 = rows["purchase_before_any_view"]
    r2 = rows["signup_after_first_purchase"]
    assert (r1.n_checked, r1.n_violations) == (p_checked, p_viol)
    assert (r2.n_checked, r2.n_violations) == (s_checked, s_viol)


def test_hll_error_curve_tightens_with_registers(spark, sf_dir):
    rows = {r.m: r for r in _build(spark, sf_dir, "approx_hll_error_curve").collect()}
    assert set(rows) == {16, 64, 256}
    n_exact = {r.n_exact for r in rows.values()}
    assert len(n_exact) == 1
    for m, r in rows.items():
        assert r.rel_error == pytest.approx(r.estimate / r.n_exact - 1.0, abs=1e-12)
        # raw HLL at these densities: within ~4 theoretical RSEs
        assert abs(r.rel_error) < 4 * 1.04 / m**0.5


def test_ols_matches_numpy(spark, sf_dir):
    import numpy as np

    got = {r.event_type: r for r in _build(spark, sf_dir, "agg_ols_hourly_trend").collect()}
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    by_type: dict = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append((e.ts.hour, e.value))
    for t, pts in by_type.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert got[t].slope == pytest.approx(slope, rel=1e-6)
        assert got[t].intercept == pytest.approx(intercept, rel=1e-6)
        assert got[t].r2 == pytest.approx(r * r, rel=1e-6)


def test_beta_posterior_identities(spark, sf_dir):
    rows = _build(spark, sf_dir, "agg_beta_posterior").collect()
    assert {r.cohort for r in rows} == {0, 1}
    for r in rows:
        assert r.post_alpha == 1 + r.n_conv
        assert r.post_beta == 1 + r.n_users - r.n_conv
        assert r.post_mean == pytest.approx(
            r.post_alpha / (r.post_alpha + r.post_beta), abs=1e-15
        )
        tot = r.post_alpha + r.post_beta
        assert r.post_sd == pytest.approx(
            (r.post_alpha * r.post_beta / (tot * tot * (tot + 1))) ** 0.5, rel=1e-12
        )


def test_cdc_apply_matches_rule_derivation(spark, sf_dir):
    """The merge machinery's final state equals a row-by-row Python
    application of the CDC rules."""
    got = {r.o_orderstatus: (r.n, float(r.sum_price)) for r in _build(spark, sf_dir, "pipeline_cdc_apply").collect()}
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    n = defaultdict(int)
    s = defaultdict(Decimal)
    for o in orders:
        k = o.o_orderkey
        if k % 13 == 0:
            continue
        price = o.o_totalprice * 1.1 if (k % 7 == 0 and k % 10 != 0) else o.o_totalprice
        n[o.o_orderstatus] += 1
        s[o.o_orderstatus] += Decimal(round(price * 10**6)) / 10**6
    for st in n:
        assert got[st][0] == n[st]
        assert got[st][1] == pytest.approx(float(s[st]), rel=1e-12)
