"""Round-8 operator pins: every new statistic recomputed independently
in pure Python from the raw parquet rows (the house pattern — the
DuckDB oracle already cross-checks engine spelling; these pin the MATH
against a third, windowless implementation)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pytest

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _daily_counts(spark, sf_dir, types=None):
    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    per_day = Counter()
    for r in ev:
        if types is None or r.event_type in types:
            per_day[r.ts.date()] += 1
    return [c for _, c in sorted(per_day.items())]


def test_kruskal_wallis_matches_python(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .collect()
    )
    sample = [
        (r.value, r.event_id, r.event_type)
        for r in rows
        if r.event_type in ("click", "purchase", "error")
    ]
    sample.sort()
    rsum = Counter()
    n = Counter()
    for rk, (_, _, et) in enumerate(sample, start=1):
        rsum[et] += rk
        n[et] += 1
    N = len(sample)
    want_h = (
        12.0
        / (N * (N + 1))
        * sum(rsum[g] ** 2 / n[g] for g in ("click", "purchase", "error"))
        - 3.0 * (N + 1)
    )
    got = _build(spark, sf_dir, "agg_kruskal_wallis").collect()[0]
    assert got.n_total == N
    assert (got.r_1, got.r_2, got.r_3) == (
        rsum["click"],
        rsum["purchase"],
        rsum["error"],
    )
    assert got.h_stat == pytest.approx(want_h, rel=1e-12)


def test_mann_kendall_matches_python(spark, sf_dir):
    c = _daily_counts(spark, sf_dir)
    n = len(c)
    s = sum(
        (1 if c[j] > c[i] else -1 if c[j] < c[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = [t for t in Counter(c).values() if t > 1]
    var18 = n * (n - 1) * (2 * n + 5) - sum(t * (t - 1) * (2 * t + 5) for t in ties)
    got = _build(spark, sf_dir, "agg_mann_kendall_trend").collect()[0]
    assert (got.n_days, got.s_stat, got.var18_num) == (n, s, var18)
    d2 = n * (n - 1)
    t2 = sum(t * (t - 1) for t in ties)
    want_tau = s / ((d2 / 2.0 - t2 / 2.0) * (d2 / 2.0)) ** 0.5
    assert got.tau_b == pytest.approx(want_tau, rel=1e-12)
    assert -1.0 <= got.tau_b <= 1.0


def test_wilcoxon_signed_rank_matches_python(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    per_day = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.event_type == "click":
            per_day[r.ts.date()][0] += 1
        elif r.event_type == "view":
            per_day[r.ts.date()][1] += 1
    diffs = [a - b for a, b in per_day.values() if a != b]
    ads = sorted(abs(d) for d in diffs)
    below = {}
    cnt = Counter(ads)
    seen = 0
    for ad in sorted(cnt):
        below[ad] = seen
        seen += cnt[ad]
    w2p = sum(2 * below[abs(d)] + cnt[abs(d)] + 1 for d in diffs if d > 0)
    w2m = sum(2 * below[abs(d)] + cnt[abs(d)] + 1 for d in diffs if d < 0)
    got = _build(spark, sf_dir, "agg_wilcoxon_signed_rank").collect()[0]
    assert (got.n_nonzero, got.w2_plus, got.w2_minus) == (len(diffs), w2p, w2m)
    # doubled midranks over nonzero diffs must sum to n(n+1) exactly
    assert w2p + w2m == len(diffs) * (len(diffs) + 1)


def test_pettitt_matches_python(spark, sf_dir):
    from datetime import date

    c = _daily_counts(spark, sf_dir)
    days = sorted(
        {r.ts.date() for r in load(spark, sf_dir, "events").select("ts").collect()}
    )
    n = len(c)
    best = None
    for t_idx in range(n - 1):
        u = sum(
            (1 if c[j] > c[i] else -1 if c[j] < c[i] else 0)
            for i in range(t_idx + 1)
            for j in range(t_idx + 1, n)
        )
        k = abs(u)
        if best is None or k > best[0]:
            best = (k, t_idx, u)
    got = _build(spark, sf_dir, "events_pettitt_changepoint").collect()[0]
    assert got.n_days == n
    assert got.k_stat == best[0]
    assert got.u_at_tstar == best[2]
    # t_star is the epoch-day id of the argmax split day
    assert got.t_star == (days[best[1]] - date(1970, 1, 1)).days


def test_hodges_lehmann_matches_python(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    per_day = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.event_type == "click":
            per_day[r.ts.date()][0] += 1
        elif r.event_type == "view":
            per_day[r.ts.date()][1] += 1
    c1 = [a for a, _ in per_day.values()]
    c2 = [b for _, b in per_day.values()]
    diffs = sorted(a - b for a in c1 for b in c2)
    want = diffs[(len(diffs) + 1) // 2 - 1]  # lower median
    got = _build(spark, sf_dir, "agg_hodges_lehmann_shift").collect()[0]
    assert got.n_pairs == len(diffs)
    assert got.hl_shift == want


def test_confusion_sweep_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    got = {r.threshold: r for r in _build(spark, sf_dir, "quality_confusion_sweep").collect()}
    for t, r in got.items():
        tp = sum(1 for d in docs if d.n_chars >= t and d.lang == "en")
        fp = sum(1 for d in docs if d.n_chars >= t and d.lang != "en")
        fn = sum(1 for d in docs if d.n_chars < t and d.lang == "en")
        tn = sum(1 for d in docs if d.n_chars < t and d.lang != "en")
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        assert r.f1 == pytest.approx(2 * tp / (2 * tp + fp + fn), rel=1e-12)


def test_youden_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    n_pos = sum(1 for d in docs if d.lang == "en")
    n_neg = len(docs) - n_pos
    best = None
    for t in sorted({d.n_chars for d in docs}):
        tp = sum(1 for d in docs if d.n_chars >= t and d.lang == "en")
        fp = sum(1 for d in docs if d.n_chars >= t and d.lang != "en")
        j_num = tp * n_neg - fp * n_pos
        if best is None or j_num > best[0]:
            best = (j_num, t)
    got = _build(spark, sf_dir, "quality_youden_threshold").collect()[0]
    assert got.threshold == best[1]
    assert got.youden_j == pytest.approx(best[0] / (n_pos * n_neg), rel=1e-12)
    assert -1.0 <= got.youden_j <= 1.0


def test_kmv_matches_python(spark, sf_dir):
    users = {
        r.user_id
        for r in load(spark, sf_dir, "events").select("user_id").collect()
    }
    hs = sorted(
        {int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16) for u in users}
    )
    k = 64
    got = _build(spark, sf_dir, "approx_kmv_distinct").collect()[0]
    assert got.exact_distinct == len(users)
    if len(hs) >= k:
        h_k = hs[k - 1]
        assert got.h_k == h_k
        assert got.kmv_estimate == pytest.approx(
            (k - 1.0) * (16.0**12 / h_k), rel=1e-12
        )
    else:
        assert got.kmv_estimate == len(hs)
    assert got.within_50pct  # pinned on this dataset: the sketch lands


def test_assortativity_matches_python(spark, sf_dir):
    from sql_engine_spark.operators.graph import knn_graph_shared, und_edges

    g = knn_graph_shared(spark, sf_dir)
    edges = {(r.a, r.b) for r in und_edges(g).collect()}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs = []
    for a, b in edges:
        xs.append((deg[a], deg[b]))
        xs.append((deg[b], deg[a]))
    m = len(xs)
    sxy = sum(x * y for x, y in xs)
    sx = sum(x for x, _ in xs)
    sxx = sum(x * x for x, _ in xs)
    want = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    got = _build(spark, sf_dir, "graph_assortativity").collect()[0]
    assert (got.m_directed, got.s_xy, got.s_x, got.s_xx) == (m, sxy, sx, sxx)
    assert got.assortativity == pytest.approx(want, rel=1e-12)
    assert -1.0 <= got.assortativity <= 1.0


def test_semdedup_keeps_cell_argmin(spark, sf_dir):
    rows = _build(spark, sf_dir, "curation_semdedup_cells").collect()
    # one kept representative per cell; drops account for the rest
    emb_n = load(spark, sf_dir, "embeddings").count()
    assert sum(r.cell_size for r in rows) == emb_n
    assert sum(r.n_dropped for r in rows) == emb_n - len(rows)
    assert all(r.n_dropped == r.cell_size - 1 for r in rows)
    assert all(r.kept_dist >= 0.0 for r in rows)


def test_compaction_plan_conserves_bytes(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    total = sum(d.n_chars for d in docs)
    rows = sorted(
        _build(spark, sf_dir, "maintenance_compaction_plan").collect(),
        key=lambda r: r.bin,
    )
    assert sum(r.total_bytes for r in rows) == total
    # bins cover contiguous, non-overlapping shard ranges in order
    for prev, cur in zip(rows, rows[1:]):
        assert prev.last_shard < cur.first_shard
    # every bin but the last crosses the target boundary with its last
    # shard (the coalescer only closes a bin when the running total
    # crosses a target multiple)
    for r in rows[:-1]:
        assert r.total_bytes > 0


def test_delete_plan_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    per_shard = defaultdict(lambda: [0, 0])
    for d in docs:
        s = d.doc_id // 50
        per_shard[s][0] += 1
        if d.lang == "zh":
            per_shard[s][1] += 1
    got = {r.shard_id: r for r in _build(spark, sf_dir, "maintenance_delete_plan").collect()}
    assert set(got) == set(per_shard)
    for s, (n, dele) in per_shard.items():
        r = got[s]
        assert (r.n_rows, r.n_deleted, r.n_kept, r.needs_rewrite) == (
            n,
            dele,
            n - dele,
            dele > 0,
        )


def test_theta_forecast_matches_python(spark, sf_dir):
    series = [float(c) for c in _daily_counts(spark, sf_dir)]
    n = len(series)
    st = n * (n + 1) // 2
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(series)
    sty = sum(t * y for t, y in zip(range(1, n + 1), series))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    s = 2.0 * series[0] - (a + b)
    for t in range(2, n + 1):
        s = 0.5 * (2.0 * series[t - 1] - (a + b * t)) + 0.5 * s
    got = {r.horizon: r.forecast for r in _build(spark, sf_dir, "events_theta_forecast").collect()}
    assert sorted(got) == list(range(1, 8))
    for h in range(1, 8):
        assert got[h] == pytest.approx(0.5 * (s + a + b * (n + h)), rel=1e-9)
    # successive horizons step by exactly b/2 (drift half-weight)
    steps = [got[h + 1] - got[h] for h in range(1, 7)]
    for d in steps:
        assert d == pytest.approx(b / 2.0, rel=1e-9)


def test_wilson_ci_matches_python(spark, sf_dir):
    rows = {r.name: r for r in _build(spark, sf_dir, "events_funnel_wilson_ci").collect()}
    assert set(rows) == {"any->view", "view->click", "click->purchase"}
    z = 1.96
    for r in rows.values():
        n, x = r.denom, r.num
        p = x / n
        center = p + z * z / (2 * n)
        half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5)
        dw = 1 + z * z / n
        assert r.p_hat == pytest.approx(p, rel=1e-12)
        assert r.wilson_lo == pytest.approx((center - half) / dw, rel=1e-9)
        assert r.wilson_hi == pytest.approx((center + half) / dw, rel=1e-9)
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
    # funnel is monotone: each step's denominator is the prior numerator
    assert rows["view->click"].denom == rows["any->view"].num
    assert rows["click->purchase"].denom == rows["view->click"].num


def test_lsh_tables_recall_monotone(spark, sf_dir):
    rows = _build(spark, sf_dir, "ann_lsh_tables_recall_sweep").collect()
    by_tables = defaultdict(dict)
    for r in rows:
        by_tables[r.tables][r.query_id] = r.recall
    assert set(by_tables) == {1, 2, 4}
    # OR-amplification can only add candidates: per-query recall is
    # monotone non-decreasing in the table count
    for q in by_tables[1]:
        assert by_tables[1][q] <= by_tables[2][q] <= by_tables[4][q]
    mean4 = sum(by_tables[4].values()) / len(by_tables[4])
    assert mean4 >= 0.5  # measured 0.84+ at sf0.001; generous floor
