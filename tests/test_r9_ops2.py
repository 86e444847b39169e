"""Round-9 time-series + distribution statistics: independent
pure-Python recompute pins (house bar: oracle AND recompute)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from sql_engine_spark.registry import all_queries

SF = None  # set by fixture


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


@pytest.fixture(scope="module")
def daily(sf_dir):
    rows = duckdb.sql(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS c
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    return [(d, int(c)) for d, c in rows]


def test_page_hinkley_matches_python(spark, sf_dir, daily):
    n = sum(c for _, c in daily)
    d = len(daily)
    cum, mn, want = 0, None, {}
    for rk, (day, c) in enumerate(daily, start=1):
        cum += c
        m = d * cum - rk * n
        mn = m if mn is None else min(mn, m)
        want[day] = (c, m - mn)
    got = {r.day: r for r in _build(spark, sf_dir, "events_page_hinkley").collect()}
    assert set(got) == set(want)
    peak = max(ph for _, ph in want.values())
    for day, (c, ph) in want.items():
        r = got[day]
        assert (r.cnt, r.ph_scaled) == (c, ph)
        assert r.ph == pytest.approx(ph / d)
        assert r.is_alarm_peak == (ph == peak)


def test_rsi_cutler_matches_python(spark, sf_dir, daily):
    diffs = [None] + [b[1] - a[1] for a, b in zip(daily, daily[1:])]
    got = {r.day: r for r in _build(spark, sf_dir, "events_rsi_cutler").collect()}
    want = {}
    for i in range(len(daily)):
        window = [x for x in diffs[max(0, i - 13) : i + 1] if x is not None]
        if len(window) == 14:
            g = sum(x for x in window if x > 0)
            l = sum(-x for x in window if x < 0)
            rsi = 100.0 * g / (g + l) if g + l > 0 else 50.0
            want[daily[i][0]] = (g, l, rsi)
    assert set(got) == set(want)
    for day, (g, l, rsi) in want.items():
        r = got[day]
        assert (r.sum_gain, r.sum_loss) == (g, l)
        assert r.rsi == pytest.approx(rsi)


def test_bollinger_matches_python(spark, sf_dir, daily):
    got = {
        r.day: r for r in _build(spark, sf_dir, "events_bollinger_bands").collect()
    }
    want = {}
    for i in range(6, len(daily)):
        win = [c for _, c in daily[i - 6 : i + 1]]
        s1, s2 = sum(win), sum(c * c for c in win)
        mean = s1 / 7.0
        sd = math.sqrt(max(0.0, (s2 - s1 * s1 / 7.0) / 7.0))
        want[daily[i][0]] = (daily[i][1], mean, sd)
    assert set(got) == set(want)
    for day, (c, mean, sd) in want.items():
        r = got[day]
        assert r.cnt == c
        assert r.mean_w == pytest.approx(mean)
        assert r.sd_w == pytest.approx(sd)
        assert r.is_break == (c > mean + 2 * sd or c < mean - 2 * sd)


def test_max_drawdown_matches_python(spark, sf_dir, daily):
    got = {r.day: r for r in _build(spark, sf_dir, "events_max_drawdown").collect()}
    peak, want = 0, {}
    for day, c in daily:
        peak = max(peak, c)
        want[day] = (c, peak, (peak - c) / peak)
    mx = max(dd for _, _, dd in want.values())
    for day, (c, p, dd) in want.items():
        r = got[day]
        assert (r.cnt, r.peak) == (c, p)
        assert r.drawdown == pytest.approx(dd)
        assert r.is_max_drawdown == (dd == mx)


def test_cliffs_delta_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT event_id, event_type, value FROM '{sf_dir}/events.parquet'
            WHERE event_type IN ('purchase', 'click')"""
    ).fetchall()
    ranked = sorted(rows, key=lambda r: (r[2], r[0]))
    r_a = sum(i for i, r in enumerate(ranked, start=1) if r[1] == "purchase")
    n_a = sum(1 for r in rows if r[1] == "purchase")
    n_b = len(rows) - n_a
    u_a = r_a - n_a * (n_a + 1) // 2
    vda = u_a / (n_a * n_b)
    delta = 2 * vda - 1
    got = _build(spark, sf_dir, "agg_cliffs_delta").collect()[0]
    assert (got.n_a, got.n_b, got.u_a) == (n_a, n_b, u_a)
    assert got.vda == pytest.approx(vda)
    assert got.cliffs_delta == pytest.approx(delta)
    mag = (
        "negligible"
        if abs(delta) < 0.147
        else "small"
        if abs(delta) < 0.33
        else "medium"
        if abs(delta) < 0.474
        else "large"
    )
    assert got.magnitude == mag


@pytest.fixture(scope="module")
def panel(sf_dir):
    rows = duckdb.sql(
        f"""WITH days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) d
                          FROM '{sf_dir}/events.parquet'),
             types AS (SELECT DISTINCT event_type t
                       FROM '{sf_dir}/events.parquet'),
             c AS (SELECT CAST(date_trunc('day', ts) AS DATE) d, event_type t,
                          COUNT(*) c FROM '{sf_dir}/events.parquet' GROUP BY 1, 2)
            SELECT days.d, types.t, COALESCE(c.c, 0)
            FROM days CROSS JOIN types
            LEFT JOIN c ON c.d = days.d AND c.t = types.t"""
    ).fetchall()
    out = defaultdict(dict)
    for d, t, c in rows:
        out[d][t] = int(c)
    return out


def test_friedman_kendall_w_matches_python(spark, sf_dir, panel):
    types = sorted(next(iter(panel.values())).keys())
    k, d = len(types), len(panel)
    rj = Counter()
    for day, row in panel.items():
        vals = sorted(row.values())
        for t in types:
            c = row[t]
            r_min = 1 + sum(1 for v in vals if v < c)
            ties = sum(1 for v in vals if v == c)
            rj[t] += r_min + (ties - 1) / 2.0
    sum_r2 = sum(v * v for v in rj.values())
    chi2 = 12.0 * sum_r2 / (d * k * (k + 1)) - 3.0 * d * (k + 1)
    w = chi2 / (d * (k - 1))
    got = _build(spark, sf_dir, "agg_friedman_kendall_w").collect()[0]
    assert (got.n_blocks, got.k_treatments) == (d, k)
    assert got.chi2_friedman == pytest.approx(chi2)
    assert got.kendalls_w == pytest.approx(w)


def test_cochrans_q_matches_python(spark, sf_dir, panel):
    types = sorted(next(iter(panel.values())).keys())
    d = len(panel)
    tot = {t: sum(row[t] for row in panel.values()) for t in types}
    x = {
        (day, t): 1 if row[t] * d > tot[t] else 0
        for day, row in panel.items()
        for t in types
    }
    cj = {t: sum(x[(day, t)] for day in panel) for t in types}
    ri = {day: sum(x[(day, t)] for t in types) for day in panel}
    k = len(types)
    n = sum(cj.values())
    q_num = (k - 1) * (k * sum(c * c for c in cj.values()) - n * n)
    q_den = k * n - sum(r * r for r in ri.values())
    got = _build(spark, sf_dir, "agg_cochrans_q").collect()[0]
    assert (got.n_blocks, got.k_treatments, got.n_success) == (d, k, n)
    if q_den > 0:
        assert got.cochrans_q == pytest.approx(q_num / q_den)
    else:
        assert got.cochrans_q is None


@pytest.fixture(scope="module")
def prices(sf_dir):
    return duckdb.sql(
        f"""SELECT o_orderkey, o_totalprice FROM '{sf_dir}/orders.parquet'
            ORDER BY o_totalprice, o_orderkey"""
    ).fetchall()


def _ssum(vals, scale=1e6):
    def rha(v):
        f = math.floor(abs(v) + 0.5)
        return f if v >= 0 else -f

    return sum(int(rha(v * scale)) for v in vals) / scale


def test_gini_mean_difference_matches_python(spark, sf_dir, prices):
    n = len(prices)
    gsum = _ssum(
        [(2 * r - n - 1) * x for r, (_, x) in enumerate(prices, start=1)]
    )
    xsum = sum(x for _, x in prices)  # dsum-close; compare loosely
    gmd = 2.0 * gsum / (n * (n - 1))
    got = _build(spark, sf_dir, "agg_gini_mean_difference").collect()[0]
    assert got.n_rows == n
    assert got.mean_price == pytest.approx(xsum / n, rel=1e-9)
    assert got.gmd == pytest.approx(gmd, rel=1e-9)
    assert got.gini == pytest.approx(gmd / (2 * got.mean_price), rel=1e-9)


def test_lorenz_deciles_matches_python(spark, sf_dir, prices):
    n = len(prices)
    dec_sum = Counter()
    dec_n = Counter()
    for r, (_, x) in enumerate(prices, start=1):
        d = (10 * r + n - 1) // n
        dec_sum[d] += x
        dec_n[d] += 1
    total = sum(dec_sum.values())
    got = {r.decile: r for r in _build(spark, sf_dir, "agg_lorenz_deciles").collect()}
    assert set(got) == set(dec_sum)
    cum = 0.0
    for d in sorted(dec_sum):
        cum += dec_sum[d]
        r = got[d]
        assert r.n_rows == dec_n[d]
        assert r.decile_sum == pytest.approx(dec_sum[d], rel=1e-9)
        assert r.cum_share == pytest.approx(cum / total, rel=1e-9)


def test_quartile_dispersion_matches_python(spark, sf_dir, prices):
    n = len(prices)
    q1 = prices[(n + 3) // 4 - 1][1]
    q3 = prices[(3 * n + 3) // 4 - 1][1]
    got = _build(spark, sf_dir, "agg_quartile_dispersion").collect()[0]
    assert got.n_rows == n
    assert (got.q1, got.q3) == (q1, q3)
    assert got.qcd == pytest.approx((q3 - q1) / (q3 + q1))


def test_cronbach_alpha_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT text, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    items = [
        (nc, len(t.strip().lower().split()), t.count("e")) for t, nc in rows
    ]
    n = len(items)

    def var(xs):
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        return (s2 - s1 * s1 / n) / n

    v1 = var([a for a, _, _ in items])
    v2 = var([b for _, b, _ in items])
    v3 = var([c for _, _, c in items])
    vt = var([a + b + c for a, b, c in items])
    alpha = (3 / 2) * (1 - ((v1 + v2) + v3) / vt)
    got = _build(spark, sf_dir, "agg_cronbach_alpha").collect()[0]
    assert (got.n_docs, got.k_items) == (n, 3)
    assert got.sum_item_var == pytest.approx((v1 + v2) + v3, rel=1e-12)
    assert got.total_var == pytest.approx(vt, rel=1e-12)
    assert got.cronbach_alpha == pytest.approx(alpha, rel=1e-12)


# --------------------------------------------------------------------------
# Round-9 extras: manifest diff, kNN margin, weighted kappa, fleet twins
# --------------------------------------------------------------------------


def test_manifest_diff_matches_python(spark, sf_dir):
    counts = duckdb.sql(
        f"""SELECT SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END),
                   SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END),
                   SUM(CASE WHEN o_orderkey % 3 = 2 THEN 1 ELSE 0 END)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchone()
    n0, n1, n2 = (int(c) for c in counts)
    want = {
        (0, 1, "f0", "kept", n0),
        (0, 1, "f1", "kept", n1),
        (0, 1, "f2", "added", n2),
        (1, 2, "f0", "removed", n0),
        (1, 2, "f1", "removed", n1),
        (1, 2, "f01", "added", n0 + n1),
        (1, 2, "f2", "kept", n2),
    }
    got = {
        (r.from_version, r.to_version, r.file, r.change, r.n_rows)
        for r in _build(spark, sf_dir, "maintenance_manifest_diff").collect()
    }
    assert got == want


def test_knn_margin_matches_python(spark, sf_dir):
    from sql_engine_spark.operators.graph import knn_graph_shared

    g = knn_graph_shared(spark, sf_dir).collect()
    lab = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    best = {}
    for e in g:
        same = lab[e.src] == lab[e.dst]
        cur = best.setdefault(e.src, [None, None])
        k = 0 if same else 1
        cur[k] = e.cosine if cur[k] is None else max(cur[k], e.cosine)
    per_label = defaultdict(list)
    for src, (bs, bd) in best.items():
        if bs is not None and bd is not None:
            per_label[lab[src]].append(bs - bd)
    got = {r.label: r for r in _build(spark, sf_dir, "emb_knn_margin_audit").collect()}
    assert set(got) == set(per_label)
    for label, margins in per_label.items():
        r = got[label]
        assert r.n_nodes == len(margins)
        # The operator folds margins through dsum (1e-6 DECIMAL grain);
        # an exact-double python sum differs by up to n*5e-7 absolute.
        assert r.mean_margin == pytest.approx(
            sum(margins) / len(margins), abs=1e-4
        )
        assert r.frac_positive == pytest.approx(
            sum(1 for m in margins if m > 0) / len(margins)
        )


def test_weighted_kappa_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    n = len(rows)
    by_chars = sorted(rows, key=lambda r: (r[2], r[0]))
    by_ntok = sorted(rows, key=lambda r: (len(r[1].strip().lower().split()), r[0]))
    b1 = {r[0]: (5 * i) // n for i, r in enumerate(by_chars)}
    b2 = {r[0]: (5 * i) // n for i, r in enumerate(by_ntok)}
    o = Counter((b1[r[0]], b2[r[0]]) for r in rows)
    ri = Counter()
    cj = Counter()
    for (i, j), c in o.items():
        ri[i] += c
        cj[j] += c
    num = sum((i - j) ** 2 / 16.0 * c for (i, j), c in o.items())
    den = sum(
        (i - j) ** 2 / 16.0 * (ri[i] * cj[j] / n) for i in ri for j in cj
    )
    got = _build(spark, sf_dir, "quality_weighted_kappa").collect()[0]
    assert got.n_docs == n
    assert got.sum_w_obs == pytest.approx(num, rel=1e-12)
    assert got.sum_w_exp == pytest.approx(den, rel=1e-6)
    assert got.kappa_weighted == pytest.approx(1 - num / den, rel=1e-6)


def test_fleet_twins_converge_to_batch(spark, sf_dir):
    for s_name, b_name in (
        ("streaming_page_hinkley", "events_page_hinkley"),
        ("streaming_max_drawdown", "events_max_drawdown"),
    ):
        s = {tuple(r) for r in _build(spark, sf_dir, s_name).collect()}
        b = {tuple(r) for r in _build(spark, sf_dir, b_name).collect()}
        assert s == b, s_name
