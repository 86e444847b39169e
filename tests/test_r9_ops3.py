"""Round-9 stats batch (round9_stats3): independent pure-Python
recompute pins. ssum-crossing folds are mimicked at the same 1e-6
grain so the pins check the real pipeline, not a lookalike."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _rha(x: float) -> int:
    f = math.floor(abs(x) + 0.5)
    return int(f if x >= 0 else -f)


def _ssum(vals, scale=1e6):
    return sum(_rha(v * scale) for v in vals) / scale


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def daily(events):
    d = events.copy()
    d["day"] = d.ts.dt.floor("D")
    return d.groupby("day").size().sort_index()


def test_mood_median_matches_python(spark, sf_dir, events):
    rows = sorted(zip(events.value, events.event_id))
    n = len(rows)
    grand = rows[(n + 1) // 2 - 1][0]
    above = defaultdict(int)
    below = defaultdict(int)
    for et, v in zip(events.event_type, events.value):
        if v > grand:
            above[et] += 1
        else:
            below[et] += 1
    m_above = sum(above.values())
    m_below = sum(below.values())
    terms = {}
    for et in set(events.event_type):
        na, nb = above[et], below[et]
        ea = (na + nb) * float(m_above) / n
        eb = (na + nb) * float(m_below) / n
        terms[et] = (na, nb, ea, eb)
    chi2 = _ssum(
        (na - ea) ** 2 / ea + (nb - eb) ** 2 / eb
        for na, nb, ea, eb in terms.values()
    )
    got = _build(spark, sf_dir, "agg_mood_median_test").collect()
    assert len(got) == len(terms)
    for r in got:
        na, nb, ea, eb = terms[r.event_type]
        assert (r.n_above, r.n_below) == (na, nb)
        assert r.e_above == pytest.approx(ea, rel=1e-12)
        assert r.chi2 == pytest.approx(chi2, rel=1e-9)
        assert r.dof == len(terms) - 1


def test_kendall_tau_binned_matches_python(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    tie = li.l_orderkey * 8 + li.l_linenumber
    n = len(li)
    xr = sorted(range(n), key=lambda i: (li.l_quantity.iat[i], tie.iat[i]))
    yr = sorted(range(n), key=lambda i: (li.l_extendedprice.iat[i], tie.iat[i]))
    xb = [0] * n
    yb = [0] * n
    for rk, i in enumerate(xr):
        xb[i] = (rk * 10) // n + 1
    for rk, i in enumerate(yr):
        yb[i] = (rk * 10) // n + 1
    cells = defaultdict(int)
    for i in range(n):
        cells[(xb[i], yb[i])] += 1
    C = D = 0
    items = list(cells.items())
    for (x1, y1), m1 in items:
        for (x2, y2), m2 in items:
            if x2 > x1 and y2 > y1:
                C += m1 * m2
            elif x2 > x1 and y2 < y1:
                D += m1 * m2
    tx = defaultdict(int)
    ty = defaultdict(int)
    for (x, y), m in items:
        tx[x] += m
        ty[y] += m
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    half = n * (n - 1) / 2.0
    tau = (C - D) / math.sqrt((half - n1) * (half - n2))
    row = _build(spark, sf_dir, "stats_kendall_tau_binned").collect()[0]
    assert (row.concordant, row.discordant) == (C, D)
    assert (row.n, row.n1, row.n2) == (n, n1, n2)
    assert row.tau_b == pytest.approx(tau, rel=1e-12)
    # tau-b is a correlation: bounded in [-1, 1].
    assert -1.0 <= row.tau_b <= 1.0


def test_cuped_matches_python(spark, sf_dir, events):
    split = pd.Timestamp("2024-01-16")
    users = {}
    for uid, grp in events.groupby("user_id"):
        pre = _ssum(
            v if t < split else 0.0 for t, v in zip(grp.ts, grp.value)
        )
        post = _ssum(
            v if t >= split else 0.0 for t, v in zip(grp.ts, grp.value)
        )
        users[uid] = (uid % 2, pre, post)
    n = len(users)
    s_pre = _ssum(u[1] for u in users.values())
    s_post = _ssum(u[2] for u in users.values())
    s_pre2 = _ssum(u[1] * u[1] for u in users.values())
    s_prepost = _ssum(u[1] * u[2] for u in users.values())
    mean_pre = s_pre / n
    theta = (s_prepost - s_pre * s_post / n) / (s_pre2 - s_pre * s_pre / n)
    g = defaultdict(list)
    for c, pre, post in users.values():
        g[c].append((post, post - theta * (pre - mean_pre)))
    want = {}
    for c, rows in g.items():
        m = len(rows)
        gp = _ssum(r[0] for r in rows)
        ga = _ssum(r[1] for r in rows)
        gp2 = _ssum(r[0] * r[0] for r in rows)
        ga2 = _ssum(r[1] * r[1] for r in rows)
        vp = (gp2 - gp * gp / m) / (m - 1)
        va = (ga2 - ga * ga / m) / (m - 1)
        want[c] = (m, gp / m, ga / m, vp, va, 1.0 - va / vp)
    got = _build(spark, sf_dir, "events_cuped_adjustment").collect()
    assert len(got) == len(want)
    for r in got:
        m, mp, ma, vp, va, red = want[r.cohort]
        assert r.n_users == m
        assert r.mean_post == pytest.approx(mp, rel=1e-9)
        assert r.mean_adj == pytest.approx(ma, rel=1e-9)
        assert r.var_post == pytest.approx(vp, rel=1e-9)
        assert r.var_adj == pytest.approx(va, rel=1e-9)
        assert r.variance_reduction == pytest.approx(red, rel=1e-6)
    # The OLS-slope guarantee is on the POOLED population (per-cohort
    # variance can rise at tiny n): check it on the pooled recompute.
    pooled = [pair for rows in g.values() for pair in rows]
    np_ = len(pooled)
    pp = _ssum(p[0] for p in pooled)
    pa = _ssum(p[1] for p in pooled)
    pp2 = _ssum(p[0] * p[0] for p in pooled)
    pa2 = _ssum(p[1] * p[1] for p in pooled)
    assert (pa2 - pa * pa / np_) <= (pp2 - pp * pp / np_) + 1e-6


def _py_decompose(daily):
    days = list(daily.index)
    cnts = list(daily.values)
    n = len(days)
    trend = {}
    for i in range(n):
        if 3 <= i <= n - 4:
            trend[days[i]] = sum(cnts[i - 3 : i + 4]) / 7.0
    det = {
        d: c - trend[d] for d, c in zip(days, cnts) if d in trend
    }
    bydow = defaultdict(list)
    for d, v in det.items():
        bydow[(d - pd.Timestamp("1970-01-01")).days % 7].append(v)
    seas = {k: _ssum(v) / len(v) for k, v in bydow.items()}
    return days, cnts, trend, det, seas


def test_ma_decomposition_matches_python(spark, sf_dir, daily):
    days, cnts, trend, det, seas = _py_decompose(daily)
    got = {r.day: r for r in _build(spark, sf_dir, "events_ma_decomposition").collect()}
    assert len(got) == len(days)
    for d, c in zip(days, cnts):
        r = got[d.date()]
        assert r.cnt == c
        dow = (d - pd.Timestamp("1970-01-01")).days % 7
        assert r.dow == dow
        if d in trend:
            assert r.trend == pytest.approx(trend[d], rel=1e-12)
            assert r.remainder == pytest.approx(
                det[d] - seas[dow], rel=1e-9, abs=1e-9
            )
        else:
            assert r.trend is None and r.remainder is None
        assert r.seasonal == pytest.approx(seas[dow], rel=1e-9)


def test_seasonal_anomaly_matches_python(spark, sf_dir, daily):
    days, cnts, trend, det, seas = _py_decompose(daily)
    rem = {
        d: det[d] - seas[(d - pd.Timestamp("1970-01-01")).days % 7]
        for d in det
    }
    vals = sorted((v, d) for d, v in rem.items())
    n = len(vals)
    med = vals[(n + 1) // 2 - 1][0]
    devs = sorted((abs(v - med), d) for d, v in rem.items())
    mad = devs[(n + 1) // 2 - 1][0] * 1.4826
    got = {r.day: r for r in _build(spark, sf_dir, "events_seasonal_anomaly").collect()}
    assert len(got) == n
    for d, v in rem.items():
        r = got[d.date()]
        assert r.remainder == pytest.approx(v, rel=1e-9, abs=1e-9)
        assert r.med_rem == pytest.approx(med, rel=1e-12)
        assert r.mad_scaled == pytest.approx(mad, rel=1e-9, abs=1e-12)
        assert r.is_anomaly == (abs(v - med) > 3.0 * mad)


def test_sn_estimator_matches_python(spark, sf_dir, daily):
    cnts = [int(c) for c in daily.values]
    days = list(daily.index)
    n = len(cnts)
    himeds = []
    for i in range(n):
        ads = sorted(abs(cnts[i] - cnts[j]) for j in range(n))
        himeds.append((ads[n // 2], days[i]))
    himeds.sort()
    sn_raw = himeds[(n + 1) // 2 - 1][0]
    row = _build(spark, sf_dir, "agg_sn_estimator_daily").collect()[0]
    assert row.n_days == n
    assert row.sn_raw == sn_raw
    assert row.sn == pytest.approx(1.1926 * sn_raw, rel=1e-12)
