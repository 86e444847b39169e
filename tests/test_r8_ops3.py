"""Round-8 set-2 operator pins: each statistic recomputed independently
in pure Python from the raw parquet rows (the house pattern — the
DuckDB oracle already cross-checks engine spelling; these pin the MATH
against a third, windowless implementation)."""

from __future__ import annotations

import math
from collections import Counter

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _values_by_type(spark, sf_dir, types=None):
    rows = load(spark, sf_dir, "events").select("event_type", "value").collect()
    out = {}
    for r in rows:
        if types is None or r.event_type in types:
            out.setdefault(r.event_type, []).append(r.value)
    return out


def test_jarque_bera_matches_python(spark, sf_dir):
    groups = _values_by_type(spark, sf_dir)
    got = {r.event_type: r for r in _build(spark, sf_dir, "agg_jarque_bera").collect()}
    assert set(got) == set(groups)
    for et, xs in groups.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
        r = got[et]
        assert r.n == n
        assert abs(r.skewness - g1) < 1e-6
        assert abs(r.excess_kurtosis - g2) < 1e-6
        assert abs(r.jb_stat - jb) < 1e-4
        assert r.reject_95 == (jb > 5.991464547107979)


def test_levene_mean_matches_python(spark, sf_dir):
    groups = _values_by_type(spark, sf_dir, ("click", "purchase", "error"))
    zs = {}
    for et, xs in groups.items():
        mu = sum(xs) / len(xs)
        zs[et] = [abs(x - mu) for x in xs]
    k = 3
    n = sum(len(v) for v in zs.values())
    zbar = sum(sum(v) for v in zs.values()) / n
    between = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in zs.values())
    within = sum(
        sum((z - sum(v) / len(v)) ** 2 for z in v) for v in zs.values()
    )
    want = ((n - k) / (k - 1)) * between / within
    r = _build(spark, sf_dir, "agg_levene_mean").collect()[0]
    assert (r.n_1 + r.n_2 + r.n_3) == n
    assert abs(r.levene_w - want) < 1e-5


def test_cramers_v_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("lang", "source").collect()
    obs = Counter((r.lang, r.source) for r in rows)
    rt = Counter(r.lang for r in rows)
    ct = Counter(r.source for r in rows)
    n = len(rows)
    chi2 = 0.0
    for (lg, src), o in obs.items():
        e = rt[lg] * ct[src] / n
        chi2 += (o - e) ** 2 / e
    kmin = min(len(rt) - 1, len(ct) - 1)
    v = math.sqrt(chi2 / (n * kmin))
    phi2c = max(0.0, chi2 / n - (len(rt) - 1) * (len(ct) - 1) / (n - 1))
    vc = math.sqrt(phi2c / kmin)
    r = _build(spark, sf_dir, "agg_cramers_v").collect()[0]
    assert (r.n, r.r_lvls, r.c_lvls) == (n, len(rt), len(ct))
    assert abs(r.chi2 - chi2) < 1e-4
    assert abs(r.cramers_v - v) < 1e-8
    assert abs(r.cramers_v_corrected - vc) < 1e-8


def test_mcnemar_matches_python(spark, sf_dir):

    rows = load(spark, sf_dir, "documents").select("text", "lang").collect()
    b = c = 0
    for r in rows:
        toks = set(r.text.strip().lower().split())
        truth = r.lang == "en"
        pa, pb = "the" in toks, "and" in toks
        if (pa == truth) and (pb != truth):
            b += 1
        if (pa != truth) and (pb == truth):
            c += 1
    got = _build(spark, sf_dir, "agg_mcnemar").collect()[0]
    assert (got.b, got.c, got.n) == (b, c, len(rows))
    if b + c:
        want = (abs(b - c) - 1.0) ** 2 / (b + c)
        assert abs(got.mcnemar_chi2 - want) < 1e-9


def test_simpson_diversity_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("source", "lang").collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, Counter())[r.lang] += 1
    got = {
        r.source: r
        for r in _build(spark, sf_dir, "agg_simpson_diversity").collect()
    }
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        lam = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
        r = got[src]
        assert r.n == n and r.n_langs == len(cnt)
        assert abs(r.simpson_l - lam) < 1e-12
        assert abs(r.gini_simpson - (1 - lam)) < 1e-12
        if lam:
            assert abs(r.effective_langs - 1 / lam) < 1e-9


def test_ks_separation_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    pos = sorted(r.n_chars for r in rows if r.lang == "en")
    neg = sorted(r.n_chars for r in rows if r.lang != "en")
    cuts = sorted(set(pos) | set(neg))
    best, best_cut = -1.0, None
    for s in cuts:
        fp = sum(1 for x in pos if x <= s) / len(pos)
        fn = sum(1 for x in neg if x <= s) / len(neg)
        g = abs(fp - fn)
        if g > best + 1e-15:
            best, best_cut = g, s
    r = _build(spark, sf_dir, "quality_ks_separation").collect()[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert abs(r.ks_stat - best) < 1e-12
    assert r.ks_cut_score == best_cut


def test_hellinger_drift_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    days = [(r.ts.date() - __import__("datetime").date(1970, 1, 1)).days for r in rows]
    mid = (min(days) + max(days)) // 2
    a, b = Counter(), Counter()
    for d, r in zip(days, rows):
        (a if d <= mid else b)[r.event_type] += 1
    ta, tb = sum(a.values()), sum(b.values())
    bc = sum(
        math.sqrt((a[t] / ta) * (b[t] / tb)) for t in set(a) | set(b)
    )
    r = _build(spark, sf_dir, "quality_hellinger_drift").collect()[0]
    assert (r.n_first_half, r.n_second_half) == (ta, tb)
    # The BC fold goes through ssum (1e-6 per-term rounding).
    assert abs(r.bhattacharyya - bc) < 5e-6
    assert abs(r.hellinger - math.sqrt(max(0.0, 1 - bc))) < 1e-4


def test_t_closeness_matches_python(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "documents").select("lang", "source", "n_chars").collect()
    )
    glob = Counter()
    per = {}
    for r in rows:
        bkt = min(r.n_chars // 500, 7)
        glob[bkt] += 1
        per.setdefault((r.lang, r.source), Counter())[bkt] += 1
    n_tot = len(rows)
    got = {
        (r.lang, r.source): r
        for r in _build(spark, sf_dir, "privacy_t_closeness").collect()
    }
    assert set(got) == set(per)
    def _rha(x):
        import math as _m

        f = _m.floor(abs(x) + 0.5)
        return f if x >= 0 else -f

    for key, cnt in per.items():
        n_g = sum(cnt.values())
        # Round-9 numeric hardening: the operator quantizes per-bucket
        # diffs at the 1e-9 grain (exact integer window cumsum + ssum)
        # — mirror the identical scaled-integer folds.
        cum_int, emd_int = 0, 0
        for bkt in range(8):
            diff = cnt[bkt] / n_g - glob[bkt] / n_tot
            cum_int += int(_rha(diff * 1e9))
            emd_int += int(_rha(abs(cum_int / 1e9) * 1e9))
        emd = (emd_int / 1e9) / 7.0
        r = got[key]
        assert r.n_rows == n_g
        assert abs(r.emd - emd) < 1e-12
        assert r.violates_t == (emd > 0.2)
