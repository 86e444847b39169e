"""Round-8 engine-set pins: recursion, spectral, seasonal-strength,
readability, and aHash/dHash recomputed independently in pure Python."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_recursive_month_spine_is_dense_and_counts_match(spark, sf_dir):
    rows = load(spark, sf_dir, "orders").select("o_orderdate").collect()
    mis = [r.o_orderdate.year * 12 + r.o_orderdate.month for r in rows]
    counts = Counter(mis)
    got = sorted(
        _build(spark, sf_dir, "cte_recursive_month_spine").collect(),
        key=lambda r: r.month_index,
    )
    # Dense spine from min to max, gaps as zero rows.
    assert [r.month_index for r in got] == list(range(min(mis), max(mis) + 1))
    for r in got:
        assert r.n_orders == counts.get(r.month_index, 0)
        assert r.month == (12 if r.month_index % 12 == 0 else r.month_index % 12)


def test_try_funcs_null_contract(spark, sf_dir):
    got = _build(spark, sf_dir, "scalar_try_funcs").collect()
    assert len(got) > 0
    for r in got:
        assert r.pri_int is None  # '1-URGENT' never parses as INT
        assert r.pri_digit is not None  # leading digit always does
        assert (r.price_per_mod is None) == (r.o_orderkey % 5 == 0)
        assert r.overflow_null is None


def _daily(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select("ts").collect()
    import datetime

    c = Counter((r.ts.date() - datetime.date(1970, 1, 1)).days for r in rows)
    return dict(c)


def test_spectral_power_matches_python(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    n = len(daily)
    mean = sum(daily.values()) / n
    got = {r.period: r for r in _build(spark, sf_dir, "events_spectral_power").collect()}
    for p in (7, 30):
        sc = sum((c - mean) * math.cos(2 * math.pi * (d % p) / p) for d, c in daily.items())
        ss = sum((c - mean) * math.sin(2 * math.pi * (d % p) / p) for d, c in daily.items())
        r = got[p]
        assert r.n_days == n
        assert abs(r.sc - sc) < 1e-3
        assert abs(r.ss - ss) < 1e-3
        assert abs(r.power - (r.sc**2 + r.ss**2) / n**2) < 1e-9


def test_seasonal_strength_matches_python(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    n = len(daily)
    gmean = sum(daily.values()) / n
    dow = {}
    for d, c in daily.items():
        dow.setdefault(d % 7, []).append(c)
    dmean = {k: sum(v) / len(v) for k, v in dow.items()}
    det = sum((c - gmean) ** 2 for c in daily.values())
    rem = sum((c - dmean[d % 7]) ** 2 for d, c in daily.items())
    want = max(0.0, 1 - rem / det)
    r = _build(spark, sf_dir, "events_seasonal_strength").collect()[0]
    assert r.n_days == n
    assert abs(r.ss_detrended - det) < 1e-2
    assert abs(r.ss_remainder - rem) < 1e-2
    assert abs(r.seasonal_strength - want) < 1e-6


def _doc_stats(text):
    words = re.findall(r"[a-z]+", text.lower())
    sentences = max(len(re.findall(r"[.!?]+", text)), 1)
    return words, sentences


def test_lix_rix_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("source", "text").collect()
    agg = {}
    for r in rows:
        words, sents = _doc_stats(r.text)
        w, lw = len(words), sum(1 for x in words if len(x) > 6)
        a = agg.setdefault(r.source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += lw
        a[3] += sents
    got = {r.source: r for r in _build(spark, sf_dir, "text_lix_rix").collect()}
    assert set(got) == set(agg)
    for src, (nd, w, lw, s) in agg.items():
        r = got[src]
        assert (r.n_docs, r.words, r.long_words, r.sentences) == (nd, w, lw, s)
        assert abs(r.lix - (w / s + 100.0 * lw / w)) < 1e-9
        assert abs(r.rix - lw / s) < 1e-12


def test_smog_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("source", "text").collect()
    agg = {}
    for r in rows:
        words, sents = _doc_stats(r.text)
        poly = sum(1 for w in words if len(re.findall(r"[aeiou]+", w)) >= 3)
        a = agg.setdefault(r.source, [0, 0])
        a[0] += poly
        a[1] += sents
    got = {r.source: r for r in _build(spark, sf_dir, "text_smog_grade").collect()}
    for src, (poly, s) in agg.items():
        r = got[src]
        assert (r.polysyllables, r.sentences) == (poly, s)
        want = 1.0430 * math.sqrt(poly * 30.0 / s) + 3.1291
        assert abs(r.smog_grade - want) < 1e-9


def test_ahash_dhash_match_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {r.doc_id: r for r in _build(spark, sf_dir, "multimodal_ahash_dhash").collect()}
    assert set(got) == {r.doc_id for r in rows}
    for r in rows[:50]:
        digests = [
            hashlib.md5(f"{r.text}#{c}".encode()).digest() for c in range(4)
        ]
        grid = [digests[p // 16][p % 16] for p in range(64)]
        s = sum(grid)
        ahash = sum(
            1 << p for p in range(63) if 64 * grid[p] > s
        )
        nbits_a = sum(1 for p in range(63) if 64 * grid[p] > s)
        dhash = 0
        nbits_d = 0
        for i in range(8):
            for j in range(7):
                if grid[8 * i + j] < grid[8 * i + j + 1]:
                    dhash |= 1 << (7 * i + j)
                    nbits_d += 1
        g = got[r.doc_id]
        assert (g.ahash, g.n_bits_a, g.dhash, g.n_bits_d) == (
            ahash,
            nbits_a,
            dhash,
            nbits_d,
        )


def test_group_by_all_matches_manual_grouping(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in _build(spark, sf_dir, "select_group_by_all").collect()
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).collect()
    agg = {}
    for r in li:
        k = (r.l_returnflag, r.l_linestatus)
        n, q = agg.get(k, (0, 0.0))
        agg[k] = (n + 1, q + r.l_quantity)
    want = sorted((k[0], k[1], n, q) for k, (n, q) in agg.items())
    assert [(a, b, n) for a, b, n, _ in got] == [
        (a, b, n) for a, b, n, _ in want
    ]
    for (_, _, _, gq), (_, _, _, wq) in zip(got, want):
        assert abs(gq - wq) < 1e-3


def test_named_window_clause_consistency(spark, sf_dir):
    rows = _build(spark, sf_dir, "window_named_clause").collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for ck, rs in by_cust.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        assert all(r.n_orders == len(rs) for r in rs)
        # running spend is nondecreasing (prices are positive)
        for a, b in zip(rs, rs[1:]):
            assert b.running_spend >= a.running_spend
