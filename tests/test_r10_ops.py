"""Round-10 operator pins: independent Python recomputation of the new
math operators on the sf0.001 fixture — the third leg beside the Spark
build and the DuckDB oracle (the r9 test pattern). A bug shared by both
engines' SQL spellings (the oracle gate's blind spot) breaks here.
"""

from __future__ import annotations

import duckdb
import pytest

from sql_engine_spark.registry import all_queries
from sql_engine_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _rows(spark, name):
    return all_queries()[name].build(spark, SF_DIR).collect()


def _daily_counts():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS x
            FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    return rows


def test_ordinal_patterns_recompute(spark):
    xs = [x for _, x in _daily_counts()]
    census: dict[str, int] = {}
    for a, b, c in zip(xs, xs[1:], xs[2:]):
        if a <= b and b <= c:
            p = "012"
        elif a <= c and c < b:
            p = "021"
        elif b < a and a <= c:
            p = "102"
        elif c < a and a <= b:
            p = "120"
        elif b <= c and c < a:
            p = "201"
        else:
            p = "210"
        census[p] = census.get(p, 0) + 1
    got = {r.pattern: r.n for r in _rows(spark, "events_ordinal_patterns")}
    assert got == census


def test_sampen_recompute(spark):
    xs = [float(x) for _, x in _daily_counts()]
    n = len(xs)
    mean = sum(xs) / n
    sd = (
        (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    ) ** 0.5
    r = 0.2 * sd
    b = a = 0
    for i in range(n - 2):
        for j in range(i + 1, n - 2):
            d2 = max(abs(xs[i] - xs[j]), abs(xs[i + 1] - xs[j + 1]))
            d3 = max(d2, abs(xs[i + 2] - xs[j + 2]))
            if d2 <= r:
                b += 1
            if d3 <= r:
                a += 1
    row = _rows(spark, "events_sampen_ratio")[0]
    assert (row.b_matches, row.a_matches) == (b, a)
    assert row.n == n


def test_heaps_doubling_recompute(spark):
    import math

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    n = len(docs)
    seen: set[str] = set()
    growth = []  # vocab after each doc
    import re

    for _, text in docs:
        seen.update(t for t in re.split(r"\s+", text.strip().lower()) if t)
        growth.append(len(seen))
    got = {
        r.k: (r.n_docs_prefix, r.vocab)
        for r in _rows(spark, "text_heaps_doubling")
    }
    for k in range(5):
        cut = math.ceil(n / 2 ** (4 - k))
        assert got[k] == (cut, growth[cut - 1])


def test_croston_recompute(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS d
            FROM '{SF_DIR}/events.parquet'
            WHERE value > 150.0 GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    con.close()
    series: dict[str, list] = {}
    for et, day, d in rows:
        series.setdefault(et, []).append((day, d))

    def ewma_half(vals):
        vals = vals[-16:]
        num = 0.0
        den = 0.0
        for v in vals:
            num = num * 0.5 + float(v)
            den = den * 0.5 + 1.0
        return num / den

    got = {r.event_type: r for r in _rows(spark, "events_croston_forecast")}
    for et, pts in series.items():
        ds = [d for _, d in pts]
        qs = [1] + [
            (pts[i][0] - pts[i - 1][0]).days for i in range(1, len(pts))
        ]
        z, p = ewma_half(ds), ewma_half(qs)
        r = got[et]
        assert r.n_demand_days == len(pts)
        assert r.z == pytest.approx(z, abs=0, rel=0)  # halving is exact
        assert r.p == pytest.approx(p, abs=0, rel=0)
        assert r.croston_forecast == z / p


def test_neyman_allocation_recompute(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    strata: dict[str, list[int]] = {}
    for lang, nc in rows:
        strata.setdefault(lang, []).append(nc)
    got = {r.lang: r for r in _rows(spark, "sample_neyman_allocation")}
    masses = {}
    for lang, xs in strata.items():
        n = len(xs)
        sd = (
            (n * sum(float(x) * float(x) for x in xs) - float(sum(xs)) ** 2)
            / (n * (n - 1))
        ) ** 0.5
        masses[lang] = (n, sd)
        assert got[lang].n_h == n
        assert got[lang].sd_h == pytest.approx(sd, rel=1e-12)
    total = sum(n * sd for n, sd in masses.values())
    for lang, (n, sd) in masses.items():
        assert got[lang].weight == pytest.approx(n * sd / total, rel=1e-9)
        assert got[lang].n_alloc == round(1000.0 * n * sd / total + 1e-12)


def test_equalized_odds_recompute(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT source, lang, n_chars FROM '{SF_DIR}/documents.parquet'
            ORDER BY n_chars, doc_id"""
    ).fetchall()
    con.close()
    n = len(rows)
    thresh = rows[(n + 1) // 2 - 1][2]
    per = {}
    gt = gp = bt = bp = 0  # global true-pos etc.
    for source, lang, nc in rows:
        y = 1 if lang == "en" else 0
        yhat = 1 if nc >= thresh else 0
        d = per.setdefault(source, [0, 0, 0, 0])  # tp, pos, fp, neg
        d[0] += y * yhat
        d[1] += y
        d[2] += (1 - y) * yhat
        d[3] += 1 - y
        gt += y * yhat
        gp += y
        bt += (1 - y) * yhat
        bp += 1 - y
    tpr_all, fpr_all = gt / gp, bt / bp
    got = {r.source: r for r in _rows(spark, "quality_equalized_odds_gap")}
    for source, (tp, pos, fp, neg) in per.items():
        r = got[source]
        assert (r.n_pos, r.n_neg) == (pos, neg)
        assert r.tpr == pytest.approx(tp / pos, rel=1e-12)
        assert r.eo_gap == pytest.approx(
            max(abs(tp / pos - tpr_all), abs(fp / neg - fpr_all)), rel=1e-9
        )


def test_triplet_margins_nonneg_counts(spark):
    rows = _rows(spark, "emb_triplet_mining")
    assert rows, "triplet mining returned nothing"
    for r in rows:
        assert 0 <= r.n_hard <= r.n_triplets
        assert 0 <= r.n_semi_hard <= r.n_triplets


def test_residual_quantize_stage2_tighter(spark):
    rows = _rows(spark, "emb_residual_quantize")
    assert rows
    # Stage 2 must never increase distortion; on real vectors it should
    # reduce it by orders of magnitude for nearly all rows.
    assert all(r.sse2 <= r.sse1 + 1e-12 for r in rows)
    improved = sum(1 for r in rows if r.sse1 > 0 and r.residual_ratio < 0.01)
    assert improved >= 0.9 * len(rows)
