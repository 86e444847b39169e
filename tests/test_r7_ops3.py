"""Independent-recompute pins for the round-7 quality set 2: Spearman
rho, PR-AUC / average precision, the Brier decomposition, and lift
deciles are each re-derived in plain Python from the same parquet and
compared to the operator output (the oracle gate already checks the
cross-engine SQL; these check the MATH)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _midranks(values):
    """Average ranks (1-based) with ties, plain Python."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_spearman_matches_python_recompute(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .collect()
    )
    xs = [r.l_quantity for r in rows]
    ys = [r.l_extendedprice for r in rows]
    rx, ry = _midranks(xs), _midranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    want = cov / math.sqrt(vx * vy)
    got = _build(spark, sf_dir, "agg_spearman_rho").collect()[0]
    assert got.n == n
    assert got.spearman_rho == pytest.approx(want, abs=1e-9)
    assert -1.0 <= got.spearman_rho <= 1.0


def test_pr_auc_matches_python_recompute(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    labeled = [(r.n_chars, 1 if r.lang == "en" else 0) for r in rows]
    n_pos = sum(y for _, y in labeled)
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for s, y in labeled:
        per[s][0] += y
        per[s][1] += 1 - y
    tp = fp = 0
    ap = 0.0
    best_f1, best_thr = -1.0, None
    for s in sorted(per, reverse=True):
        c_pos, c_neg = per[s]
        tp += c_pos
        fp += c_neg
        ap += (c_pos / n_pos) * (tp / (tp + fp))
        f1 = 2.0 * tp / (tp + fp + n_pos)
        if f1 > best_f1 or (f1 == best_f1 and s < best_thr):
            best_f1, best_thr = f1, s
    got = _build(spark, sf_dir, "quality_pr_auc").collect()[0]
    assert got.n_pos == n_pos
    assert got.ap == pytest.approx(ap, abs=1e-6)
    assert got.best_f1_threshold == best_thr
    assert got.best_f1 == pytest.approx(best_f1, abs=1e-9)
    assert 0.0 < got.ap <= 1.0


def test_brier_decomposition_identities(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    lo = min(r.n_chars for r in rows)
    hi = max(r.n_chars for r in rows)
    pys = [((r.n_chars - lo) / (hi - lo), 1 if r.lang == "en" else 0) for r in rows]
    n = len(pys)
    ybar = sum(y for _, y in pys) / n
    brier = sum((p - y) ** 2 for p, y in pys) / n
    from collections import defaultdict

    bins = defaultdict(list)
    for p, y in pys:
        bins[min(int(p * 10), 9)].append((p, y))
    rel = sum(
        len(v) * (sum(p for p, _ in v) / len(v) - sum(y for _, y in v) / len(v)) ** 2
        for v in bins.values()
    ) / n
    res = sum(
        len(v) * (sum(y for _, y in v) / len(v) - ybar) ** 2 for v in bins.values()
    ) / n
    got = _build(spark, sf_dir, "quality_brier_decomposition").collect()[0]
    assert got.n == n
    assert got.base_rate == pytest.approx(ybar, abs=1e-12)
    assert got.brier == pytest.approx(brier, abs=1e-6)
    assert got.reliability == pytest.approx(rel, abs=1e-6)
    assert got.resolution == pytest.approx(res, abs=1e-6)
    assert got.uncertainty == pytest.approx(ybar * (1 - ybar), abs=1e-12)
    # Murphy identity holds up to the within-bin variance term, which
    # is non-negative: brier >= unc - res (rel shifts it back up)
    assert got.brier >= got.uncertainty - got.resolution - 1e-9


def test_lift_deciles_shape_and_totals(spark, sf_dir):
    got = sorted(
        _build(spark, sf_dir, "quality_lift_deciles").collect(),
        key=lambda r: r.decile,
    )
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    n_pos = docs.where(F.col("lang") == "en").count()
    assert [r.decile for r in got] == list(range(10))
    assert sum(r.n_docs for r in got) == n
    assert sum(r.n_pos_dec for r in got) == n_pos
    # equal-mass deciles: sizes differ by at most 1
    sizes = [r.n_docs for r in got]
    assert max(sizes) - min(sizes) <= 1
    last = got[-1]
    assert last.cum_n == n and last.cum_pos == n_pos
    assert last.cum_lift == pytest.approx(1.0, abs=1e-12)
    assert last.capture_rate == pytest.approx(1.0, abs=1e-12)
    # capture_rate is monotone non-decreasing in decile
    caps = [r.capture_rate for r in got]
    assert all(a <= b + 1e-12 for a, b in zip(caps, caps[1:]))
