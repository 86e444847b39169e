"""Independent-recompute pins for the round-7 diagnostics: runs test,
Durbin-Watson, modularity (vs a plain-Python recompute on the repo's
own LPA labels), and the QUALIFY desugaring."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_runs_test_matches_python(spark, sf_dir):
    import math

    rows = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("c"))
        .orderBy("day")
        .collect()
    )
    counts = [r.c for r in rows]
    signs = []
    for prev, cur in zip(counts, counts[1:]):
        if cur > prev:
            signs.append(1)
        elif cur < prev:
            signs.append(-1)
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / n
    var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
    got = _build(spark, sf_dir, "agg_runs_test").collect()[0]
    assert (got.n_up, got.n_down, got.runs) == (n1, n2, runs)
    assert got.mu == pytest.approx(mu, abs=1e-9)
    assert got.z == pytest.approx((runs - mu) / math.sqrt(var), abs=1e-9)


def test_durbin_watson_matches_python(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("ybar"))
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append((r.day.toordinal(), r.ybar))
    got = {r.event_type: r for r in _build(spark, sf_dir, "agg_durbin_watson").collect()}
    assert sorted(got) == sorted(series)
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        xs = [x for x, _ in pts]
        ys = [y for _, y in pts]
        mx, my = sum(xs) / n, sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        slope = sxy / sxx
        e = [y - (my + slope * (x - mx)) for x, y in pts]
        dw = sum((a - b) ** 2 for a, b in zip(e[1:], e)) / sum(v * v for v in e)
        assert got[et].n_days == n
        # daily means differ in summation path; DW is a smooth ratio
        assert got[et].dw == pytest.approx(dw, rel=1e-6)
        assert 0.0 <= got[et].dw <= 4.0


def test_modularity_matches_python_on_lpa_labels(spark, sf_dir):
    # r8: the graph family standardized on the SHARED build
    # (planes=4, tables=4, k=5 — operators/graph.knn_graph_shared)
    from sql_engine_spark.operators.graph import knn_graph_shared

    g = knn_graph_shared(spark, sf_dir)
    edges = {
        (min(r.src, r.dst), max(r.src, r.dst)) for r in g.collect()
    }
    labels = {
        r.node: r.label
        for r in _build(spark, sf_dir, "graph_label_propagation").collect()
    }
    m = len(edges)
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    e_c = defaultdict(int)
    for a, b in edges:
        if labels[a] == labels[b]:
            e_c[labels[a]] += 1
    d_c = defaultdict(int)
    for node, lab in labels.items():
        d_c[lab] += deg[node]
    q_num = 4 * m * sum(e_c.values()) - sum(v * v for v in d_c.values())
    got = _build(spark, sf_dir, "graph_modularity").collect()[0]
    assert got.m == m
    assert got.n_communities == len(d_c)
    assert got.q_num_x4m2 == q_num
    assert got.modularity == pytest.approx(q_num / (4 * m * m), abs=1e-12)
    assert -0.5 <= got.modularity <= 1.0


def test_qualify_matches_python_filter(spark, sf_dir):
    got = _build(spark, sf_dir, "window_qualify").collect()
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).collect()
    per = defaultdict(list)
    for r in orders:
        per[r.o_custkey].append((-r.o_totalprice, r.o_orderkey))
    want = set()
    for ck, lst in per.items():
        lst.sort()
        n = len(lst)
        for i, (_, ok) in enumerate(lst):
            pr = 0.0 if n == 1 else i / (n - 1)
            if i < 2 or pr >= 0.9:
                want.add((ck, ok))
    assert {(r.o_custkey, r.o_orderkey) for r in got} == want
    # every kept row carries consistent window columns
    for r in got:
        assert r.rn <= 2 or r.pr >= 0.9
