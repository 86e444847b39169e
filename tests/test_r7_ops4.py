"""Pins for the round-7 extras: ANY/ALL quantifier semantics, harmonic
centrality vs a plain-Python BFS, Flesch-Kincaid vs a Python `re`
recompute, and the streaming CDC view's exact convergence to the batch
change-log apply."""

from __future__ import annotations

import re
from collections import deque

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_any_all_quantifier_semantics(spark, sf_dir):
    rows = {r.c_custkey: r for r in _build(spark, sf_dir, "subquery_any_all").collect()}
    orders = {}
    for r in (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        orders.setdefault(r.o_custkey, []).append(r.o_totalprice)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").collect()
    assert len(rows) == len(cust)
    saw_empty = False
    for c in cust:
        got = rows[c.c_custkey]
        own = orders.get(c.c_custkey, [])
        if not own:
            saw_empty = True
            # ALL over the empty set is TRUE, ANY over it is FALSE
            assert got.beats_all_orders is True
            assert got.below_some_order is False
        else:
            assert got.beats_all_orders == (c.c_acctbal > max(own))
            assert got.below_some_order == (c.c_acctbal < max(own))
    assert saw_empty  # the empty-set leg is actually exercised


def test_harmonic_centrality_matches_python_bfs(spark, sf_dir):
    from sql_engine_spark.operators.similarity import knn_graph

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    adj: dict[int, set[int]] = {}
    for r in g.collect():
        a, b = min(r.src, r.dst), max(r.src, r.dst)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {r.seed: r for r in _build(spark, sf_dir, "graph_harmonic_centrality").collect()}
    seeds = [n for n in adj if n < 5]
    assert sorted(got) == sorted(seeds)
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 3:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        c = [0, 0, 0, 0]
        for d in dist.values():
            if d > 0:
                c[d] += 1
        r = got[s]
        assert (r.c1, r.c2, r.c3) == (c[1], c[2], c[3])
        assert r.harmonic_x6 == 6 * c[1] + 3 * c[2] + 2 * c[3]


def test_readability_matches_python_re(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    agg: dict[str, list[int]] = {}
    for r in docs:
        w = len(re.findall(r"[a-z]+", r.text.lower()))
        s = max(len(re.findall(r"[.!?]+", r.text)), 1)
        y = len(re.findall(r"[aeiou]+", r.text.lower()))
        a = agg.setdefault(r.source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    got = {r.source: r for r in _build(spark, sf_dir, "text_readability").collect()}
    assert sorted(got) == sorted(agg)
    for src, (n, w, s, y) in agg.items():
        r = got[src]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (n, w, s, y)
        want = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
        assert r.fk_grade == pytest.approx(want, abs=1e-9)


def test_streaming_cdc_converges_to_batch(spark, sf_dir):
    batch = {
        r.o_orderstatus: (r.n, r.sum_price)
        for r in _build(spark, sf_dir, "pipeline_cdc_apply").collect()
    }
    stream = {
        r.o_orderstatus: (r.n, r.sum_price)
        for r in _build(spark, sf_dir, "streaming_cdc_apply").collect()
    }
    assert stream == batch
    assert len(batch) > 0
