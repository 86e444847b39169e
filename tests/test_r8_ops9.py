"""Round-8 multi-entry greedy sweep pins: monotonicity and a full
brute-force walk recompute of the best-entry end states."""

from __future__ import annotations

import math

from sql_engine_spark.io import load
from sql_engine_spark.operators.graph import knn_graph_shared, und_edges
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_entries_sweep_matches_python_walks(spark, sf_dir):
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(emb[a], emb[b]):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    und = und_edges(knn_graph_shared(spark, sf_dir)).collect()
    adj = {}
    for r in und:
        if r.a >= 10 and r.b >= 10:
            adj.setdefault(r.a, set()).add(r.b)
            adj.setdefault(r.b, set()).add(r.a)
    corpus = sorted(i for i in emb if i >= 10)
    queries = sorted(i for i in emb if i < 10)
    entries = corpus[:4]

    def walk(q, start):
        cur, cur_cos = start, cos(q, start)
        for _ in range(3):
            cands = {cur} | adj.get(cur, set())
            # argmax by (cosine desc, id asc)
            cur, cur_cos = min(
                ((c, cos(q, c)) for c in cands),
                key=lambda p: (-p[1], p[0]),
            )
        return cur, cur_cos

    brute = {
        q: max(((c, cos(q, c)) for c in corpus), key=lambda p: (p[1], -p[0]))
        for q in queries
    }
    got = {r.n_entries: r for r in _build(spark, sf_dir, "ann_greedy_entries_sweep").collect()}
    assert set(got) == {1, 2, 4}
    ends = {q: [walk(q, e) for e in entries] for q in queries}
    for ne in (1, 2, 4):
        hits = 0
        regret = 0.0
        for q in queries:
            best = min(ends[q][:ne], key=lambda p: (-p[1], p[0]))
            hits += best[0] == brute[q][0]
            regret += brute[q][1] - best[1]
        r = got[ne]
        assert r.n_queries == len(queries)
        assert r.n_hits == hits
        assert abs(r.hit_rate - hits / len(queries)) < 1e-12
        assert abs(r.mean_regret - regret / len(queries)) < 1e-5
    # Monotone: more entries never hurt (best-over-prefix).
    assert got[1].n_hits <= got[2].n_hits <= got[4].n_hits
    assert got[4].mean_regret <= got[2].mean_regret + 1e-12
    assert got[2].mean_regret <= got[1].mean_regret + 1e-12
