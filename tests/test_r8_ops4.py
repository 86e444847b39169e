"""Round-8 graph-set-2 pins: each diagnostic recomputed independently
in pure Python (brute force) from the SAME shared kNN edge relation /
raw embeddings the operators consume."""

from __future__ import annotations

import math
from collections import Counter

from sql_engine_spark.io import load
from sql_engine_spark.operators.graph import knn_graph_shared, und_edges
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _und(spark, sf_dir):
    rows = und_edges(knn_graph_shared(spark, sf_dir)).collect()
    return {(r.a, r.b) for r in rows}


def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _triangles(edges):
    adj = _adj(edges)
    tris = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    return tris


def test_hubness_audit_matches_python(spark, sf_dir):
    g = knn_graph_shared(spark, sf_dir).collect()
    ids = [r.vec_id for r in load(spark, sf_dir, "embeddings").select("vec_id").collect()]
    indeg = Counter(r.dst for r in g)
    ds = [indeg.get(i, 0) for i in ids]
    n = len(ds)
    mu = sum(ds) / n
    m2 = sum(d * d for d in ds) / n - mu * mu
    m3 = (
        sum(d**3 for d in ds) / n
        - 3 * mu * (sum(d * d for d in ds) / n)
        + 2 * mu**3
    )
    r = _build(spark, sf_dir, "graph_hubness_audit").collect()[0]
    assert r.n_nodes == n
    assert r.n_edges == len(g)
    assert r.max_in_degree == max(ds)
    assert r.n_orphans == sum(1 for d in ds if d == 0)
    assert abs(r.mean_in_degree - mu) < 1e-12
    assert abs(r.var_in_degree - m2) < 1e-9
    assert abs(r.skew_in_degree - m3 / (m2 * math.sqrt(m2))) < 1e-9


def test_transitivity_matches_brute_force(spark, sf_dir):
    edges = _und(spark, sf_dir)
    tris = _triangles(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    r = _build(spark, sf_dir, "graph_transitivity_global").collect()[0]
    assert r.n_edges == len(edges)
    assert r.n_triangles == len(tris)
    assert r.n_wedges == wedges
    assert abs(r.transitivity - 3.0 * len(tris) / wedges) < 1e-12


def test_rich_club_matches_brute_force(spark, sf_dir):
    edges = _und(spark, sf_dir)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {r.k: r for r in _build(spark, sf_dir, "graph_rich_club").collect()}
    for k in (1, 2, 3, 4):
        rich = {u for u, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in rich and b in rich)
        r = got[k]
        assert r.n_k == len(rich)
        assert r.e_k == ek
        if len(rich) >= 2:
            assert abs(r.phi - 2.0 * ek / (len(rich) * (len(rich) - 1))) < 1e-12


def test_ktruss_support_matches_brute_force(spark, sf_dir):
    edges = _und(spark, sf_dir)
    adj = _adj(edges)
    support = Counter()
    for a, b in edges:
        support[(a, b)] = len(adj[a] & adj[b])
    hist = Counter(support.values())
    got = {r.support: r for r in _build(spark, sf_dir, "graph_ktruss_support").collect()}
    assert {s: r.n_edges for s, r in got.items()} == dict(hist)
    # Descending cumulative is consistent.
    total = 0
    for s in sorted(got, reverse=True):
        total += got[s].n_edges
        assert got[s].n_edges_ge == total


def _dsum(xs):
    """Replicate functions/numeric.dsum: each addend rounds to 6
    decimals (DECIMAL(27,6)) before an exact sum."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    return float(
        sum(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP) for x in xs)
    )


def test_davies_bouldin_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            np.array(r.embedding, dtype=np.float64)
        )
    # Mirror the operator's DECIMAL-exact folds: dsum per dim for the
    # centroid, dsum of squared deviations per vector, dsum of
    # distances per label.
    cents = {
        lb: np.array(
            [_dsum(v[d] for v in vs) / len(vs) for d in range(len(vs[0]))]
        )
        for lb, vs in by_label.items()
    }
    dists = {
        lb: [math.sqrt(_dsum((v - cents[lb]) ** 2)) for v in vs]
        for lb, vs in by_label.items()
    }
    scat = {lb: _dsum(ds) / len(ds) for lb, ds in dists.items()}
    labels = sorted(by_label)
    sep = {
        (i, j): math.sqrt(_dsum((cents[i] - cents[j]) ** 2))
        for i in labels
        for j in labels
        if i != j
    }
    r_is = [
        max((scat[i] + scat[j]) / sep[(i, j)] for j in labels if j != i)
        for i in labels
    ]
    want = _dsum(r_is) / len(labels)
    r = _build(spark, sf_dir, "emb_davies_bouldin").collect()[0]
    assert r.n_clusters == len(labels)
    assert abs(r.davies_bouldin - want) < 1e-9
