"""Pins for the round-7 vector set 2: MMR greedy selection re-derived
in plain Python, and PQ distortion invariants + a numpy recompute."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_mmr_matches_python_greedy(spark, sf_dir):
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    queries = sorted(v for v in vecs if v < 10)
    corpus = sorted(v for v in vecs if v >= 10)
    got = {}
    for r in _build(spark, sf_dir, "ann_mmr_rerank").collect():
        got[(r.query_id, r.slot)] = r
    for q in queries:
        rel = {c: _cos(vecs[q], vecs[c]) for c in corpus}
        pool = sorted(corpus, key=lambda c: (-rel[c], c))[:8]
        selected = []
        for slot in range(1, 4):
            best, best_score = None, None
            for c in pool:
                if c in selected:
                    continue
                maxsim = max(
                    (_cos(vecs[c], vecs[s]) for s in selected), default=0.0
                )
                score = 0.7 * rel[c] - 0.3 * maxsim
                if best is None or score > best_score + 1e-12 or (
                    abs(score - best_score) <= 1e-12 and c < best
                ):
                    best, best_score = c, score
            selected.append(best)
            r = got[(q, slot)]
            assert r.neighbor_id == best
            assert r.relevance == pytest.approx(rel[best], abs=1e-9)
            if slot == 1:
                assert r.mmr_score == pytest.approx(0.7 * rel[best], abs=1e-9)
            else:
                assert r.mmr_score == pytest.approx(best_score, abs=1e-9)
        # diversity: the three slots are distinct candidates
        assert len(set(selected)) == 3


def test_pq_distortion_invariants_and_recompute(spark, sf_dir):
    import numpy as np

    rows = sorted(
        _build(spark, sf_dir, "emb_pq_distortion").collect(), key=lambda r: r.m
    )
    assert [r.m for r in rows] == list(range(8))
    n0 = rows[0].n_vectors
    for r in rows:
        assert r.n_vectors == n0
        assert 0.0 <= r.mean_err <= r.max_err + 1e-12
        # normalized slices and unit sub-centroid slices are both inside
        # the unit ball, so the squared error is at most (1+1)^2
        assert r.max_err <= 4.0
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    corpus_ids = sorted(v for v in emb if v >= 10)
    assert n0 == len(corpus_ids)
    units = {v: emb[v] / np.linalg.norm(emb[v]) for v in corpus_ids}
    seeds = [units[v] for v in corpus_ids[:16]]
    m = 3  # one representative subspace
    cents = [s[m * 8 : (m + 1) * 8] for s in seeds]
    errs = []
    for v in corpus_ids:
        sl_raw = emb[v][m * 8 : (m + 1) * 8]
        dots = [float(np.dot(sl_raw, c)) for c in cents]
        j = max(range(16), key=lambda i: (dots[i], -i))
        nv = units[v][m * 8 : (m + 1) * 8]
        errs.append(float(np.sum((nv - cents[j]) ** 2)))
    assert rows[m].mean_err == pytest.approx(sum(errs) / len(errs), rel=1e-6)
    assert rows[m].max_err == pytest.approx(max(errs), rel=1e-9)
