"""Pins for round-7 batch 6: skyline dominance law vs a Python
recompute, and systematic-sampling stride/coverage invariants."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_skyline_dominance_law(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    pts = {}
    for r in docs:
        tk = [t for t in r.text.lower().strip().split() if t]
        if tk:
            pts[r.doc_id] = (len(tk), len(set(tk)) / len(tk))
    got = {r.doc_id: (r.n_tokens, r.distinct_ratio) for r in
           _build(spark, sf_dir, "curation_skyline_2d").collect()}

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and (a[0] > b[0] or a[1] > b[1])

    sky = {
        d: p
        for d, p in pts.items()
        if not any(dominates(q, p) for q in pts.values())
    }
    assert got == sky
    # frontier points are mutually non-dominating
    vals = list(got.values())
    for i, a in enumerate(vals):
        for b in vals[i + 1 :]:
            assert not dominates(a, b) and not dominates(b, a)
    # the frontier is non-trivial on this data
    assert len(got) >= 5


def test_systematic_sample_stride_and_coverage(spark, sf_dir):
    rows = sorted(
        _build(spark, sf_dir, "sample_systematic").collect(), key=lambda r: r.rk
    )
    docs = load(spark, sf_dir, "documents").select("doc_id").collect()
    n = len(docs)
    k = max(1, math.ceil(n / 100))
    assert [r.rk for r in rows] == list(range(1, n + 1, k))
    assert len(rows) == math.ceil(n / k)
    # ranks follow the md5 hash order exactly
    order = sorted(
        (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id) for r in docs
    )
    for r in rows:
        assert order[r.rk - 1][1] == r.doc_id
