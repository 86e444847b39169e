"""Pins for round-7 batch 7: ECE vs a Python recompute, time-travel
snapshot isolation, and pHash near-dup pair structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_ece_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    lo = min(r.n_chars for r in rows)
    hi = max(r.n_chars for r in rows)
    bins = {}
    for r in rows:
        p = (r.n_chars - lo) / (hi - lo)
        b = min(int(p * 10), 9)
        n, sp, pos = bins.get(b, (0, 0.0, 0))
        bins[b] = (n + 1, sp + p, pos + (1 if r.lang == "en" else 0))
    n_tot = len(rows)
    gaps = {b: abs(pos / n - sp / n) for b, (n, sp, pos) in bins.items()}
    ece = sum(bins[b][0] * g for b, g in gaps.items()) / n_tot
    mce = max(gaps.values())
    got = _build(spark, sf_dir, "quality_ece").collect()[0]
    assert got.n == n_tot
    assert got.ece == pytest.approx(ece, abs=1e-6)
    assert got.mce == pytest.approx(mce, abs=1e-9)
    assert 0.0 <= got.ece <= got.mce <= 1.0


def test_time_travel_versions_isolated(spark, sf_dir):
    got = {r.version: (r.n, r.sum_price) for r in
           _build(spark, sf_dir, "scan_manifest_time_travel").collect()}
    od = load(spark, sf_dir, "orders")
    n_all = od.count()
    n_v0 = od.where(F.col("o_orderkey") % 3 != 0).count()
    assert got[0][0] == n_v0
    assert got[1][0] == n_all
    # the appended snapshot strictly grows the table
    assert got[1][0] > got[0][0]
    assert got[1][1] > got[0][1]


def test_phash_near_dup_pairs_are_planted_copies(spark, sf_dir):
    pairs = _build(spark, sf_dir, "multimodal_phash_near_dup").collect()
    docs = load(spark, sf_dir, "documents").select("doc_id").collect()
    planted = {r.doc_id for r in docs if r.doc_id % 25 == 0}
    assert len(pairs) == len(planted)
    for p in pairs:
        # each pair is (original, its re-encoded copy) at exact distance 0
        assert p.b == p.a + 1000000
        assert p.a in planted
        assert p.hamming == 0
