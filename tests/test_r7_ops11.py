"""Pins for round-7 batch 8: covariance matrix vs a Python recompute,
and temperature-mixture share laws."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries

_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_covariance_matrix_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "lineitem").select(*_COLS).collect()
    n = len(rows)
    means = {c: sum(getattr(r, c) for r in rows) / n for c in _COLS}
    got = {(r.x, r.y): r.cov for r in
           _build(spark, sf_dir, "agg_covariance_matrix").collect()}
    assert len(got) == 10
    for a in range(4):
        for b in range(a, 4):
            ca, cb = _COLS[a], _COLS[b]
            want = (
                sum(
                    (getattr(r, ca) - means[ca]) * (getattr(r, cb) - means[cb])
                    for r in rows
                )
                / n
            )
            assert got[(ca, cb)] == pytest.approx(want, rel=1e-5, abs=1e-9)
    # diagonal entries are variances: non-negative
    for c in _COLS:
        assert got[(c, c)] >= 0.0


def test_temperature_mixture_laws(spark, sf_dir):
    rows = _build(spark, sf_dir, "curation_temperature_mixture").collect()
    per = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    counts = {r.source: r.n for r in per}
    n_tot = sum(counts.values())
    z = sum(math.sqrt(v) for v in counts.values())
    assert {r.source for r in rows} == set(counts)
    for r in rows:
        assert r.n_docs == counts[r.source]
        assert r.raw_share == pytest.approx(counts[r.source] / n_tot, abs=1e-12)
        assert r.smoothed_share == pytest.approx(
            math.sqrt(counts[r.source]) / z, abs=1e-9
        )
    # both share columns are distributions
    assert sum(r.raw_share for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r.smoothed_share for r in rows) == pytest.approx(1.0, abs=1e-9)
    # smoothing boosts below-average sources, damps above-average ones
    avg = n_tot / len(counts)
    for r in rows:
        if r.n_docs < avg:
            assert r.upsample_factor > 1.0
        if r.n_docs > avg:
            assert r.upsample_factor < 1.0
