"""Pins for round-7 batch 9: SRM identity and Welch vs a Python
recompute."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_srm_matches_python(spark, sf_dir):
    users = {
        r.user_id
        for r in load(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    n_a = sum(1 for u in users if u % 2 == 0)
    n_b = len(users) - n_a
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    got = _build(spark, sf_dir, "events_ab_srm_check").collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    assert got.chi2 == pytest.approx(chi2, abs=1e-12)
    assert got.srm_detected == (chi2 > 3.841458820694124)
    # two-cell chi2 equals the classic (O-E)^2/E sum with E = n/2
    e = (n_a + n_b) / 2
    assert chi2 == pytest.approx((n_a - e) ** 2 / e + (n_b - e) ** 2 / e, abs=1e-9)


def test_welch_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select("event_type", "value").collect()
    a = [r.value for r in rows if r.event_type == "purchase"]
    b = [r.value for r in rows if r.event_type == "click"]
    m1, m2 = sum(a) / len(a), sum(b) / len(b)
    v1 = sum((x - m1) ** 2 for x in a) / (len(a) - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (len(b) - 1)
    se1, se2 = v1 / len(a), v2 / len(b)
    t = (m1 - m2) / math.sqrt(se1 + se2)
    dof = (se1 + se2) ** 2 / (se1**2 / (len(a) - 1) + se2**2 / (len(b) - 1))
    got = _build(spark, sf_dir, "agg_welch_ttest").collect()[0]
    assert (got.n1, got.n2) == (len(a), len(b))
    assert got.m1 == pytest.approx(m1, rel=1e-9)
    assert got.m2 == pytest.approx(m2, rel=1e-9)
    assert got.t == pytest.approx(t, rel=1e-6)
    assert got.dof == pytest.approx(dof, rel=1e-6)
    # Welch dof is bounded by the two classical extremes
    assert min(len(a), len(b)) - 1 <= got.dof <= len(a) + len(b) - 2
