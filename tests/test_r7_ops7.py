"""Pins for round-7 batch 5: streaming as-of convergence to the batch
operator, burstiness vs a Python recompute, and attribution credit-mass
conservation."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_streaming_asof_converges_to_batch(spark, sf_dir):
    batch = {
        r.event_id: (r.asof_ts, r.asof_event_id)
        for r in _build(spark, sf_dir, "asof_join_events").collect()
    }
    stream = {
        r.event_id: (r.asof_ts, r.asof_event_id)
        for r in _build(spark, sf_dir, "streaming_asof_enrich").collect()
    }
    assert stream == batch
    # both matched and unmatched purchases occur
    assert any(v[0] is not None for v in batch.values())


def test_burstiness_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n = len(docs)
    per_tok = defaultdict(list)
    for r in docs:
        c = Counter(t for t in r.text.lower().strip().split() if t)
        for t, k in c.items():
            per_tok[t].append(k)
    stats = {
        t: (sum(cs), sum(x * x for x in cs), len(cs)) for t, cs in per_tok.items()
    }
    top = sorted(stats, key=lambda t: (-stats[t][0], t))[:20]
    got = {r.token: r for r in _build(spark, sf_dir, "text_burstiness").collect()}
    assert sorted(got) == sorted(top)
    for t in top:
        total, sum_c2, df = stats[t]
        r = got[t]
        assert (r.total_count, r.doc_freq) == (total, df)
        want = (n * sum_c2 - total * total) / (n * total)
        assert r.vmr == pytest.approx(want, abs=1e-12)
        # zeros included: VMR is at least the Poisson floor minus mean
        assert r.vmr > 0.0


def test_attribution_position_conserves_credit(spark, sf_dir):
    rows = _build(spark, sf_dir, "events_attribution_position").collect()
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    first_purchase = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        if r.event_type == "purchase" and r.user_id not in first_purchase:
            first_purchase[r.user_id] = (r.ts, r.event_id)
    journeys = defaultdict(list)
    for r in ev:
        fp = first_purchase.get(r.user_id)
        if fp and r.event_type != "purchase" and (r.ts, r.event_id) < fp:
            journeys[r.user_id].append((r.ts, r.event_id, r.event_type))
    want_credit = defaultdict(float)
    want_n = Counter()
    for u, lst in journeys.items():
        lst.sort()
        L = len(lst)
        for i, (_, _, et) in enumerate(lst):
            if L == 1:
                c = 1.0
            elif L == 2:
                c = 0.5
            elif i == 0 or i == L - 1:
                c = 0.4
            else:
                c = 0.2 / (L - 2)
            want_credit[et] += c
            want_n[et] += 1
    got = {r.event_type: r for r in rows}
    assert sorted(got) == sorted(want_credit)
    for et in want_credit:
        assert got[et].n_touches == want_n[et]
        assert got[et].total_credit == pytest.approx(want_credit[et], abs=1e-6)
    # credit mass = number of users with a non-empty pre-purchase journey
    assert sum(r.total_credit for r in rows) == pytest.approx(
        len(journeys), abs=1e-6
    )
