"""Round-9 quality/monitoring batch (round9_quality2): independent
recompute pins. The noise screen recomputes from the shared graph's
edge list (the graph build itself is pinned by the r8 graph tests)."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_label_noise_candidates_match_python(spark, sf_dir):
    from sql_engine_spark.operators.graph import knn_graph_shared

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    labels = dict(zip(emb.vec_id.astype(int), emb.label.astype(int)))
    edges = [
        (r.src, r.dst) for r in knn_graph_shared(spark, sf_dir).collect()
    ]
    agg = defaultdict(lambda: [0, 0])
    for s, d in edges:
        agg[s][0] += 1
        if labels[d] != labels[s]:
            agg[s][1] += 1
    got = {
        r.vec_id: r
        for r in _build(spark, sf_dir, "emb_label_noise_candidates").collect()
    }
    assert set(got) == set(agg)
    for v, (n, dis) in agg.items():
        r = got[v]
        assert r.label == labels[v]
        assert (r.n_neighbors, r.n_disagree) == (n, dis)
        assert r.is_candidate == (dis >= 4)


def test_ewma_control_chart_matches_python(spark, sf_dir, events):
    d = events.copy()
    d["day"] = d.ts.dt.floor("D")
    daily = d.groupby("day").size().sort_index()
    cnts = [float(c) for c in daily.values]
    n = len(cnts)
    s = sum(int(c) for c in daily.values)
    ss = sum(int(c) * int(c) for c in daily.values)
    center = s / n
    half = 3.0 * math.sqrt((ss - s * s / n) / (n - 1)) * math.sqrt(1.0 / 3.0)
    got = {r.day: r for r in _build(spark, sf_dir, "events_ewma_control_chart").collect()}
    assert len(got) == n
    for i, (day, cnt) in enumerate(zip(daily.index, cnts)):
        vals = cnts[max(0, i - 15) : i + 1]
        num = den = 0.0
        for x in vals:
            num = num * 0.5 + x
            den = den * 0.5 + 1.0
        ewma = num / den
        r = got[day.date()]
        assert r.cnt == int(cnt)
        assert r.ewma == ewma  # halving fold is exact
        assert r.center == pytest.approx(center, rel=1e-12)
        assert r.lcl == pytest.approx(center - half, rel=1e-12)
        assert r.ucl == pytest.approx(center + half, rel=1e-12)
        assert r.out_of_control == (
            ewma < r.lcl or ewma > r.ucl
        )


def test_bot_regularity_matches_python(spark, sf_dir, events):
    want = {}
    for uid, grp in events.groupby("user_id"):
        ts = sorted(zip(grp.ts, grp.event_id))
        gaps = [
            int(
                (b[0].floor("s") - a[0].floor("s")).total_seconds()
            )
            for a, b in zip(ts, ts[1:])
        ]
        n = len(gaps)
        s = sum(gaps)
        if n >= 10 and s > 0:
            ss = sum(g * g for g in gaps)
            mean = s / n
            var = (ss - s * s / n) / (n - 1)
            cv2 = var / (mean * mean)
            want[int(uid)] = (n, mean, cv2)
    got = {
        r.user_id: r
        for r in _build(spark, sf_dir, "events_bot_regularity_flags").collect()
    }
    assert set(got) == set(want)
    for uid, (n, mean, cv2) in want.items():
        r = got[uid]
        assert r.n_gaps == n
        assert r.mean_gap_s == pytest.approx(mean, rel=1e-12)
        assert r.cv2 == pytest.approx(cv2, rel=1e-12)
        assert r.bot_like == (cv2 < 0.1)
