"""Round-9 final stats pair + the fleet streaming twin: independent
recompute pins and the exact batch-convergence check."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _rha(x: float) -> int:
    f = math.floor(abs(x) + 0.5)
    return int(f if x >= 0 else -f)


def _ssum(vals, scale=1e6):
    return sum(_rha(v * scale) for v in vals) / scale


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_randomization_test_matches_python(spark, sf_dir, events):
    users = {
        int(uid): _ssum(grp.value)
        for uid, grp in events.groupby("user_id")
    }
    t = [m for u, m in users.items() if u % 2 == 1]
    c = [m for u, m in users.items() if u % 2 == 0]
    obs = _ssum(t) / len(t) - _ssum(c) / len(c)
    n_extreme = 0
    for b in range(1, 201):
        a1, a0 = [], []
        for u, m in users.items():
            hv = int(
                hashlib.md5(f"{u}|{b}".encode()).hexdigest()[:12], 16
            )
            (a1 if hv % 2 == 1 else a0).append(m)
        if a1 and a0:
            diff = _ssum(a1) / len(a1) - _ssum(a0) / len(a0)
            if abs(diff) >= abs(obs):
                n_extreme += 1
    row = _build(spark, sf_dir, "events_randomization_test").collect()[0]
    assert row.n_users == len(users)
    assert row.obs_diff == pytest.approx(obs, rel=1e-9)
    assert row.n_draws == 200
    assert row.n_extreme == n_extreme
    assert row.p_value == pytest.approx((n_extreme + 1) / 201.0, rel=1e-12)
    assert 0.0 < row.p_value <= 1.0


def test_tukey_hsd_matches_python(spark, sf_dir, events):
    g = defaultdict(list)
    for et, v in zip(events.event_type, events.value):
        g[et].append(v)
    stats = {
        et: (len(vs), _ssum(vs), _ssum(v * v for v in vs))
        for et, vs in g.items()
    }
    mse = _ssum(
        (ss - s * s / n for n, s, ss in stats.values()), scale=1e9
    ) / (sum(n for n, _, _ in stats.values()) - len(stats))
    got = {
        (r.type_a, r.type_b): r
        for r in _build(spark, sf_dir, "agg_tukey_hsd_pairs").collect()
    }
    keys = sorted(stats)
    want_pairs = {
        (a, b) for i, a in enumerate(keys) for b in keys[i + 1 :]
    }
    assert set(got) == want_pairs
    for (ta, tb), r in got.items():
        na, sa, _ = stats[ta]
        nb, sb, _ = stats[tb]
        ma, mb = sa / na, sb / nb
        se = math.sqrt((mse / 2.0) * (1.0 / na + 1.0 / nb))
        q = abs(ma - mb) / se
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.mean_a == pytest.approx(ma, rel=1e-9)
        assert r.mean_b == pytest.approx(mb, rel=1e-9)
        assert r.mse == pytest.approx(mse, rel=1e-9)
        assert r.q_stat == pytest.approx(q, rel=1e-9)
        assert r.significant == (q > 3.858)


def test_streaming_seasonal_anomaly_converges_to_batch(spark, sf_dir):
    batch = {
        r.day: r for r in _build(spark, sf_dir, "events_seasonal_anomaly").collect()
    }
    live = {
        r.day: r
        for r in _build(spark, sf_dir, "streaming_seasonal_anomaly").collect()
    }
    assert set(live) == set(batch)
    for d, r in live.items():
        b = batch[d]
        assert (r.cnt, r.is_anomaly) == (b.cnt, b.is_anomaly)
        assert r.remainder == b.remainder
        assert r.mad_scaled == b.mad_scaled
