"""Round-9 final stats batch (round9_stats6): independent recompute
pins. The median polish is simulated sweep-by-sweep in pure-integer
Python; the ensemble and placebo recompute from pandas."""

from __future__ import annotations

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


def _lomed(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_median_polish_matches_simulation(spark, sf_dir, events):
    days = sorted(events.ts.dt.floor("D").unique())
    counts = defaultdict(int)
    for t in events.ts:
        counts[(t.floor("D"), t.hour)] += 1
    grid = {(d, h): counts.get((d, h), 0) for d in days for h in range(24)}
    resid = dict(grid)
    day_eff = defaultdict(int)
    hour_eff = defaultdict(int)
    for _ in range(2):
        for d in days:
            m = _lomed([resid[(d, h)] for h in range(24)])
            day_eff[d] += m
            for h in range(24):
                resid[(d, h)] -= m
        for h in range(24):
            m = _lomed([resid[(d, h)] for d in days])
            hour_eff[h] += m
            for d in days:
                resid[(d, h)] -= m
    got = {
        (r.day, r.hour): r
        for r in _build(spark, sf_dir, "agg_median_polish").collect()
    }
    assert len(got) == len(grid)
    for (d, h), x in grid.items():
        r = got[(d.date(), h)]
        assert r.x == x
        assert r.day_effect == day_eff[d]
        assert r.hour_effect == hour_eff[h]
        assert r.residual == resid[(d, h)]
    # The decomposition is exact: x == day + hour + residual + implicit 0
    # only up to the polish's common term; check additivity of changes:
    for (d, h), x in grid.items():
        r = got[(d.date(), h)]
        assert x - r.day_effect - r.hour_effect == r.residual


def test_forecast_ensemble_matches_python(spark, sf_dir, events):
    d = events.copy()
    d["day"] = d.ts.dt.floor("D")
    daily = d.groupby("day").size().sort_index()
    cnts = [int(c) for c in daily.values]
    n = len(cnts)
    maes = {}
    # test days are 1-indexed i in (n-7, n]
    errs = {"naive": [], "seasonal_naive": [], "moving_average": []}
    for i in range(n - 7 + 1, n + 1):
        actual = cnts[i - 1]
        errs["naive"].append(abs(actual - cnts[i - 2]))
        errs["seasonal_naive"].append(abs(actual - cnts[i - 8]))
        ma = sum(cnts[i - 15 : i - 1]) / 14.0
        errs["moving_average"].append(abs(actual - ma))
    maes["naive"] = sum(errs["naive"]) / 7.0
    maes["seasonal_naive"] = sum(errs["seasonal_naive"]) / 7.0
    maes["moving_average"] = _ssum(errs["moving_average"]) / 7.0
    nxt = {
        "naive": float(cnts[n - 1]),
        "seasonal_naive": float(cnts[n - 7]),
        "moving_average": sum(cnts[n - 14 : n]) / 14.0,
    }
    iv = {m: 1.0 / (1.0 + maes[m]) for m in maes}
    tot = iv["naive"] + iv["seasonal_naive"] + iv["moving_average"]
    got = {
        r.model: r
        for r in _build(
            spark, sf_dir, "events_forecast_ensemble_backtest"
        ).collect()
    }
    assert set(got) == {"naive", "seasonal_naive", "moving_average", "ensemble"}
    ens = 0.0
    for m in maes:
        r = got[m]
        assert r.mae == pytest.approx(maes[m], rel=1e-9)
        assert r.weight == pytest.approx(iv[m] / tot, rel=1e-9)
        assert r.next_forecast == pytest.approx(nxt[m], rel=1e-12)
        ens += (iv[m] / tot) * nxt[m]
    assert got["ensemble"].mae is None
    assert got["ensemble"].weight == 1.0
    assert got["ensemble"].next_forecast == pytest.approx(ens, rel=1e-9)


def test_did_placebo_matches_python(spark, sf_dir, events):
    min_day = events.ts.dt.floor("D").min()
    max_day = events.ts.dt.floor("D").max()
    span = (max_day - min_day).days
    off = (events.ts.dt.floor("D") - min_day).dt.days
    pre = events[2 * off < span].copy()
    pre_off = (pre.ts.dt.floor("D") - min_day).dt.days
    pspan = int(pre_off.max())
    cells = defaultdict(list)
    for uid, o, v in zip(pre.user_id, pre_off, pre.value):
        cells[(int(uid) % 2, int(2 * o >= pspan))].append(v)
    mean = {
        k: _ssum(vs) / len(vs) for k, vs in cells.items()
    }
    dt = mean[(1, 1)] - mean[(1, 0)]
    dc = mean[(0, 1)] - mean[(0, 0)]
    row = _build(spark, sf_dir, "events_did_placebo_pretrends").collect()[0]
    assert row.n_t1 == len(cells[(1, 1)]) and row.n_c0 == len(cells[(0, 0)])
    assert row.delta_treated == pytest.approx(dt, rel=1e-9)
    assert row.delta_control == pytest.approx(dc, rel=1e-9)
    assert row.placebo_did == pytest.approx(dt - dc, rel=1e-9)
