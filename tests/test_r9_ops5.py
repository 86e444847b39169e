"""Round-9 causal/experimentation batch (round9_stats4): independent
recompute pins. The Granger pin fits both models with numpy's lstsq
(not the operator's closed forms); the Siegel-Tukey pin CONSTRUCTS the
alternating rank sequence by simulation rather than re-spelling the
depth formula."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_granger_matches_numpy(spark, sf_dir, events):
    d = events.copy()
    d["day"] = d.ts.dt.floor("D")
    g = d.groupby("day").agg(
        y=("event_type", lambda s: (s == "purchase").sum()),
        x=("event_type", lambda s: (s == "click").sum()),
    ).sort_index()
    y = g.y.values[1:].astype(float)
    y1 = g.y.values[:-1].astype(float)
    x1 = g.x.values[:-1].astype(float)
    n = len(y)
    Xr = np.column_stack([np.ones(n), y1])
    Xf = np.column_stack([np.ones(n), y1, x1])
    br, sse_r = np.linalg.lstsq(Xr, y, rcond=None)[0], None
    sse_r = float(((y - Xr @ br) ** 2).sum())
    bf = np.linalg.lstsq(Xf, y, rcond=None)[0]
    sse_f = float(((y - Xf @ bf) ** 2).sum())
    f_stat = (sse_r - sse_f) / (sse_f / (n - 3))
    row = _build(spark, sf_dir, "events_granger_lag1").collect()[0]
    assert row.n_used == n
    assert row.b_lag_y == pytest.approx(bf[1], rel=1e-6)
    assert row.b_lag_x == pytest.approx(bf[2], rel=1e-6)
    assert row.sse_r == pytest.approx(sse_r, rel=1e-6)
    assert row.sse_f == pytest.approx(sse_f, rel=1e-6)
    assert row.f_stat == pytest.approx(f_stat, rel=1e-5)
    # Adding a regressor can only reduce the residual sum of squares.
    assert row.sse_f <= row.sse_r + 1e-9


def test_siegel_tukey_matches_simulation(spark, sf_dir, events):
    sub = events[events.event_type.isin(["purchase", "click"])]
    ordered = sorted(zip(sub.value, sub.event_id, sub.event_type))
    n = len(ordered)
    work = list(range(n))
    if n % 2 == 1:
        work.remove((n + 1) // 2 - 1)  # drop the middle position
    # Construct the alternating assignment: 1 -> min; 2,3 -> the two
    # maxes; 4,5 -> the next two mins; ... (Siegel & Tukey 1960).
    lo, hi = 0, len(work) - 1
    ranks = {}
    r = 1
    take_low, burst = True, 1
    while lo <= hi:
        for _ in range(burst):
            if lo > hi:
                break
            if take_low:
                ranks[work[lo]] = r
                lo += 1
            else:
                ranks[work[hi]] = r
                hi -= 1
            r += 1
        take_low = not take_low
        burst = 2
    w_a = sum(
        ranks[i]
        for i in ranks
        if ordered[i][2] == "purchase"
    )
    n_a = sum(1 for i in ranks if ordered[i][2] == "purchase")
    n_b = sum(1 for i in ranks if ordered[i][2] == "click")
    u_a = w_a - n_a * (n_a + 1) // 2
    z = (u_a - n_a * n_b / 2.0) / np.sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)
    row = _build(spark, sf_dir, "agg_siegel_tukey").collect()[0]
    assert (row.n_a, row.n_b, row.w_a, row.u_a) == (n_a, n_b, w_a, u_a)
    assert row.z_stat == pytest.approx(z, rel=1e-12)


def test_qini_matches_pandas(spark, sf_dir, events):
    split = pd.Timestamp("2024-01-16")
    rows = []
    for uid, grp in events.groupby("user_id"):
        conv = int(
            (grp.event_type == "purchase").sum()
            > (grp.event_type == "view").sum()
        )
        score = int((grp.ts < split).sum())
        rows.append((int(uid), int(uid % 2), conv, score))
    rows.sort(key=lambda t: (-t[3], t[0]))
    n = len(rows)
    per = {}
    for rk, (uid, treated, conv, _) in enumerate(rows):
        dec = (rk * 10) // n + 1
        e = per.setdefault(dec, [0, 0, 0, 0])
        if treated:
            e[0] += 1
            e[1] += conv
        else:
            e[2] += 1
            e[3] += conv
    got = {
        r.decile: r
        for r in _build(spark, sf_dir, "events_qini_uplift_deciles").collect()
    }
    assert set(got) == set(per)
    cum = [0, 0, 0, 0]
    for dec in sorted(per):
        n_t, conv_t, n_c, conv_c = per[dec]
        cum = [a + b for a, b in zip(cum, per[dec])]
        r = got[dec]
        assert (r.n_t, r.conv_t, r.n_c, r.conv_c) == tuple(per[dec])
        if n_t > 0 and n_c > 0:
            assert r.uplift == pytest.approx(
                conv_t / n_t - conv_c / n_c, rel=1e-12
            )
        else:
            assert r.uplift is None
        if cum[2] > 0:
            assert r.qini == pytest.approx(
                cum[1] - cum[3] * (cum[0] / cum[2]), rel=1e-12
            )
        else:
            assert r.qini is None
