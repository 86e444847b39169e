"""Round-9 engine/scale batch (round9_extras3): independent recompute
pins. The row-group audit is pinned against the DATA itself (actual
min/max/count per group), not a third footer read."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_rank_synopsis_matches_python(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    vals = sorted(
        zip(li.l_extendedprice, li.l_orderkey * 8 + li.l_linenumber)
    )
    n = len(vals)
    syn_ranks = sorted(
        {max(1, math.ceil(i * n / 64)) for i in range(1, 65)}
    )
    bound = math.ceil(n / 64)
    got = {
        r.q: r
        for r in _build(
            spark, sf_dir, "approx_rank_synopsis_quantiles"
        ).collect()
    }
    assert len(got) == 4
    for q in (0.25, 0.5, 0.9, 0.99):
        target = max(1, math.ceil(q * n))
        srank = min(r for r in syn_ranks if r >= target)
        r = got[q]
        assert r.target_rank == target
        assert r.synopsis_rank == srank
        assert r.approx_value == vals[srank - 1][0]
        assert r.exact_value == vals[target - 1][0]
        assert r.rank_error == srank - target
        assert r.within_bound and r.rank_error < bound


def test_concurrency_profile_matches_simulation(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    sessions = []
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        s_ts = None
        prev = None
        for t in grp.ts:
            if prev is None or (
                t.floor("s") - prev.floor("s")
            ).total_seconds() > 1800:
                if s_ts is not None:
                    sessions.append((s_ts, prev))
                s_ts = t
            prev = t
        sessions.append((s_ts, prev))
    per_day = defaultdict(list)
    for s, e in sessions:
        per_day[s.floor("D")].append((s, e))
    want = {}
    for day, ss in per_day.items():
        # order: time asc, starts before ends at ties — encode start
        # as tag 0, end as tag 1 for sorting.
        seq = sorted(
            [(s, 0, i) for i, (s, e) in enumerate(ss)]
            + [(e, 1, i) for i, (s, e) in enumerate(ss)]
        )
        live = peak = 0
        for _, tag, _ in seq:
            live += 1 if tag == 0 else -1
            peak = max(peak, live)
        want[day.date()] = (len(ss), peak)
    got = {
        r.day: (r.n_sessions, r.max_concurrent)
        for r in _build(spark, sf_dir, "events_concurrency_profile").collect()
    }
    assert got == want
    # Peak concurrency is bounded by the day's session count.
    for day, (n, peak) in got.items():
        assert 1 <= peak <= n


def test_rowgroup_stats_match_data(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rows = _build(spark, sf_dir, "scan_rowgroup_stats_audit").collect()
    assert sum(r.num_rows for r in rows) == len(li)
    # Groups partition the file in order: cumulative offsets slice it.
    off = 0
    for r in sorted(rows, key=lambda r: r.row_group_id):
        chunk = li.l_orderkey.iloc[off : off + r.num_rows]
        assert r.min_orderkey == chunk.min()
        assert r.max_orderkey == chunk.max()
        assert r.null_count == int(chunk.isna().sum())
        off += r.num_rows
