"""Round-9 text/events batch (round9_text2): independent recompute
pins. The boilerplate detector additionally gets a SYNTHETIC
positive-case dataset (the real corpus has LCP 0 everywhere, which
would leave the nonzero path untested)."""

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


def _py_boilerplate(rows):
    by_src = defaultdict(list)
    for src, text in rows:
        by_src[src].append(text.strip().lower().split())
    want = {}
    for src, docs in by_src.items():
        lcp = 0
        for i in range(min(20, min(len(d) for d in docs))):
            if len({d[i] for d in docs}) == 1:
                lcp += 1
            else:
                break
        prefix = " ".join(docs[0][:lcp])
        want[src] = (len(docs), lcp, prefix)
    return want


def test_boilerplate_prefix_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = _py_boilerplate(list(zip(docs.source, docs.text)))
    got = {
        r.source: (r.n_docs, r.lcp, r.prefix_text)
        for r in _build(spark, sf_dir, "text_boilerplate_prefix").collect()
    }
    assert got == want


def test_boilerplate_prefix_detects_synthetic_template(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bp")
    rows = [
        (0, "copyright acme corp all rights reserved hello world", "en", "tpl", 50),
        (1, "copyright acme corp all rights reserved goodbye moon", "en", "tpl", 52),
        (2, "copyright acme corp all rights reserved another doc here", "en", "tpl", 55),
        (3, "free text one", "en", "raw", 13),
        (4, "free prose two", "en", "raw", 14),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(root / "documents.parquet")
    got = {
        r.source: (r.n_docs, r.lcp, r.prefix_text)
        for r in _build(spark, str(root), "text_boilerplate_prefix").collect()
    }
    assert got["tpl"] == (3, 6, "copyright acme corp all rights reserved")
    assert got["raw"] == (2, 1, "free")


def test_circular_hour_stats_matches_python(spark, sf_dir, events):
    hours = events.ts.dt.hour
    n_h = hours.value_counts().to_dict()
    n = len(hours)
    c_sum = _ssum(
        cnt * math.cos(2.0 * math.pi * h / 24.0) for h, cnt in n_h.items()
    )
    s_sum = _ssum(
        cnt * math.sin(2.0 * math.pi * h / 24.0) for h, cnt in n_h.items()
    )
    r_bar = math.sqrt(c_sum * c_sum + s_sum * s_sum) / n
    z = n * r_bar * r_bar
    row = _build(spark, sf_dir, "events_circular_hour_stats").collect()[0]
    assert row.n == n
    assert row.c_sum == pytest.approx(c_sum, rel=1e-9, abs=1e-6)
    assert row.s_sum == pytest.approx(s_sum, rel=1e-9, abs=1e-6)
    assert row.r_bar == pytest.approx(r_bar, rel=1e-9, abs=1e-12)
    assert row.rayleigh_z == pytest.approx(z, rel=1e-9, abs=1e-9)
    assert row.nonuniform_hours == (z > 2.995732273553991)
    assert 0.0 <= row.r_bar <= 1.0


def test_attribution_sweep_matches_pandas(spark, sf_dir, events):
    per = {}
    for uid, grp in events.groupby("user_id"):
        v = grp.loc[grp.event_type == "view", "ts"].min()
        p = grp.loc[grp.event_type == "purchase", "ts"].min()
        if pd.notna(v):
            per[uid] = (v, p)
    want = {}
    for w in (1, 3, 7, 14):
        conv = sum(
            1
            for v, p in per.values()
            if pd.notna(p) and v <= p <= v + pd.Timedelta(days=w)
        )
        want[w] = (len(per), conv)
    got = {
        r.w_days: r
        for r in _build(
            spark, sf_dir, "events_attribution_window_sweep"
        ).collect()
    }
    assert set(got) == set(want)
    prev = -1
    for w in sorted(want):
        n, conv = want[w]
        r = got[w]
        assert (r.n_viewers, r.n_converted) == (n, conv)
        assert r.conversion_rate == pytest.approx(conv / n, rel=1e-12)
        # Wider windows can only add conversions.
        assert r.n_converted >= prev
        prev = r.n_converted
