"""Round-9 engine-surface batch (round9_engine2): recompute pins."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_variant_json_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = {
        int(e): json.loads(p).get("k")
        for e, p in zip(ev.event_id, ev.props)
    }
    got = {r.event_id: r for r in _build(spark, sf_dir, "scalar_variant_json").collect()}
    assert set(got) == set(want)
    for e, k in want.items():
        r = got[e]
        assert r.k == k
        assert r.k_decade == (None if k is None else k // 10)
        assert r.missing_is_null is True


def test_union_by_name_realigns_columns(spark, sf_dir):
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    want = {
        (int(r.n_nationkey), r.n_name, int(r.n_regionkey))
        for _, r in nat[nat.n_regionkey.isin([0, 1])].iterrows()
    }
    rows = _build(spark, sf_dir, "setop_union_by_name").collect()
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in rows}
    # By-name resolution: every row keeps its true column values even
    # though the second branch projected them in reversed order.
    assert got == want


def test_nulls_placement_grid(spark, sf_dir):
    rows = {r.tag: r for r in _build(spark, sf_dir, "order_nulls_placement").collect()}
    # ASC NULLS LAST: 1, 2, 3, NULL(b), NULL(d)
    order = sorted(rows.values(), key=lambda r: r.rn_asc_nulls_last)
    assert [r.tag for r in order] == ["c", "e", "a", "b", "d"]
    # ASC NULLS FIRST: NULL(b), NULL(d), 1, 2, 3
    order = sorted(rows.values(), key=lambda r: r.rn_asc_nulls_first)
    assert [r.tag for r in order] == ["b", "d", "c", "e", "a"]
    # DESC NULLS LAST: 3, 2, 1, NULL(b), NULL(d)
    order = sorted(rows.values(), key=lambda r: r.rn_desc_nulls_last)
    assert [r.tag for r in order] == ["a", "e", "c", "b", "d"]
