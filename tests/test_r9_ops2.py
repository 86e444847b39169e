"""Round-9 late batch (round9_extras2): independent pure-Python
recompute pins — the house bar is BOTH a DuckDB oracle and a recompute
pin per operator."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries

H48_M = 16**12


def _h48(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_bloom_prune_matches_python(spark, sf_dir, lineitem):
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    build = set(sup.loc[sup.s_acctbal > 4500.0, "s_suppkey"])
    bits = set()
    for k in build:
        hv = _h48(k)
        bits.add(hv % 4096)
        bits.add((hv // 4096) % 4096)
    cand = 0
    match = 0
    rev = 0.0
    for k, px, dc in zip(
        lineitem.l_suppkey, lineitem.l_extendedprice, lineitem.l_discount
    ):
        hv = _h48(k)
        if hv % 4096 in bits and (hv // 4096) % 4096 in bits:
            cand += 1
            if k in build:
                match += 1
                rev += px * (1.0 - dc)
    row = _build(spark, sf_dir, "join_bloom_prune").collect()[0]
    assert row.probe_rows == len(lineitem)
    assert row.bloom_candidates == cand
    assert row.true_matches == match
    assert row.false_positive_rows == cand - match
    assert row.bits_set == len(bits)
    assert row.matched_revenue == pytest.approx(rev, rel=1e-9)
    # The Bloom never loses a true match (exactness contract).
    assert row.bloom_candidates >= row.true_matches


def test_lateral_topn_matches_python(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    want = set()
    for ck, grp in orders.groupby("o_custkey"):
        if ck >= 50:
            continue
        top = grp.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(2)
        for _, r in top.iterrows():
            want.add((ck, r.o_orderkey, r.o_totalprice))
    got = {
        (r.c_custkey, r.o_orderkey, r.o_totalprice)
        for r in _build(spark, sf_dir, "select_lateral_topn").collect()
    }
    assert got == want


def test_distinct_predicates_truth_table(spark, sf_dir):
    rows = {
        (r.a, r.b): r
        for r in _build(spark, sf_dir, "scalar_distinct_predicates").collect()
    }
    assert rows[(None, None)].is_distinct is False
    assert rows[(None, None)].is_not_distinct is True
    assert rows[(None, None)].coalesce_ab == -1
    assert rows[(None, 1)].is_distinct is True
    assert rows[(None, 1)].coalesce_ab == 1
    assert rows[(None, 1)].greatest_ab == 1  # NULL-skipping convention
    assert rows[(1, None)].least_ab == 1
    assert rows[(1, 1)].nullif_ab is None
    assert rows[(1, 2)].nullif_ab == 1
    assert rows[(1, 2)].is_distinct is True
    assert rows[(1, 2)].greatest_ab == 2 and rows[(1, 2)].least_ab == 1


def _interleave8(x: int, y: int) -> int:
    z = 0
    for i in range(8):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_clustering_matches_python(spark, sf_dir, lineitem):
    li = lineitem
    max_p, max_s = int(li.l_partkey.max()), int(li.l_suppkey.max())
    rows = []
    for ok, ln, pk, sk in zip(
        li.l_orderkey, li.l_linenumber, li.l_partkey, li.l_suppkey
    ):
        x8 = (int(pk) * 256) // (max_p + 1)
        y8 = (int(sk) * 256) // (max_s + 1)
        rows.append((int(ok), int(ln), int(pk), int(sk), _interleave8(x8, y8)))
    lin_order = sorted(rows, key=lambda r: (r[0], r[1]))
    z_order = sorted(rows, key=lambda r: (r[4], r[0], r[1]))

    def stats(order):
        files = {}
        for i, r in enumerate(order):
            files.setdefault(i // 500, []).append(r)
        vol = 0
        hit = 0
        for rs in files.values():
            mnp = min(r[2] for r in rs)
            mxp = max(r[2] for r in rs)
            mns = min(r[3] for r in rs)
            mxs = max(r[3] for r in rs)
            vol += (mxp - mnp + 1) * (mxs - mns + 1)
            if mnp <= max_p // 4 and mns <= max_s // 4:
                hit += 1
        return len(files), vol, hit

    want = {"linear": stats(lin_order), "zorder": stats(z_order)}
    got = {
        r.strategy: (r.n_files, r.envelope_volume, r.probe_files_hit)
        for r in _build(
            spark, sf_dir, "maintenance_zorder_clustering"
        ).collect()
    }
    assert got == want
    # The point of z-ordering: tighter two-dimensional envelopes.
    assert got["zorder"][1] <= got["linear"][1]


def test_kmv_intersection_matches_python(spark, sf_dir, events):
    a = set(events.loc[events.event_type == "purchase", "user_id"])
    b = set(events.loc[events.event_type == "click", "user_id"])
    ah = {_h48(u) for u in a}
    bh = {_h48(u) for u in b}
    union_h = sorted(ah | bh)
    bottom = union_h[:64]
    k_used = len(bottom)
    h_k = max(bottom)
    k_both = sum(1 for h in bottom if h in ah and h in bh)
    union_est = (
        float(k_used) if k_used < 64 else (64.0 - 1.0) * (float(H48_M) / h_k)
    )
    jac = k_both / k_used
    row = _build(spark, sf_dir, "approx_kmv_intersection").collect()[0]
    assert row.k_used == k_used and row.h_k == h_k and row.k_both == k_both
    assert row.union_est == pytest.approx(union_est, rel=1e-12)
    assert row.jaccard_est == pytest.approx(jac, rel=1e-12)
    assert row.inter_est == pytest.approx(jac * union_est, rel=1e-12)
    assert row.exact_union == len(a | b)
    assert row.exact_inter == len(a & b)


def test_priority_sample_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pri = []
    for d, w in zip(docs.doc_id, docs.n_chars):
        u = (_h48(d) + 1.0) / float(H48_M)
        pri.append((int(d), int(w), float(w) / u))
    pri.sort(key=lambda t: (-t[2], t[0]))
    k = 100
    tau = pri[k][2] if len(pri) > k else 0.0
    want = {
        d: (w, q, max(float(w), tau)) for d, w, q in pri[:k]
    }
    rows = _build(spark, sf_dir, "sample_priority_weighted").collect()
    assert len(rows) == min(k, len(pri))
    for r in rows:
        w, q, wh = want[r.doc_id]
        assert r.weight == w
        assert r.priority == pytest.approx(q, rel=1e-12)
        assert r.w_hat == pytest.approx(wh, rel=1e-12)
        assert r.exact_total == int(docs.n_chars.sum())
    # DLT estimator sanity: unbiased, so at this scale within 3x.
    est = rows[0].est_total
    assert 0 < est < 3.0 * rows[0].exact_total
