"""Round-11 operator pins: independent Python recomputation on the
sf0.001 fixture — the third leg beside the Spark build and the DuckDB
oracle (the r9/r10 test pattern). A bug shared by both engines' SQL
spellings (the oracle gate's blind spot) breaks here.
"""

from __future__ import annotations

import duckdb
import pytest

from sql_engine_spark.registry import all_queries
from sql_engine_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
_PPS_M = 100


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _rows(spark, name):
    return all_queries()[name].build(spark, SF_DIR).collect()


def _fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# sample_pps_systematic
# ---------------------------------------------------------------------------


def _pps_expected():
    docs = _fetch(
        f"SELECT doc_id, CAST(n_chars AS BIGINT) FROM "
        f"'{SF_DIR}/documents.parquet' ORDER BY doc_id"
    )
    total = sum(s for _, s in docs)
    # Selection points u_k = (2k+1) * T / (2m); doc i (interval
    # [prev, cum)) is hit by every k with prev <= u_k < cum.
    expected = {}
    cum = 0
    for doc_id, s in docs:
        prev, cum = cum, cum + s
        hits = 0
        for k in range(_PPS_M):
            # integer comparison: prev <= (2k+1)T/(2m) < cum
            num = (2 * k + 1) * total
            if 2 * prev * _PPS_M <= num < 2 * cum * _PPS_M:
                hits += 1
        if hits:
            expected[doc_id] = (s, cum, hits)
    return expected


def test_pps_systematic_recompute(spark):
    got = {
        r["doc_id"]: (r["n_chars"], r["cum_chars"], r["n_hits"])
        for r in _rows(spark, "sample_pps_systematic")
    }
    assert got == _pps_expected()


def test_pps_systematic_hits_sum_to_m(spark):
    # Every selection point lands in exactly one [prev, cum) interval.
    assert (
        sum(r["n_hits"] for r in _rows(spark, "sample_pps_systematic"))
        == _PPS_M
    )


# ---------------------------------------------------------------------------
# text_kneser_ney_bigram
# ---------------------------------------------------------------------------


def _kn_expected():
    import re
    from collections import Counter

    docs = _fetch(f"SELECT text FROM '{SF_DIR}/documents.parquet'")
    bc: Counter = Counter()
    for (text,) in docs:
        toks = re.split(r"\s+", text.strip().lower())
        for w1, w2 in zip(toks, toks[1:]):
            bc[(w1, w2)] += 1
    c_w1: Counter = Counter()
    n1p_fw: Counter = Counter()
    n1p_bw: Counter = Counter()
    for (w1, w2), c in bc.items():
        c_w1[w1] += c
        n1p_fw[w1] += 1
        n1p_bw[w2] += 1
    n1p_all = len(bc)
    top = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = {}
    for (w1, w2), c in top:
        # EXACT expression-order mirror of both engines' doubles
        p_cont = n1p_bw[w2] / n1p_all
        p_kn = ((c - 0.75) / c_w1[w1]) + (
            ((0.75 * n1p_fw[w1]) / c_w1[w1]) * (n1p_bw[w2] / n1p_all)
        )
        out[(w1, w2)] = (c, c_w1[w1], n1p_fw[w1], n1p_bw[w2], p_cont, p_kn)
    return out


def test_kneser_ney_recompute(spark):
    got = {
        (r["w1"], r["w2"]): (
            r["c_bigram"],
            r["c_w1"],
            r["n1p_fw"],
            r["n1p_bw"],
            r["p_cont"],
            r["p_kn"],
        )
        for r in _rows(spark, "text_kneser_ney_bigram")
    }
    assert got == _kn_expected()


def test_kneser_ney_probability_bounds(spark):
    for r in _rows(spark, "text_kneser_ney_bigram"):
        assert 0.0 < r["p_kn"] <= 1.0
        assert 0.0 < r["p_cont"] <= 1.0


# ---------------------------------------------------------------------------
# emb_matryoshka_edge_distortion
# ---------------------------------------------------------------------------


def test_matryoshka_distortion_recompute(spark):
    import math

    edges = [
        (r["src"], r["dst"], r["cosine"])
        for r in _rows(spark, "ann_knn_graph")
    ]
    vecs = {
        vid: list(e)
        for vid, e in _fetch(
            "SELECT vec_id, list_transform(embedding, x -> CAST(x AS "
            f"DOUBLE)) FROM '{SF_DIR}/embeddings.parquet'"
        )
    }

    def cos_d(a, b, d):
        dot = na = nb = 0.0
        for i in range(d):
            dot += a[i] * b[i]
            na += a[i] * a[i]
            nb += b[i] * b[i]
        return dot / (math.sqrt(na) * math.sqrt(nb))

    expected = {}
    for d in (16, 32):
        acc = 0
        mx = 0.0
        for s, t, full in edges:
            err = abs(cos_d(vecs[s], vecs[t], d) - full)
            # ssum semantics: round(x*1e9) half-away-from-zero, int sum
            acc += int(math.floor(err * 1e9 + 0.5))
            mx = max(mx, err)
        expected[d] = (len(edges), acc / 1e9, mx)
    got = {
        r["d"]: (r["n_edges"], r["abs_err_sum"], r["max_abs_err"])
        for r in _rows(spark, "emb_matryoshka_edge_distortion")
    }
    for d in (16, 32):
        n_g, s_g, m_g = got[d]
        n_e, s_e, m_e = expected[d]
        assert n_g == n_e
        assert s_g == pytest.approx(s_e, abs=2e-9)
        assert m_g == pytest.approx(m_e, rel=0, abs=1e-12)
    # Coarser truncation cannot distort less in aggregate on this data.
    assert got[16][1] >= got[32][1]


# ---------------------------------------------------------------------------
# dedup_crossmodal_candidate_audit
# ---------------------------------------------------------------------------


def test_crossmodal_audit_recompute(spark):
    from collections import Counter

    from sql_engine_spark.operators.similarity import plane_vals
    from sql_engine_spark.queries.dedup import _XM_PLANES, _XM_TABLES

    vecs = _fetch(
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        f" FROM '{SF_DIR}/embeddings.parquet'"
    )
    planes = {
        j: plane_vals(j, 64) for j in range(_XM_TABLES * _XM_PLANES)
    }
    expected = {}
    for t in range(_XM_TABLES):
        buckets: Counter = Counter()
        for _vid, e in vecs:
            bits = []
            for j in range(t * _XM_PLANES, (t + 1) * _XM_PLANES):
                dot = sum(x * p for x, p in zip(e, planes[j]))
                bits.append("1" if dot >= 0 else "0")
            buckets["".join(bits)] += 1
        expected[t] = (
            len(buckets),
            max(buckets.values()),
            sum(n * (n - 1) // 2 for n in buckets.values()),
        )
    got = {
        r["t"]: (r["n_buckets"], r["max_bucket"], r["cand_pairs"])
        for r in _rows(spark, "dedup_crossmodal_candidate_audit")
    }
    assert got == expected
