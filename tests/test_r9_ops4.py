"""Round-9 vectors/retrieval/quality/privacy batch (round9_vectors3):
independent pure-Python recompute pins."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries

QUERIES = [
    ("q_join", "hash join merge sort"),
    ("q_stream", "window stream batch"),
    ("q_scan", "vector scan filter"),
]
DISC = [1.0 / math.log2(i + 1) for i in range(1, 11)]


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _rha(x: float) -> int:
    f = math.floor(abs(x) + 0.5)
    return int(f if x >= 0 else -f)


def _ssum(vals, scale=1e6):
    return sum(_rha(v * scale) for v in vals) / scale


@pytest.fixture(scope="module")
def emb(sf_dir):
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def corpus(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return {
        int(d): t.strip().lower().split()
        for d, t in zip(docs.doc_id, docs.text)
    }


def test_sign_hamming_rerank_matches_python(spark, sf_dir, emb):
    vecs = {int(i): list(v) for i, v in zip(emb.vec_id, emb.embedding)}

    def code(v):
        h1 = h2 = 0
        for x in v[:32]:
            h1 = h1 * 2 + (1 if x > 0 else 0)
        for x in v[32:64]:
            h2 = h2 * 2 + (1 if x > 0 else 0)
        return h1, h2

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(x) * float(x) for x in b))
        return d / (na * nb)

    codes = {i: code(v) for i, v in vecs.items()}
    qs = [i for i in vecs if i < 10]
    cs = [i for i in vecs if i >= 10]
    want = {}
    for q in qs:
        qh = codes[q]
        ham = sorted(
            (bin(qh[0] ^ codes[c][0]).count("1")
             + bin(qh[1] ^ codes[c][1]).count("1"), c)
            for c in cs
        )
        short = [c for _, c in ham[:30]]
        rerank = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in short),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        brute = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in cs),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        hits = len({c for _, c in rerank} & {c for _, c in brute})
        want[q] = hits
    got = {
        r.query_id: r
        for r in _build(spark, sf_dir, "ann_sign_hamming_rerank").collect()
    }
    assert set(got) == set(want)
    for q, hits in want.items():
        assert got[q].hits_at5 == hits
        assert got[q].recall_at5 == pytest.approx(hits / 5.0, rel=1e-12)


def test_ndcg_matches_python(spark, sf_dir, corpus):
    tf = {d: Counter(t) for d, t in corpus.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    dl = {d: len(t) for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / float(n)
    k1, b = 1.2, 0.75
    want = {}
    for qid, qtext in QUERIES:
        terms = sorted(set(qtext.strip().lower().split()))
        scores = {}
        grades = {}
        for d, c in tf.items():
            present = [t for t in terms if t in c]
            if not present:
                continue
            grades[d] = len(present)
            s = 0.0
            for t in sorted(present):
                idf = (n - df[t] + 0.5) / (df[t] + 0.5) + 1.0
                s += (
                    idf
                    * (c[t] * (k1 + 1.0))
                    / (c[t] + k1 * (1.0 - b + b * dl[d] / avgdl))
                )
            scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        dcg = _ssum(
            (grades.get(d, 0) * DISC[i] for i, (d, _) in enumerate(ranked)),
            scale=1e9,
        )
        ideal = sorted(grades.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        idcg = _ssum(
            (rel * DISC[i] for i, (_, rel) in enumerate(ideal)), scale=1e9
        )
        want[qid] = (dcg, idcg)
    got = {
        r.query_id: r for r in _build(spark, sf_dir, "retrieval_ndcg_at10").collect()
    }
    assert set(got) == set(want)
    for qid, (dcg, idcg) in want.items():
        assert got[qid].dcg == pytest.approx(dcg, rel=1e-9)
        assert got[qid].idcg == pytest.approx(idcg, rel=1e-9)
        assert got[qid].ndcg == pytest.approx(dcg / idcg, rel=1e-9)
        assert 0.0 < got[qid].ndcg <= 1.0


def _cls_score(tokens):
    s = 0.0
    for t in tokens:
        v = int(hashlib.md5(t.encode()).hexdigest()[:2], 16)
        s += ((v * 2654435761) % 997) / 997.0 - 0.5
    return s


def test_selection_rate_parity_matches_python(spark, sf_dir, corpus):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = dict(zip(docs.doc_id.astype(int), docs.source))
    keep = defaultdict(int)
    tot = defaultdict(int)
    for d, toks in corpus.items():
        tot[src[d]] += 1
        if _cls_score(toks) > 0:
            keep[src[d]] += 1
    rates = {s: keep[s] / tot[s] for s in tot}
    best = max(rates.values())
    got = {
        r.source: r
        for r in _build(
            spark, sf_dir, "quality_selection_rate_parity"
        ).collect()
    }
    assert set(got) == set(rates)
    for s, rate in rates.items():
        r = got[s]
        assert r.n_docs == tot[s] and r.n_keep == keep[s]
        assert r.selection_rate == pytest.approx(rate, rel=1e-9)
        assert r.best_rate == pytest.approx(best, rel=1e-9)
        assert r.impact_ratio == pytest.approx(rate / best, rel=1e-9)
        assert r.passes_four_fifths == (rate / best >= 0.8)


def test_generalization_ladder_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = ev.ts.dt.floor("D")
    epoch_day = (day - pd.Timestamp("1970-01-01")).dt.days

    def stats(qi_user, qi_time):
        g = Counter(zip(qi_user, qi_time))
        total = sum(g.values())
        supp = sum(c for c in g.values() if c < 5)
        return (len(g), min(g.values()), total, supp)

    want = {
        "L0_exact": stats(ev.user_id, day),
        "L1_decade_week": stats(ev.user_id // 10, epoch_day // 7),
        "L2_century_month": stats(ev.user_id // 100, day.dt.to_period("M")),
    }
    got = {
        r.level: r
        for r in _build(
            spark, sf_dir, "privacy_generalization_ladder"
        ).collect()
    }
    assert set(got) == set(want)
    for lv, (ng, mn, total, supp) in want.items():
        r = got[lv]
        assert (r.n_groups, r.min_group) == (ng, mn)
        assert (r.rows_total, r.rows_suppressed) == (total, supp)
        assert r.suppression_fraction == pytest.approx(supp / total, rel=1e-12)
        assert r.k_satisfied == (supp == 0)
    # Generalizing can only merge groups: suppression is monotone
    # non-increasing up the ladder.
    assert (
        got["L2_century_month"].rows_suppressed
        <= got["L1_decade_week"].rows_suppressed
        <= got["L0_exact"].rows_suppressed
    )
