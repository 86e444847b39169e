"""RM3 expansion (round9_retrieval2): independent pure-Python
recompute of the full two-pass pipeline."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries

QUERIES = [
    ("q_join", "hash join merge sort"),
    ("q_stream", "window stream batch"),
    ("q_scan", "vector scan filter"),
]
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def corpus(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return {
        int(d): t.strip().lower().split()
        for d, t in zip(docs.doc_id, docs.text)
    }


def _bm25_rank(tf, df, dl, n, avgdl, terms, k):
    scores = {}
    for d, c in tf.items():
        present = sorted(t for t in terms if t in c)
        if not present:
            continue
        s = 0.0
        for t in present:
            idf = (n - df[t] + 0.5) / (df[t] + 0.5) + 1.0
            s += (
                idf
                * (c[t] * (K1 + 1.0))
                / (c[t] + K1 * (1.0 - B + B * dl[d] / avgdl))
            )
        scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_rm3_matches_python(spark, sf_dir, corpus):
    tf = {d: Counter(t) for d, t in corpus.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    dl = {d: len(t) for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / float(n)
    want = {}
    for qid, qtext in QUERIES:
        terms = set(qtext.strip().lower().split())
        fb = [d for d, _ in _bm25_rank(tf, df, dl, n, avgdl, terms, 3)]
        cand = Counter()
        for d in fb:
            for t, c in tf[d].items():
                if t not in terms:
                    cand[t] += c
        exp = [
            t
            for t, _ in sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[
                :5
            ]
        ]
        q2 = terms | set(exp)
        ranked2 = _bm25_rank(tf, df, dl, n, avgdl, q2, 10)
        orig10 = {d for d, _ in _bm25_rank(tf, df, dl, n, avgdl, terms, 10)}
        want[qid] = (ranked2, orig10)
    got = {}
    for r in all_queries()["retrieval_rm3_expansion"].build(
        spark, sf_dir
    ).collect():
        got.setdefault(r.query_id, {})[r.rank] = r
    assert set(got) == set(want)
    for qid, (ranked2, orig10) in want.items():
        assert len(got[qid]) == len(ranked2)
        for i, (d, s) in enumerate(ranked2, start=1):
            r = got[qid][i]
            assert r.doc_id == d
            assert r.score == pytest.approx(s, rel=1e-9)
            assert r.in_original_top10 == (d in orig10)
    # The expansion must change SOMETHING somewhere (else the operator
    # is vacuous): at least one query pulls in a doc outside the
    # original top-10 or reorders it.
    assert any(
        not got[qid][i].in_original_top10
        for qid in got
        for i in got[qid]
    ) or any(
        [d for d, _ in want[qid][0]] != sorted(want[qid][1]) for qid in want
    )
