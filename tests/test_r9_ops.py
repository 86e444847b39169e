"""Round-9 retrieval family: independent pure-Python recompute pins
(the house bar — every operator has BOTH a DuckDB oracle and a
recompute pin) plus the shared-index build contract."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from sql_engine_spark.registry import all_queries

QUERIES = [
    ("q_join", "hash join merge sort"),
    ("q_stream", "window stream batch"),
    ("q_scan", "vector scan filter"),
]


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {r.doc_id: r.text.strip().lower().split() for r in rows}


def _index(corpus):
    tf = {d: Counter(toks) for d, toks in corpus.items()}
    df = Counter()
    for d, c in tf.items():
        df.update(c.keys())
    dl = {d: len(toks) for d, toks in corpus.items()}
    return tf, df, dl


def test_bm25_index_shared_matches_python(spark, sf_dir, corpus):
    from sql_engine_spark.operators.retrieval import bm25_index_shared

    tf_idx, docstats = bm25_index_shared(spark, sf_dir)
    tf, df, dl = _index(corpus)
    got_tf = {
        (r.doc_id, r.token): (r.tf, r.dl) for r in tf_idx.collect()
    }
    want_tf = {
        (d, t): (n, dl[d]) for d, c in tf.items() for t, n in c.items()
    }
    assert got_tf == want_tf
    assert {(r.doc_id, r.dl) for r in docstats.collect()} == set(dl.items())


def _py_idf(n_docs, dfreq):
    return (n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0


def test_tfidf_cosine_matches_python(spark, sf_dir, corpus):
    tf, df, dl = _index(corpus)
    n = float(len(corpus))
    idf = {t: _py_idf(n, float(c)) for t, c in df.items()}
    # Doc norms cross ssum (1e-6 grain) in the operator — mimic the
    # identical scaled-integer fold so the pin checks the real pipeline.
    def _ssum(vals, scale=1e6):
        return sum(int(_round_half_away(v * scale)) for v in vals) / scale

    def _round_half_away(x):
        import math as _m

        f = _m.floor(abs(x) + 0.5)
        return f if x >= 0 else -f

    dnorm = {
        d: math.sqrt(_ssum([(cnt * idf[t]) ** 2 for t, cnt in c.items()]))
        for d, c in tf.items()
    }
    got = _build(spark, sf_dir, "retrieval_tfidf_cosine_topk").collect()
    by_q = defaultdict(list)
    for r in got:
        by_q[r.query_id].append(r)
    for qid, qtext in QUERIES:
        terms = sorted(set(qtext.split()))
        wq = {t: idf[t] for t in terms if t in idf}
        qn = math.sqrt(sum(v * v for v in wq.values()))
        scores = {}
        for d, c in tf.items():
            num = sum(wq[t] * c[t] * idf[t] for t in wq if t in c)
            if num > 0:
                scores[d] = num / (qn * dnorm[d])
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in want]
        for r, (_, s) in zip(rows, want):
            assert r.score == pytest.approx(s, rel=1e-9)


def test_qlm_dirichlet_matches_python(spark, sf_dir, corpus):
    mu = 2000.0
    tf, df, dl = _index(corpus)
    cf = Counter()
    for c in tf.values():
        cf.update(c)
    c_total = float(sum(dl.values()))
    pc = {t: n / c_total for t, n in cf.items()}
    got = _build(spark, sf_dir, "retrieval_qlm_dirichlet_topk").collect()
    by_q = defaultdict(list)
    for r in got:
        by_q[r.query_id].append(r)
    for qid, qtext in QUERIES:
        terms = sorted(t for t in set(qtext.split()) if t in pc)
        scores = {}
        for d, c in tf.items():
            if not any(t in c for t in terms):
                continue
            bg = 1.0
            for t in terms:
                bg *= (mu * pc[t]) / (dl[d] + mu)
            pres = 1.0
            for t in terms:
                if t in c:
                    pres *= (c[t] + mu * pc[t]) / (mu * pc[t])
            scores[d] = bg * pres
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in want]
        for r, (_, s) in zip(rows, want):
            assert r.score == pytest.approx(s, rel=1e-9)


def test_eval_report_matches_python(spark, sf_dir, corpus):
    ranked = _build(spark, sf_dir, "text_bm25_topk").collect()
    by_q = defaultdict(list)
    for r in ranked:
        by_q[r.query_id].append((r.rank, r.doc_id))
    report = {
        r.query_id: r for r in _build(spark, sf_dir, "retrieval_eval_report").collect()
    }
    for qid, qtext in QUERIES:
        terms = set(qtext.split())
        rel = {d for d, toks in corpus.items() if terms <= set(toks)}
        rows = sorted(by_q[qid])
        hits = sum(1 for _, d in rows if d in rel)
        rr = 0.0
        ap_sum, cum = 0.0, 0
        for rank, d in rows:
            if d in rel:
                cum += 1
                ap_sum += cum / rank
                if rr == 0.0:
                    rr = 1.0 / rank
        rep = report[qid]
        assert rep.n_rel == len(rel)
        assert rep.hits_at_k == hits
        assert rep.p_at_k == pytest.approx(hits / 10.0)
        assert rep.reciprocal_rank == pytest.approx(rr)
        if rel:
            assert rep.recall_at_k == pytest.approx(hits / len(rel))
            assert rep.ap_at_k == pytest.approx(ap_sum / len(rel), rel=1e-8)
        else:
            assert rep.recall_at_k is None and rep.ap_at_k is None


def test_rrf_fusion_matches_python(spark, sf_dir):
    b = _build(spark, sf_dir, "text_bm25_topk").collect()
    t = _build(spark, sf_dir, "retrieval_tfidf_cosine_topk").collect()
    rrf = defaultdict(float)
    for r in b:
        rrf[(r.query_id, r.doc_id)] += 1.0 / (60.0 + r.rank)
    for r in t:
        rrf[(r.query_id, r.doc_id)] += 1.0 / (60.0 + r.rank)
    want = defaultdict(list)
    for (q, d), s in rrf.items():
        want[q].append((d, s))
    got = _build(spark, sf_dir, "retrieval_rrf_fusion").collect()
    by_q = defaultdict(list)
    for r in got:
        by_q[r.query_id].append(r)
    for q, pairs in want.items():
        top = sorted(pairs, key=lambda kv: (-kv[1], kv[0]))[:5]
        rows = sorted(by_q[q], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in top]
        for r, (_, s) in zip(rows, top):
            assert r.rrf_score == pytest.approx(s, rel=1e-12)


def test_index_stats_matches_python(spark, sf_dir, corpus):
    tf, df, dl = _index(corpus)
    cf = Counter()
    for c in tf.values():
        cf.update(c)
    buckets = defaultdict(lambda: [0, 0, 0, 0])  # n_tokens, postings, cf, max_df
    for t, d in df.items():
        b = buckets[len(str(d))]
        b[0] += 1
        b[1] += d
        b[2] += cf[t]
        b[3] = max(b[3], d)
    total_cf = sum(cf.values())
    got = {r.df_digits: r for r in _build(spark, sf_dir, "retrieval_index_stats").collect()}
    assert set(got) == set(buckets)
    for k, (n_tok, post, bcf, mx) in buckets.items():
        r = got[k]
        assert (r.n_tokens, r.postings_rows, r.bucket_cf, r.max_df) == (
            n_tok,
            post,
            bcf,
            mx,
        )
        assert r.corpus_share == pytest.approx(bcf / total_cf)


# --------------------------------------------------------------------------
# Greedy coreset selectors (round-9 curation)
# --------------------------------------------------------------------------


def test_kcenter_coreset_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def d2(a, b):
        return max(0.0, sum(x * x for x in a) - 2 * sum(
            x * y for x, y in zip(a, b)
        ) + sum(y * y for y in b))

    first = min(vecs)
    centers = [first]
    md = {i: d2(v, vecs[first]) for i, v in vecs.items()}
    radii = [max(md.values())]
    import math

    for _ in range(4):
        nxt = max(vecs, key=lambda i: (md[i], -i))
        centers.append(nxt)
        for i, v in vecs.items():
            md[i] = min(md[i], d2(v, vecs[nxt]))
        radii.append(max(md.values()))
    got = sorted(
        _build(spark, sf_dir, "curation_kcenter_coreset").collect(),
        key=lambda r: r.round,
    )
    assert [r.vec_id for r in got] == centers
    for r, rad in zip(got, radii):
        assert r.radius_after == pytest.approx(math.sqrt(rad), rel=1e-9)


def test_submodular_coverage_matches_python(spark, sf_dir, corpus):
    import hashlib
    from collections import Counter

    def shingles(toks):
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    dv = {
        d: {hashlib.md5(s.encode()).hexdigest() for s in shingles(t)}
        for d, t in corpus.items()
    }
    df = Counter()
    for digs in dv.values():
        df.update(digs)
    vocab = set(
        s for s, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    )
    covered: set = set()
    want = []
    for r in range(1, 6):
        best = min(
            ((-len((digs & vocab) - covered), d) for d, digs in dv.items()),
        )
        sc, doc = -best[0], best[1]
        new = (dv[doc] & vocab) - covered
        covered |= new
        want.append((r, doc, sc, len(covered), len(covered) / 1000))
    got = sorted(
        _build(spark, sf_dir, "curation_submodular_coverage").collect(),
        key=lambda r: r.round,
    )
    for g, (r, doc, sc, tot, frac) in zip(got, want):
        assert (g.round, g.doc_id, g.new_shingles, g.covered_total) == (
            r,
            doc,
            sc,
            tot,
        )
        assert g.coverage_frac == pytest.approx(frac)
