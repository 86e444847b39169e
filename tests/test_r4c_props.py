"""Property tests for the round-4 additions: substring spans, CMS,
sorted-neighborhood completeness, and the two retrieval ops — random
corpora, invariants that must hold for ANY input."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sql_engine_spark.operators.dedup import sorted_neighborhood_pairs
from sql_engine_spark.operators.sketch import countmin_heavy_hitters
from sql_engine_spark.operators.spans import duplicated_spans

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


@st.composite
def _corpus(draw):
    n = draw(st.integers(3, 8))
    docs = []
    for i in range(n):
        toks = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30))
        docs.append((i, " ".join(toks)))
    return docs


@given(_corpus(), st.integers(2, 5))
@settings(**_SETTINGS)
def test_spans_invariants(spark, docs, k):
    """Every reported span: (a) >= k tokens, (b) within the doc's token
    count, (c) its first k-window genuinely occurs in another doc;
    spans within one doc never overlap."""
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    toks = {i: t.lower().split() for i, t in docs}
    got = duplicated_spans(df, "doc_id", "text", k=k).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        assert r.span_tokens == r.span_end - r.span_start + 1 >= k
        assert 1 <= r.span_start and r.span_end <= len(toks[r.doc_id])
        win = " ".join(toks[r.doc_id][r.span_start - 1 : r.span_start - 1 + k])
        others = [
            " ".join(toks[j][p : p + k])
            for j in toks
            if j != r.doc_id
            for p in range(len(toks[j]) - k + 1)
        ]
        assert win in others, (r, win)
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1 + 1  # maximal: adjacent/overlapping would merge


@given(st.lists(st.integers(0, 6), min_size=1, max_size=60), st.integers(1, 5))
@settings(**_SETTINGS)
def test_countmin_never_undercounts_and_finds_all_heavy(spark, keys, thr):
    """CMS guarantees: est >= exact for every key, and every key with
    exact count >= threshold IS reported (overcounting can only ADD
    keys, never drop one)."""
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r.key: r for r in countmin_heavy_hitters(df, key_col="k", threshold=thr).collect()}
    exact: dict[str, int] = {}
    for k in keys:
        exact[str(k)] = exact.get(str(k), 0) + 1
    for key, r in got.items():
        assert r.est_count >= r.exact_count == exact[key]
        assert r.never_undercounts
    for key, n in exact.items():
        if n >= thr:
            assert key in got, (key, n)


@given(_corpus())
@settings(**_SETTINGS)
def test_sorted_neighborhood_subset_of_all_pairs(spark, docs):
    """Blocked pairs are a SUBSET of threshold-passing all-pairs (it's a
    recall/cost trade), and every reported jaccard matches the exact
    set jaccard."""
    docs = [(i, t) for i, t in docs if t.strip()]
    if len(docs) < 2:
        return
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted_neighborhood_pairs(
        df, id_col="doc_id", text_col="text", window=2, threshold=0.3
    ).collect()
    sets = {i: set(t.lower().split()) for i, t in docs}
    for r in got:
        a, b = sets[r.id_a], sets[r.id_b]
        jac = len(a & b) / len(a | b)
        assert jac >= 0.3
        assert abs(jac - r.jaccard) < 1e-12
        assert r.id_a != r.id_b


def test_prefix_filter_complete_vs_naive_all_pairs(spark, sf_dir):
    """The prefix-filter join must return EXACTLY the naive all-pairs
    Jaccard >= t result — the zero-recall-loss guarantee that separates
    it from LSH. Naive side computed in Spark over the sf0.001 corpus
    (500 docs = 125k pairs)."""
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.dedup import prefix_filter_pairs
    from sql_engine_spark.operators.textprep import shingles, tokens

    t = 0.3
    docs = load(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_pairs(
            docs, "doc_id", "text", shingle_k=3, threshold=t
        ).collect()
    }
    sets = (
        docs.select(F.col("doc_id").alias("id"), tokens("text").alias("__t"))
        .withColumn("hs", F.expr("transform(array_distinct(" +
                                 "transform(sequence(1, greatest(size(__t) - 2, 1)), " +
                                 "i -> array_join(slice(__t, i, 3), ' '))), s -> md5(s))"))
        .select("id", "hs")
    )
    a, b = sets.alias("a"), sets.alias("b")
    jac = F.size(F.array_intersect("a.hs", "b.hs")) / F.size(
        F.array_union("a.hs", "b.hs")
    )
    naive = {
        (r.id_a, r.id_b): r.jaccard
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), jac.alias("jaccard"))
        .where(F.col("jaccard") >= t)
        .collect()
    }
    assert got == naive


def test_simhash_hamming_complete_vs_naive(spark, sf_dir):
    """Pigeonhole completeness: block-joined pairs must equal the naive
    all-pairs Hamming <= d result exactly."""
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.dedup import (
        _hamming_expr,
        simhash_bits,
        simhash_hamming_pairs,
    )
    from sql_engine_spark.operators.textprep import tokens

    bits, d = 32, 2
    docs = load(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_hamming_pairs(
            docs, "doc_id", "text", bits=bits, n_blocks=4, max_hamming=d
        ).collect()
    }
    sigs = docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("__t")
    ).select("id", simhash_bits("__t", bits).alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    naive = {
        (r.id_a, r.id_b): r.hamming
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.expr(_hamming_expr("a.sig", "b.sig", bits)).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= d)
        .collect()
    }
    assert got == naive and len(got) > 0


def test_leakage_safe_split_invariant(spark, sf_dir):
    """No near-dup pair may straddle splits, and the split proportions
    must be sane (train the largest)."""
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.dedup import minhash_lsh_pairs
    from sql_engine_spark.registry import all_queries

    res = all_queries()["curation_leakage_safe_split"].build(spark, sf_dir)
    assign = {r.doc_id: (r.cluster_id, r.split) for r in res.collect()}
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_k=3, num_hashes=8, bands=4, threshold=0.2
    ).collect()
    assert pairs, "corpus should contain near-dups"
    for p in pairs:
        assert assign[p.id_a][1] == assign[p.id_b][1], (p, assign[p.id_a], assign[p.id_b])
    from collections import Counter

    frac = Counter(s for _, s in assign.values())
    assert frac["train"] > frac["val"] and frac["train"] > frac["test"]


def test_knn_graph_recall_floor(spark, sf_dir):
    """Pin recall@5 of the LSH kNN graph vs exact cosine top-5 — the
    synthetic embeddings are near-uniform (the hard case for LSH), so
    the floor is modest; real clustered embeddings do far better at
    the same parameters."""
    from sql_engine_spark.functions.vectors import dot, l2_norm
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.similarity import knn_graph
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    approx = {
        (r.src, r.dst)
        for r in knn_graph(
            emb, id_col="vec_id", vec_col="embedding", planes=4, tables=8, dim=64, k=5
        ).collect()
    }
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("e"),
        l2_norm("embedding").alias("n"),
    )
    a, b = v.alias("a"), v.alias("b")
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    exact = {
        (r.src, r.dst)
        for r in a.join(b, F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            (dot("a.e", "b.e") / (F.col("a.n") * F.col("b.n"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where("rank <= 5")
        .collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, recall
