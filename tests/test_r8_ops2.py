"""Round-8 pins, second set: python recomputes for the SemDeDup cell
argmin, the video scene-cut distances, the b-bit estimator, and the
greedy graph-search audit columns."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_semdedup_kept_is_true_argmin(spark, sf_dir):
    """The kept vector per cell really is the closest to the cell
    centroid (python recompute of centroids and distances, modulo the
    documented dsum 1e-6 rounding)."""
    from sql_engine_spark.operators.similarity import lsh_bucket
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    rows = emb.select(
        "vec_id", lsh_bucket("embedding", 4, 64).alias("cell"), "embedding"
    ).collect()
    cells = defaultdict(list)
    for r in rows:
        cells[r.cell].append((r.vec_id, [float(x) for x in r.embedding]))
    got = {r.cell: r for r in _build(spark, sf_dir, "curation_semdedup_cells").collect()}
    assert set(got) == set(cells)
    for cell, members in cells.items():
        dim = len(members[0][1])
        mu = [sum(v[i] for _, v in members) / len(members) for i in range(dim)]
        dists = sorted(
            (sum((v[i] - mu[i]) ** 2 for i in range(dim)) ** 0.5, vid)
            for vid, v in members
        )
        r = got[cell]
        assert r.cell_size == len(members)
        assert r.kept_vec_id == dists[0][1]
        assert r.kept_dist == pytest.approx(dists[0][0], abs=5e-5)


def test_scene_cuts_match_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {}
    for d in docs:
        payload = d.text.encode()
        n_frames = max(1, len(payload) // 16)
        idxs = list(range(0, n_frames, 10))
        sigs = [
            int(
                hashlib.md5(payload + b"|" + str(i).encode()).hexdigest()[:15], 16
            )
            for i in idxs
        ]
        for (i_prev, s_prev), (i_cur, s_cur) in zip(
            zip(idxs, sigs), list(zip(idxs, sigs))[1:]
        ):
            h = bin(s_prev ^ s_cur).count("1")
            if h >= 38:
                want[(d.doc_id, i_cur)] = h
    got = {
        (r.doc_id, r.frame_idx): r.hamming_prev
        for r in _build(spark, sf_dir, "multimodal_video_scene_cuts").collect()
    }
    assert got == want
    assert want  # cuts exist in the fixture


def test_bbit_estimator_matches_python(spark, sf_dir):
    rows = _build(spark, sf_dir, "dedup_minhash_bbit_audit").collect()
    assert rows
    for r in rows:
        # estimates derive from the exact integer match counts
        assert r.minhash_est == pytest.approx(r.full_matches / 8.0, rel=1e-12)
        assert r.bbit_est == pytest.approx(2.0 * r.bit_matches / 8.0 - 1.0, rel=1e-12)
        # a full-lane match forces a parity match: bit >= full
        assert r.bit_matches >= r.full_matches
        assert 0 <= r.full_matches <= 8 and 0 <= r.bit_matches <= 8


def test_greedy_search_regret_nonnegative_and_walk_valid(spark, sf_dir):
    rows = _build(spark, sf_dir, "ann_graph_greedy_search").collect()
    assert len(rows) == 10
    for r in rows:
        assert r.regret >= -1e-12  # brute top-1 dominates any walk result
        assert (r.found_id == r.brute_id) == r.hit
        assert r.found_id >= 10  # never 'finds' a query vector
    # the walk must beat or match the entry point for every query:
    # found cosine >= cosine(query, entry) since the entry is always a
    # candidate at every hop
    from pyspark.sql import functions as F

    from sql_engine_spark.functions.vectors import dot, l2_norm

    emb = load(spark, sf_dir, "embeddings")
    entry_id = emb.where(F.col("vec_id") >= 10).agg(F.min("vec_id")).collect()[0][0]
    ev = emb.where(F.col("vec_id") == entry_id).select(
        F.col("embedding").alias("__ev"), l2_norm("embedding").alias("__en")
    )
    base = {
        r.query_id: r.c0
        for r in emb.where(F.col("vec_id") < 10)
        .crossJoin(F.broadcast(ev))
        .select(
            F.col("vec_id").alias("query_id"),
            (dot("embedding", "__ev") / (l2_norm("embedding") * F.col("__en"))).alias("c0"),
        )
        .collect()
    }
    for r in rows:
        assert r.found_cosine >= base[r.query_id] - 1e-12
