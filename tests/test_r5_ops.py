"""Property tests for the round-5 operators — each op's defining
invariant checked independently of the DuckDB oracle gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every true dim key must pass the probe (Bloom's one guarantee),
    and the pre-filter must actually drop rows (selectivity check)."""
    from sql_engine_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom_bits,
    )

    cust = load(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7000)
    )
    keys = cust.select("c_custkey")
    words, bits = build_bloom_bits(keys, "c_custkey", bits=None)
    # no false negatives: every dim key probes true
    misses = keys.where(
        ~bloom_might_contain("c_custkey", words, bits=bits)
    ).count()
    assert misses == 0
    # the probe drops a meaningful share of the fact side pre-join
    orders = load(spark, sf_dir, "orders")
    pre = orders.where(
        bloom_might_contain("o_custkey", words, bits=bits)
    ).count()
    assert pre < orders.count()


def test_bloom_prefilter_equals_plain_semi_join(spark, sf_dir):
    from sql_engine_spark.operators.bloom import bloom_prefiltered_semi_join

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    got = {
        r.o_orderkey
        for r in bloom_prefiltered_semi_join(
            orders,
            cust.select("c_custkey"),
            fact_key="o_custkey",
            dim_key="c_custkey",
        ).collect()
    }
    want = {
        r.o_orderkey
        for r in orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_semi",
        ).collect()
    }
    assert got == want


def test_triangle_count_matches_naive(spark):
    """Wedge-join triangles vs brute-force enumeration on a known graph:
    K4 plus a pendant edge -> 4 triangles, K4 nodes in 3 each."""
    from sql_engine_spark.operators.dedup import _persist

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)]
    und = _persist(spark.createDataFrame(edges, ["a", "b"]))
    x, y = und.alias("x"), und.alias("y")
    wedge = x.join(y, F.col("x.b") == F.col("y.a")).select(
        F.col("x.a").alias("a"), F.col("x.b").alias("b"), F.col("y.b").alias("c")
    )
    tri = wedge.join(
        und.select(F.col("a").alias("za"), F.col("b").alias("zb")),
        (F.col("za") == F.col("a")) & (F.col("zb") == F.col("c")),
        "left_semi",
    )
    rows = {(r.a, r.b, r.c) for r in tri.collect()}
    assert rows == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
    # and the shipped degree-oriented operator agrees corner-for-corner
    from sql_engine_spark.operators.graph import triangle_corner_counts

    got = {
        r.node: r.n_triangles for r in triangle_corner_counts(und).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_reservoir_sizes_and_mergeability(spark, sf_dir):
    """Exactly min(k, n_key) rows per key; and the bottom-k of a union
    equals the bottom-k of the parts' bottom-k's (the sketch merge
    property that makes hash-order reservoirs distributable)."""
    df = _build(spark, sf_dir, "sample_reservoir_per_key")
    per_key = {r.lang: r.n for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    docs = load(spark, sf_dir, "documents")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per_key == {k: min(5, v) for k, v in sizes.items()}
    # merge property on raw hashes, one key
    rows = sorted(
        r.hkey for r in df.sparkSession.createDataFrame(
            [(i,) for i in range(40)], ["doc_id"]
        ).select(F.md5(F.concat(F.lit("rsv1|"), F.col("doc_id").cast("string"))).alias("hkey")).collect()
    )
    part1, part2 = sorted(rows[:20])[:5], sorted(rows[20:])[:5]
    assert sorted(rows)[:5] == sorted(part1 + part2)[:5]


def test_ewma_matches_direct_formula(spark):
    """Fold spelling == explicit sum of v_j * 2^-(lag) / sum 2^-(lag)."""
    data = [(i, 1, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
    ev = spark.createDataFrame(data, ["event_id", "user_id", "value"]).withColumn(
        "ts", F.timestamp_seconds(F.col("event_id") * 60)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    got = {
        r.event_id: r.ewma
        for r in ev.withColumn("__vals", F.collect_list("value").over(w))
        .select(
            "event_id",
            (
                F.expr("aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)")
                / F.expr("aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + 1.0D)")
            ).alias("ewma"),
        )
        .collect()
    }
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    for i in range(len(vals)):
        window = vals[max(0, i - 15) : i + 1]
        num = sum(v * 0.5 ** (len(window) - 1 - j) for j, v in enumerate(window))
        den = sum(0.5 ** (len(window) - 1 - j) for j in range(len(window)))
        assert got[i] == pytest.approx(num / den, abs=1e-12)


def test_gap_fill_forward_fills(spark, tmp_path):
    """Hourly grid spans trunc(min ts)..trunc(max ts); each point carries
    the latest at-or-before reading, NULL before the first."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, base, 7, 10.0, "view", None),
        (2, base + dt.timedelta(hours=3, minutes=10), 7, 20.0, "view", None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, value double, "
        "event_type string, props string",
    )
    path = str(tmp_path)
    ev.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {
        r.grid_ts.hour: r.filled_value
        for r in _build(spark, path, "events_gap_fill_asof").collect()
    }
    assert out == {0: None, 1: 10.0, 2: 10.0, 3: 10.0}


def test_int8_quantize_error_bound(spark, sf_dir):
    """Codes in [-127, 127]; per-vector MSE <= (max scale / 2)^2 (the
    scalar-quantization half-step bound)."""
    from sql_engine_spark.operators.quantize import int8_quantize, int8_quantize_stats

    emb = load(spark, sf_dir, "embeddings")
    max_scale = int8_quantize_stats(emb, "embedding").agg(F.max("scale")).collect()[0][0]
    out = int8_quantize(emb, id_col="vec_id", vec_col="embedding")
    bad = out.where(
        (F.col("q_min") < -127)
        | (F.col("q_max") > 127)
        | (F.col("recon_mse") > (max_scale / 2.0) ** 2 + 1e-12)
    ).count()
    assert bad == 0


def test_percentile_exact_matches_numpy(spark, sf_dir):
    import numpy as np

    out = {r.event_type: r for r in _build(spark, sf_dir, "agg_percentile_exact").collect()}
    ev = load(spark, sf_dir, "events")
    for et, rows in (
        (r.event_type, [x.value for x in ev.where(F.col("event_type") == r.event_type).collect()])
        for r in out.values()
    ):
        want = np.percentile(np.array(rows), [25, 50, 75], method="linear")
        got = out[et]
        assert got.p25 == pytest.approx(want[0], rel=1e-12)
        assert got.p50 == pytest.approx(want[1], rel=1e-12)
        assert got.p75 == pytest.approx(want[2], rel=1e-12)


def test_curriculum_rank_is_permutation_and_phases_balanced(spark, sf_dir):
    df = _build(spark, sf_dir, "curation_curriculum_order")
    rows = df.collect()
    n = len(rows)
    ranks = sorted(r.curriculum_rank for r in rows)
    assert ranks == list(range(1, n + 1))
    # scores non-decreasing in rank
    by_rank = sorted(rows, key=lambda r: r.curriculum_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.score, a.doc_id) < (b.score, b.doc_id)
    from collections import Counter

    phases = Counter(r.phase for r in rows)
    assert set(phases) == {0, 1, 2, 3}
    assert max(phases.values()) - min(phases.values()) <= 1


def test_source_cap_keeps_top_scores(spark, sf_dir):
    df = _build(spark, sf_dir, "curation_source_cap")
    per_src = {}
    for r in df.collect():
        per_src.setdefault(r.source, []).append(r)
    from sql_engine_spark.operators.text import hashed_linear_score

    all_scores = {}
    scored = hashed_linear_score(
        load(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        carry_cols=["source"],
    ).collect()
    for r in scored:
        all_scores.setdefault(r.source, []).append((-r.score, r.doc_id))
    for src, kept in per_src.items():
        want = sorted(all_scores[src])[: len(kept)]
        got = sorted((-r.score, r.doc_id) for r in kept)
        assert got == want
        assert len(kept) == min(15, len(all_scores[src]))


def test_trigram_backoff_probabilities_bounded(spark, sf_dir):
    df = _build(spark, sf_dir, "text_trigram_backoff")
    bad = df.where((F.col("mean_score") < 0) | (F.col("mean_score") > 1.0)).count()
    assert bad == 0
    # Odd docs (outside the training half) must average lower scores
    # than even docs: the backoff discount is doing its job.
    rows = df.collect()
    even = [r.mean_score for r in rows if r.doc_id % 2 == 0]
    odd = [r.mean_score for r in rows if r.doc_id % 2 == 1]
    assert sum(even) / len(even) > sum(odd) / len(odd)


def test_novelty_totals_conserve(spark, sf_dir):
    """Sum of per-doc novel shingles == corpus distinct shingle count
    (every distinct shingle is novel in exactly one doc)."""
    from sql_engine_spark.operators.textprep import shingles, tokens

    df = _build(spark, sf_dir, "text_ngram_novelty")
    total_novel = df.agg(F.sum("n_novel")).collect()[0][0]
    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    distinct = (
        docs.select(F.explode(F.array_distinct(shingles("__t", 5))).alias("g"))
        .select("g")
        .distinct()
        .count()
    )
    assert total_novel == distinct


def test_mode_deterministic_ties(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "en", "sA"),
            (2, "en", "sA"),
            (3, "en", "sB"),
            (4, "en", "sB"),  # tie sA/sB -> sA (lexicographically first)
            (5, "fr", "sZ"),
        ],
        ["doc_id", "lang", "source"],
    ).withColumn("text", F.lit("x")).withColumn("n_chars", F.lit(1))
    path = str(tmp_path)
    docs.write.mode("overwrite").parquet(path + "/documents.parquet")
    out = {r.lang: (r.mode_source, r.mode_count) for r in _build(spark, path, "agg_mode_deterministic").collect()}
    assert out == {"en": ("sA", 2), "fr": ("sZ", 1)}


def test_partitioned_read_prunes_partitions(spark, sf_dir):
    """The partition filter must prune at planning: exactly one
    partition directory scheduled, predicate in PartitionFilters."""
    from sql_engine_spark.plans.audit import explain_str

    df = _build(spark, sf_dir, "scan_partitioned_write_prune")
    plan = explain_str(df, "formatted")
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"partition filters:.*|PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(0)
    # The data filter must NOT appear as a post-scan Filter on the data
    # columns: pruning happened at planning, so the only event_type
    # references live in the partition-filter clause.
    body = plan.split("PartitionFilters", 1)[0]
    assert "Filter (" not in body or "event_type" not in body


def test_streaming_reservoir_converges_to_batch(spark, sf_dir):
    """The micro-batch-merged reservoir must equal the one-shot batch
    reservoir exactly (bottom-k mergeability, end to end)."""
    batch = {
        (r.doc_id, r.lang, r.rank)
        for r in _build(spark, sf_dir, "sample_reservoir_per_key").collect()
    }
    stream = {
        (r.doc_id, r.lang, r.rank)
        for r in _build(spark, sf_dir, "streaming_reservoir_sample").collect()
    }
    assert stream == batch


def test_label_propagation_labels_are_neighbor_modes(spark):
    """One LPA round on a known graph: two 3-cliques bridged by one
    edge must keep two distinct majority labels after 2 rounds."""
    from pyspark.sql import Window

    edges_und = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    und = spark.createDataFrame(edges_und, ["a", "b"])
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(2):
        counts = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").cast("long").alias("n"))
        )
        labels = (
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
    got = {r.node: r.label for r in labels.collect()}
    # the left clique coalesces onto its min label; the right clique's
    # majority stays internal despite the bridge
    assert got[0] == got[1] == got[2]
    assert got[4] == got[5]
    assert got[0] != got[4]


def test_feature_lags_first_row_nulls(spark, sf_dir):
    df = _build(spark, sf_dir, "events_feature_lags")
    firsts = df.where(F.col("micros_since_prev").isNull())
    users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert firsts.count() == users  # exactly one frameless row per user
    assert firsts.where(F.col("lag1").isNotNull()).count() == 0


def test_nearest_join_picks_closer_side(spark, tmp_path):
    """Backward 10 min away vs forward 5 min away -> forward wins;
    exact tie -> backward; outside tolerance -> NULL."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def row(eid, mins, typ, uid=1):
        return (eid, t0 + dt.timedelta(minutes=mins), uid, 1.0, typ, None)

    rows = [
        row(1, 0, "purchase"),
        row(10, -10, "view"),
        row(11, 5, "view"),  # closer (forward)
        row(2, 100, "purchase"),
        row(20, 90, "view"),
        row(21, 110, "view"),  # exact tie -> backward (id 20)
        row(3, 300, "purchase", uid=2),
        row(30, 210, "view", uid=2),  # 90 min away: outside 30-min tol
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, value double, "
        "event_type string, props string",
    )
    path = str(tmp_path)
    ev.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {r.event_id: r.nearest_view_id for r in _build(spark, path, "join_asof_nearest").collect()}
    assert out == {1: 11, 2: 20, 3: None}


def test_corr_matches_numpy(spark, sf_dir):
    import numpy as np

    out = {r.event_type: r for r in _build(spark, sf_dir, "agg_corr_manual").collect()}
    ev = load(spark, sf_dir, "events").withColumn("hr", F.hour("ts")).collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.hr))
    for et, pairs in by_type.items():
        x = np.array([p[0] for p in pairs])
        y = np.array([p[1] for p in pairs], dtype=float)
        want = np.corrcoef(x, y)[0, 1]
        assert out[et].corr_value_hour == pytest.approx(want, abs=1e-9)
        slope = np.polyfit(y, x, 1)[0]
        assert out[et].regr_slope_on_hour == pytest.approx(slope, abs=1e-9)


def test_shard_manifest_conserves_and_balances(spark, sf_dir):
    df = _build(spark, sf_dir, "curation_shard_manifest")
    rows = df.collect()
    assert {r.shard for r in rows} <= set(range(8))
    total = sum(r.n_docs for r in rows)
    assert total == load(spark, sf_dir, "documents").count()
    # hash sharding: no shard more than 3x the uniform share
    assert max(r.n_docs for r in rows) <= 3 * (total / 8)


def test_dataset_build_composition_consistent(spark, sf_dir):
    """The flagship equals its parts: capped set == source_cap's docs;
    ranks form a permutation of the capped set; shard matches the
    manifest hash."""
    flag = {r.doc_id: r for r in _build(spark, sf_dir, "pipeline_dataset_build").collect()}
    cap = {r.doc_id for r in _build(spark, sf_dir, "curation_source_cap").collect()}
    assert set(flag) == cap
    ranks = sorted(r.curriculum_rank for r in flag.values())
    assert ranks == list(range(1, len(flag) + 1))
    import hashlib

    for doc_id, r in list(flag.items())[:20]:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 8
        assert r.shard == h


def test_streaming_ewma_bit_equals_batch(spark, sf_dir):
    """The stateful streaming EWMA must equal the batch window result
    BIT-exactly (same halving folds, cross-batch state)."""
    batch = {
        r.event_id: r.ewma for r in _build(spark, sf_dir, "events_ewma_half").collect()
    }
    stream = {
        r.event_id: r.ewma
        for r in _build(spark, sf_dir, "streaming_ewma_half").collect()
    }
    assert stream == batch and len(batch) > 0


def test_bloom_ingest_admits_exactly_new_content(spark, sf_dir):
    df = _build(spark, sf_dir, "dedup_bloom_ingest")
    admitted = {r.doc_id for r in df.collect()}
    docs = load(spark, sf_dir, "documents").withColumn("h", F.md5("text"))
    base_hashes = {
        r.h for r in docs.where(F.col("doc_id") % 3 != 0).collect()
    }
    new_rows = docs.where(F.col("doc_id") % 3 == 0).collect()
    want = {r.doc_id for r in new_rows if r.h not in base_hashes}
    assert admitted == want  # no dup admitted, no new doc dropped


def test_histogram_conserves_and_bins_bound(spark, sf_dir):
    df = _build(spark, sf_dir, "agg_histogram_fixed_bins")
    rows = df.collect()
    ev = load(spark, sf_dir, "events").where(
        (F.col("value") >= 0.0) & (F.col("value") <= 1000.0)
    )
    assert sum(r.n for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.bin <= 9
        lo, hi = r.bin * 100.0, (r.bin + 1) * 100.0
        assert r.bin_min >= lo - 1e-9
        assert r.bin_max <= hi + 1e-9 or (r.bin == 9 and r.bin_max <= 1000.0)


def test_pca_component_on_anisotropic_data(spark):
    """On data with a dominant direction, 3 power rounds must align
    with numpy's top right singular vector (|cos| >= 0.999); on the
    registered query the oracle pins bit-equality instead (the
    near-isotropic fixture corpus converges slowly by design)."""
    import numpy as np

    from sql_engine_spark.operators.pca import pca_power_component

    rng = np.random.RandomState(7)
    direction = rng.randn(16)
    direction /= np.linalg.norm(direction)
    X = rng.randn(400, 16) * 0.1 + np.outer(rng.randn(400) * 3.0, direction)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in X.astype(np.float32)],
        "embedding array<float>",
    )
    v, eig = pca_power_component(df, vec_col="embedding", dim=16, iterations=3)
    v = np.array(v)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    Xd = X.astype(np.float32).astype(np.float64)
    _, s, vt = np.linalg.svd(Xd, full_matrices=False)
    assert abs(float(v @ vt[0])) >= 0.999
    # eigenvalue estimate ~ top singular value^2 / n
    assert eig == pytest.approx(s[0] ** 2 / len(Xd), rel=0.05)


def test_bpe_merges_match_reference_implementation(spark, sf_dir):
    """The learned merge table must equal a pure-Python greedy BPE on
    the same word counts (count desc, pair asc tie-break)."""
    from collections import Counter

    from sql_engine_spark.operators.textprep import tokens as _tokens

    docs = load(spark, sf_dir, "documents").withColumn("__t", _tokens("text"))
    words = Counter()
    for r in docs.select(F.explode("__t").alias("w")).collect():
        if r.w:
            words[r.w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    got = [
        (r.round, r.left_sym, r.right_sym, r.cnt)
        for r in sorted(
            _build(spark, sf_dir, "text_bpe_train_merges").collect(),
            key=lambda r: r.round,
        )
    ]
    want = []
    for rnd in range(1, 6):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (l, rr), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, l, rr, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    out.append(l + rr)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    assert got == want


def test_k_anonymity_suppression_complete(spark, sf_dir):
    df = _build(spark, sf_dir, "privacy_k_anonymity")
    for r in df.collect():
        if r.group_size < 5:
            assert (r.lang_released, r.source_released) == ("*", "*")
            assert not r.k_anonymous
        else:
            assert (r.lang_released, r.source_released) == (r.lang, r.source)
            assert r.k_anonymous


def test_payload_simhash_complete_vs_naive(spark, sf_dir):
    """Block pairing over payload digests == naive all-pairs Hamming
    <= 2 (pigeonhole completeness transfers to the binary path)."""
    from sql_engine_spark.operators.dedup import _hamming_expr

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in _build(spark, sf_dir, "multimodal_payload_simhash").collect()
    }
    from sql_engine_spark.operators.dedup import simhash_bits_from_digests
    from sql_engine_spark.operators.multimodal import with_binary_payload

    docs = with_binary_payload(load(spark, sf_dir, "documents"), "text")
    b64 = "regexp_replace(base64(payload), '[\\r\\n]', '')"
    sigs = docs.select(
        F.col("doc_id").alias("id"),
        F.expr(
            f"transform(sequence(1, CAST(ceil(length({b64}) / 16.0) AS INT)), "
            f"i -> md5(substring({b64}, (16 * (i - 1)) + 1, 16)))"
        ).alias("__digs"),
    ).select("id", simhash_bits_from_digests("__digs", 64).alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    naive = {
        (r.id_a, r.id_b): r.hamming
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.expr(_hamming_expr("a.sig", "b.sig", 64)).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 2)
        .collect()
    }
    assert got == naive


def test_time_to_convert_known_delays(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def row(eid, mins, typ, uid=1):
        return (eid, t0 + dt.timedelta(minutes=mins), uid, 1.0, typ, None)

    rows = [
        row(1, 0, "view"),
        row(2, 10, "purchase"),   # delay 600 s
        row(3, 30, "purchase"),   # delay 1800 s (same prior view)
        row(4, 0, "purchase", 2), # no prior view: excluded
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, value double, "
        "event_type string, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    out = _build(spark, str(tmp_path), "events_time_to_convert").collect()[0]
    assert out.n_converted == 2
    assert out.p50_seconds == pytest.approx(1200.0)  # midpoint 600..1800
    assert out.max_seconds == pytest.approx(1800.0)


def test_gini_known_distributions(spark, tmp_path):
    """Uniform sources -> 0; extreme concentration -> close to 1."""
    uniform = [(i, f"s{i % 4}", "en", "x", 1) for i in range(400)]
    skewed = [(i, "s0" if i < 397 else f"s{i - 396}", "en", "x", 1) for i in range(400)]
    for name, rows, lo, hi in (
        ("u", uniform, -1e-9, 1e-9),
        ("s", skewed, 0.70, 1.0),
    ):
        df = spark.createDataFrame(
            rows, "doc_id long, source string, lang string, text string, n_chars long"
        )
        path = str(tmp_path / name)
        df.write.mode("overwrite").parquet(path + "/documents.parquet")
        g = _build(spark, path, "curation_gini_balance").collect()[0]
        assert lo <= g.gini <= hi, (name, g.gini)


def test_mad_outliers_robust_to_extremes(spark, tmp_path):
    """A single wild value must be flagged without dragging the
    threshold (the failure mode of mean/std z-scores)."""
    rows = [(i, f"2024-01-01 00:{i:02d}:00", 1, v, "view", None)
            for i, v in enumerate([10.0] * 20 + [10.5] * 20 + [10000.0])]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, value double, "
        "event_type string, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    ev.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    out = {r.event_id: r.is_outlier for r in _build(spark, str(tmp_path), "events_anomaly_mad").collect()}
    assert out[40] is True
    assert sum(out.values()) == 1


def test_tv_distance_bounds_and_identity(spark, tmp_path):
    """TV in [0, 1]; a source identical to the corpus distribution has
    TV 0; a disjoint-vocabulary source approaches 1."""
    rows = (
        [(i, "same", "en", "alpha beta gamma", 1) for i in range(50)]
        + [(100 + i, "disjoint", "en", "zeta eta theta", 1) for i in range(50)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, n_chars long"
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    out = {r.source: r.tv_distance for r in _build(spark, path, "text_source_drift_tv").collect()}
    # two equal-mass disjoint sources: each is TV 0.5 from the mixture
    assert out["same"] == pytest.approx(0.5)
    assert out["disjoint"] == pytest.approx(0.5)
    rows2 = [(i, f"s{i % 2}", "en", "alpha beta", 1) for i in range(40)]
    df2 = spark.createDataFrame(
        rows2, "doc_id long, source string, lang string, text string, n_chars long"
    )
    path2 = str(tmp_path / "u")
    df2.write.mode("overwrite").parquet(path2 + "/documents.parquet")
    out2 = {r.source: r.tv_distance for r in _build(spark, path2, "text_source_drift_tv").collect()}
    assert all(abs(v) < 1e-12 for v in out2.values())
