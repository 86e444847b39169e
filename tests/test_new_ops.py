"""Unit tests for the CC / merge / unpivot operators (semantic invariants
the oracle hash can't express: fixpoint behavior, key uniqueness, shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_spark.operators.dedup import connected_components_fixed
from sql_engine_spark.registry import all_queries


def test_connected_components_toy_graph(spark):
    # Two components: {1,2,3,4} (a path, diameter 3) and {10, 11}.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a int, id_b int"
    )
    out = connected_components_fixed(pairs, "id_a", "id_b", iterations=3)
    got = {(r.node, r.label) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_unconverged_is_deterministic(spark):
    # A 6-node path needs >2 iterations to converge; with 1 iteration the
    # result must still be the exact one-step label propagation.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "id_a int, id_b int"
    )
    out = connected_components_fixed(pairs, "id_a", "id_b", iterations=1)
    got = {(r.node, r.label) for r in out.collect()}
    # label_1(v) = min(v, neighbors(v))
    assert got == {(1, 1), (2, 1), (3, 2), (4, 3), (5, 4), (6, 5)}


def test_merge_upsert_unique_keys_and_wins(spark, sf_dir):
    df = all_queries()["merge_upsert_latest"].build(spark, sf_dir)
    total = df.count()
    assert df.select("o_orderkey").distinct().count() == total
    # every updated key (orderkey % 10 == 0, not an insert) carries version 1
    updated = df.where((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") < 1000000000))
    assert updated.where(F.col("version") != 1).count() == 0
    assert updated.where(F.col("o_orderstatus") != "X").count() == 0


def test_unpivot_shape(spark, sf_dir):
    df = all_queries()["unpivot_stack"].build(spark, sf_dir)
    n_flags = df.select("l_returnflag").distinct().count()
    assert df.count() == 3 * n_flags
    assert set(df.columns) == {"l_returnflag", "metric", "value"}


def _topk_pairs(spark, sf_dir, name):
    df = all_queries()[name].build(spark, sf_dir)
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ann_recall_vs_brute_force(spark, sf_dir):
    # Deterministic data -> deterministic recall; floors leave headroom
    # below the measured values (ivf 0.56, multitable 0.52 at sf0.001).
    brute = _topk_pairs(spark, sf_dir, "ann_brute_topk")
    ivf = _topk_pairs(spark, sf_dir, "ann_ivf_topk")
    multi = _topk_pairs(spark, sf_dir, "ann_lsh_multitable_topk")
    assert len(brute & ivf) / len(brute) >= 0.5
    assert len(brute & multi) / len(brute) >= 0.4
    # OR-amplification must not lose the single-table candidates' recall
    single = _topk_pairs(spark, sf_dir, "ann_lsh_topk")
    assert len(brute & multi) >= len(brute & single)
    # Trained (k-means) centroids must beat the untrained seeds at the
    # same nprobe (measured 0.70 vs 0.56 at sf0.001).
    kmeans = _topk_pairs(spark, sf_dir, "ann_ivf_kmeans_topk")
    assert len(brute & kmeans) / len(brute) >= 0.6
    assert len(brute & kmeans) >= len(brute & ivf)
    # PQ + exact re-rank (measured 0.48 at sf0.001 — synthetic uniform
    # vectors are near-worst-case for product quantization; raw ADC
    # ordering alone measured 0.18, so the re-rank stage carries it).
    pq = _topk_pairs(spark, sf_dir, "ann_pq_topk")
    assert len(brute & pq) / len(brute) >= 0.4
    # IVF-PQ compounds both approximations (cell recall x ADC-shortlist
    # recall; measured 0.38 at sf0.001 on these uniform vectors).
    ivfpq = _topk_pairs(spark, sf_dir, "ann_ivfpq_topk")
    assert len(brute & ivfpq) / len(brute) >= 0.3


def test_ivfpq_recall_at_realistic_operating_point(spark, sf_dir):
    """Knob-to-recall floors at settings a user would ship (VERDICT r3
    #5). Uniform synthetic vectors are near-worst-case for the COARSE
    quantizer (true neighbors are barely closer than random, so the
    NN's cell is ~random — absolute recall with real pruning caps
    around 0.78 on this data regardless of PQ settings), so the PQ/
    rerank stage is pinned RELATIVE to exact search over the same
    probed cells, isolating the approximation these knobs control;
    one absolute floor runs with the quantizer out of the way."""
    from pyspark.sql import functions as F

    from sql_engine_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    kw = dict(id_col="vec_id", vec_col="embedding", k=5)

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    # Same cells as the pinned compound point (4 cells, nprobe=2): with
    # rerank = 10x k and a 32-entry codebook, IVF-PQ must recover >= 80%
    # of what EXACT search over those cells returns (measured 0.84); at
    # rerank = 20x k even a 16-entry codebook recovers >= 85% (measured
    # 0.92) — the rerank knob, not codebook size, carries recall.
    ivf = pairs(ivf_topk(q, c, num_centroids=4, nprobe=2, **kw))
    pq_ship = pairs(
        ivfpq_topk(q, c, num_centroids=4, nprobe=2, subspaces=8,
                   sub_centroids=32, dim=64, rerank=50, **kw)
    )
    assert len(ivf & pq_ship) / len(ivf) >= 0.8
    pq_deep = pairs(
        ivfpq_topk(q, c, num_centroids=4, nprobe=2, subspaces=8,
                   sub_centroids=16, dim=64, rerank=100, **kw)
    )
    assert len(ivf & pq_deep) / len(ivf) >= 0.85
    # Absolute floor with the coarse quantizer neutralized (nprobe =
    # num_centroids): PQ codes + 20x-k exact re-rank alone reach >= 0.8
    # of brute force (measured 0.82).
    brute = pairs(brute_force_topk(q, c, **kw))
    pq_all = pairs(
        ivfpq_topk(q, c, num_centroids=4, nprobe=4, subspaces=8,
                   sub_centroids=32, dim=64, rerank=100, **kw)
    )
    assert len(brute & pq_all) / len(brute) >= 0.8


def test_minhash_lsh_bucket_cap_bounds_hot_bucket(spark):
    """A boilerplate corpus (many identical docs) lands in one band bucket;
    the cap must bound the candidate blowup while distinct near-dup pairs
    outside the hot bucket survive."""
    from sql_engine_spark.operators.dedup import minhash_lsh_pairs

    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(40)]
    # A genuine near-dup pair with its own (non-hot) signature.
    distinct = [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(boiler + distinct, "doc_id int, text string")

    uncapped = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.2)
    n_uncapped = uncapped.count()
    assert n_uncapped >= 40 * 39 / 2  # hot bucket went quadratic

    capped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.2, max_bucket_size=10
    )
    rows = capped.collect()
    # Hot-bucket (40 identical docs) pairs are dropped; the distinct
    # near-dup pair survives via its own small bucket.
    assert (100, 101) in {(r.id_a, r.id_b) for r in rows}
    assert len(rows) < n_uncapped
    assert all(not (r.id_a < 40 and r.id_b < 40) for r in rows)


def test_kmeans_centroids_partitioning_invariant(spark, sf_dir):
    """The ordered per-dimension reduction must make trained centroids
    bit-identical regardless of input partitioning — the property that
    lets an external oracle reproduce them."""
    from pyspark.sql import functions as SF

    from sql_engine_spark.functions.vectors import l2_norm, normalized
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.similarity import kmeans_centroids

    emb = load(spark, sf_dir, "embeddings").where(SF.col("vec_id") >= 10)
    norm = (
        emb.select(SF.col("vec_id").alias("neighbor_id"), SF.col("embedding").alias("__v"))
        .withColumn("__n", l2_norm("__v"))
        .withColumn("__nv", normalized("__v", "__n"))
        .select("neighbor_id", "__nv")
    )

    def train(df):
        cents = kmeans_centroids(
            df, id_col="neighbor_id", vec_col="__nv", num_centroids=4, iterations=2
        )
        return {r["cent_id"]: tuple(r["__ce"]) for r in cents.collect()}

    a = train(norm.repartition(1))
    b = train(norm.repartition(13, "neighbor_id"))
    assert a.keys() == b.keys()
    for cid in a:
        assert a[cid] == b[cid], f"centroid {cid} differs across partitionings"


def _exact_cosine_pairs(spark, sf_dir, threshold):
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.similarity import embedding_cosine_pairs

    emb = load(spark, sf_dir, "embeddings").withColumn("__b", F.lit(1))
    exact = embedding_cosine_pairs(
        emb, id_col="vec_id", vec_col="embedding", block_col="__b", threshold=threshold
    )
    return {(r.id_a, r.id_b): r.cosine for r in exact.collect()}


def test_semantic_dedup_recall_floors(spark, sf_dir):
    """LSH bucketing quality graded against exact all-pairs cosine (not
    just oracle-matched): the OR-amplified multitable variant must hit
    pinned recall floors (measured 0.65 overall / 0.70 on the >=0.4
    stratum at sf0.001), beat the single-table variant, and both must
    have EXACT precision (stage-2 verification admits no false pair)."""
    exact = _exact_cosine_pairs(spark, sf_dir, 0.25)
    single = {
        (r.id_a, r.id_b)
        for r in all_queries()["dedup_semantic_verified"].build(spark, sf_dir).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in all_queries()["dedup_semantic_multitable"].build(spark, sf_dir).collect()
    }
    assert single <= set(exact)  # precision 1.0
    assert multi <= set(exact)
    assert len(multi & set(exact)) / len(exact) >= 0.55
    stratum = {p for p, c in exact.items() if c >= 0.4}
    if stratum:
        assert len(multi & stratum) / len(stratum) >= 0.6
    assert len(multi) > len(single)  # OR-amplification must actually amplify


def test_semantic_dedup_finds_planted_near_dups(spark):
    """On a corpus WITH true near-duplicates (the synthetic embeddings
    top out at cosine 0.48), the multitable pipeline must recover nearly
    all planted pairs at a SemDeDup-realistic threshold."""
    import hashlib
    import struct

    from sql_engine_spark.operators.similarity import semantic_dup_pairs_multitable

    def direction(seed: int, dim: int = 16) -> list[float]:
        out: list[float] = []
        i = 0
        while len(out) < dim:
            d = hashlib.md5(f"{seed}-{i}".encode()).digest()
            out.extend(
                struct.unpack("<i", d[j : j + 4])[0] / 2**31 for j in range(0, 16, 4)
            )
            i += 1
        return out[:dim]

    rows = []
    for k in range(25):
        base = direction(k)
        noise = direction(k + 1000)
        dup = [x + 0.02 * y for x, y in zip(base, noise)]
        rows.append((k, base))
        rows.append((k + 500, dup))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    found = {
        (r.id_a, r.id_b)
        for r in semantic_dup_pairs_multitable(
            df, id_col="vec_id", vec_col="embedding",
            planes=4, tables=8, dim=16, threshold=0.9,
        ).collect()
    }
    planted = {(k, k + 500) for k in range(25)}
    assert len(found & planted) / len(planted) >= 0.9


def test_curate_observation_metrics(spark, sf_dir):
    """Stage metrics must come from the SAME single action (Observation
    piggyback), and be consistent: input >= kept >= output."""
    from sql_engine_spark.queries.pipeline import curate_with_metrics

    out, m = curate_with_metrics(spark, sf_dir)
    assert m["output_rows"] == out.count()
    assert m["input_rows"] >= m["kept_rows"] >= m["output_rows"] > 0
    assert m["input_tokens"] > m["input_rows"]  # >1 token per doc on average
    out.unpersist()


def test_cc_loop_plan_stays_flat(spark, sf_dir):
    """The connected-components loop references the previous round's
    labels twice per iteration; without lineage control the physical
    plan doubles per round UNBOUNDEDLY (r3 measured a 181-Exchange
    plan that also re-ran the pair pipeline per leaf). Since r12 the
    measured-small-graph path deliberately inlines the fixed 3 rounds
    as broadcast joins over a flat checkpointed edge leaf — a
    2^3-bounded plan whose duplicate exchanges dedupe via runtime
    exchange reuse — so the healthy plan is ~18 Exchange nodes, not
    the old checkpoint-per-round ~6. The bound guards the unbounded
    class (a 4th-round doubling lands ~36)."""
    import re

    df = all_queries()["dedup_keep_best"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = len(re.findall(r"\bExchange\b", plan))
    assert n_exchanges <= 24, f"CC lineage blew up again: {n_exchanges} exchanges"


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's defining property: two docs sharing a token run of
    length >= w + k - 1 (here 4 + 3 - 1 = 6) must share at least one
    fingerprint; disjoint-vocabulary docs must share none."""
    from sql_engine_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    df = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight {shared} nine ten eleven twelve"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id int, text string",
    )
    fps = winnow_fingerprints(df, id_col="doc_id", text_col="text", k=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 6-token run produced no common fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_luhn_validator_known_cards(spark):
    """Ground-truth Luhn vectors: the canonical test PANs validate, a
    single-digit perturbation fails."""
    from sql_engine_spark.operators.text import pii_luhn_redact

    df = spark.createDataFrame(
        [
            (1, "pay with 4111111111111111 now"),      # canonical Visa test PAN
            (2, "pay with 4111111111111112 now"),      # check digit off by one
            (3, "ref 5500005555555559 and order 1234567890123 done"),
            (4, "no digits here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_luhn_redact(df, "text", "doc_id").collect()}
    assert (rows[1].n_candidates, rows[1].n_valid_cards) == (1, 1)
    assert "<CARD>" in rows[1].clean_text and "4111" not in rows[1].clean_text
    assert (rows[2].n_candidates, rows[2].n_valid_cards) == (1, 0)
    assert "4111111111111112" in rows[2].clean_text  # invalid run untouched
    assert rows[3].n_candidates == 2  # 16-digit PAN + 13-digit order id
    assert rows[3].n_valid_cards == 1  # only the Mastercard test PAN passes
    assert (rows[4].n_candidates, rows[4].n_valid_cards) == (0, 0)


def test_shared_ngram_stats_planted_duplicates(spark):
    """Two docs sharing a long boilerplate span must show shared 5-grams;
    a vocabulary-disjoint doc must show zero."""
    from sql_engine_spark.operators.dedup import release_cached, shared_ngram_stats

    boiler = "terms of service apply to all users of this site always"
    df = spark.createDataFrame(
        [
            (1, boiler + " alpha beta"),
            (2, boiler + " gamma delta"),
            (3, "completely unrelated words nothing repeats here at all ok"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in shared_ngram_stats(df, id_col="doc_id", text_col="text").collect()}
    release_cached()
    assert rows[1].n_shared_grams >= 7  # the 11-token boilerplate run
    assert rows[2].n_shared_grams >= 7
    assert rows[3].n_shared_grams == 0 and rows[3].shared_frac == 0.0


def test_importance_weights_favor_target_lang(spark, sf_dir):
    """Docs in the target distribution (lang='en') must average a higher
    importance weight than the rest — the defining DSIR property."""
    from pyspark.sql import functions as F

    df = all_queries()["curation_importance_weights"].build(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    j = df.join(docs, "doc_id")
    avg_en = j.where(F.col("lang") == "en").agg(F.avg("weight")).first()[0]
    avg_rest = j.where(F.col("lang") != "en").agg(F.avg("weight")).first()[0]
    assert avg_en > avg_rest


def test_mixture_sample_flattens_strata(spark, sf_dir):
    """Every stratum's kept count must respect its sqrt(min/n) rate, and
    at least one singleton stratum must be kept whole (rate 1)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = all_queries()["curation_mixture_sample"].build(spark, sf_dir)
    n = {(r.source, r.lang): r.n for r in
         docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()}
    k = {(r.source, r.lang): r.k for r in
         kept.groupBy("source", "lang").agg(F.count("*").alias("k")).collect()}
    import math

    min_n = min(n.values())
    assert 0 < sum(k.values()) < sum(n.values())  # real downsampling happened
    singletons = [s for s, cnt in n.items() if cnt == min_n]
    assert any(k.get(s, 0) == n[s] for s in singletons)  # rate-1 stratum intact
    for s, cnt in n.items():
        rate = math.sqrt(min_n / cnt)
        assert k.get(s, 0) <= cnt
        # kept/n concentrates around rate; allow binomial slack on tiny strata
        assert abs(k.get(s, 0) - rate * cnt) <= max(4.0, 3 * math.sqrt(cnt))


def test_block_dedup_removes_planted_boilerplate(spark):
    """A 10-token block planted in two docs must vanish from BOTH; unique
    blocks survive and re-join in order; an all-duplicate doc empties."""
    from sql_engine_spark.operators.dedup import release_cached
    from sql_engine_spark.operators.text import block_dedup

    boiler = "one two three four five six seven eight nine ten"  # 1 block
    df = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, boiler + " lambda mu nu xi omicron pi rho sigma tau upsilon"),
            (3, boiler),  # only the duplicated block -> empties
            (4, "totally unique words that appear nowhere else at all ok"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            block_dedup(df, id_col="doc_id", text_col="text", block_tokens=10).collect()}
    release_cached()
    assert rows[1].n_blocks == 2 and rows[1].n_kept_blocks == 1
    assert rows[1].clean_text == "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert rows[2].clean_text.startswith("lambda mu")
    assert rows[3].n_kept_blocks == 0 and rows[3].clean_text == ""
    assert rows[4].n_kept_blocks == 1 and rows[4].clean_text == rows[4].clean_text.strip()


def test_winnow_pairs_detects_copied_run(spark):
    """Two docs sharing a >= w+k-1 token run must pair up (winnowing's
    shared-fingerprint guarantee feeds the pair counter); disjoint docs
    must not pair."""
    from sql_engine_spark.operators.dedup import release_cached
    from sql_engine_spark.operators.text import winnow_pairs

    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token run
    df = spark.createDataFrame(
        [
            (1, "intro words here " + run),
            (2, run + " closing words there"),
            (3, "completely different vocabulary nothing shared whatsoever here"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.n_shared_fps for r in
             winnow_pairs(df, id_col="doc_id", text_col="text",
                          k=3, w=4, min_shared=1).collect()}
    release_cached()
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


def test_range_search_exact_on_verified_pairs(spark, sf_dir):
    """Every returned (query, neighbor) must truly satisfy the threshold
    (precision is exact by construction), and the result must be a
    subset of brute force at the same threshold."""
    from pyspark.sql import functions as F

    from sql_engine_spark.operators.similarity import brute_force_topk

    out = all_queries()["ann_range_search"].build(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r.cosine >= 0.28 for r in rows)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = brute_force_topk(
        emb.where(F.col("vec_id") < 10), emb.where(F.col("vec_id") >= 10),
        id_col="vec_id", vec_col="embedding", k=1000,
    ).where(F.col("cosine") >= 0.28)
    truth = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert got <= truth
    assert len(got) / len(truth) >= 0.5  # LSH recall floor at this dial
