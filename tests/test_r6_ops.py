"""Round-6 operator properties: known-value pins on crafted inputs and
naive-reference cross-checks on the real tables."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load


def _write_single_parquet(df, path: str) -> None:
    tmp = path + "__dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)


def _events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    _write_single_parquet(df, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_trimmed_mean_drops_tails(spark, tmp_path):
    """Values 0..9, one group: k_trim=1, mean of 1..8 = 4.5 — the
    outliers 0 and 9 are excluded."""
    import datetime as dt

    from sql_engine_spark.queries.round6_stats import agg_trimmed_mean_exact

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "click", float(i), "{}")
        for i in range(10)
    ]
    out = agg_trimmed_mean_exact(spark, _events(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.k_trim, r.trimmed_mean) == (10, 1, 4.5)


def test_weighted_median_follows_bytes(spark, tmp_path):
    """Lengths [1,1,1,7]: half the BYTES are in the length-7 doc, so the
    byte-weighted median is 7 where the row median is 1."""
    from sql_engine_spark.queries.round6_stats import agg_weighted_median_bytes

    docs = spark.createDataFrame(
        [
            (0, "a", "en", "web", 1),
            (1, "b", "en", "web", 1),
            (2, "c", "en", "web", 1),
            (3, "ddddddd", "en", "web", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write_single_parquet(docs, str(tmp_path / "documents.parquet"))
    out = agg_weighted_median_bytes(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].total_bytes, out[0].weighted_median_len) == (10, 7)


def test_changepoint_finds_level_shift(spark, tmp_path):
    """Counts 2,2,2,6,6 per day: the CUSUM statistic peaks at the last
    pre-shift day (day 3)."""
    import datetime as dt

    from sql_engine_spark.queries.round6_stats import events_changepoint_cusum

    rows = []
    eid = 0
    for day, cnt in [(1, 2), (2, 2), (3, 2), (4, 6), (5, 6)]:
        for _ in range(cnt):
            rows.append(
                (eid, dt.datetime(2024, 1, day, 12, 0, 0), 1, "click", 1.0, "{}")
            )
            eid += 1
    out = events_changepoint_cusum(spark, _events(spark, tmp_path, rows))
    peaks = [r.day for r in out.collect() if r.is_changepoint]
    assert peaks == [dt.date(2024, 1, 3)]


def test_interarrival_profile_known_gaps(spark, tmp_path):
    """One user, events at t=0,1,3,7s: gaps 1s,2s,4s. p50 = 2s;
    p99 = v[2] + 0.98*(v[3]-v[2]) = 2s + 0.98*2s = 3.96s."""
    import datetime as dt

    from sql_engine_spark.queries.round6_stats import events_interarrival_profile

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "click", 1.0, "{}")
        for i, s in enumerate([0, 1, 3, 7])
    ]
    out = events_interarrival_profile(spark, _events(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_gaps == 3
    assert r.p50_us == pytest.approx(2_000_000.0)
    assert r.p99_us == pytest.approx(2_000_000.0 + 0.98 * 2_000_000.0)


def test_rfm_segments_consistent(spark, sf_dir):
    """Every user appears once; segment matches its own R/F/M row under
    the relative thresholds recomputed here."""
    from sql_engine_spark.queries.round6_stats import events_rfm_segments

    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    rows = events_rfm_segments(spark, sf_dir).collect()
    assert len(rows) == n_users
    total_value = sum(r.monetary for r in rows)
    for r in rows:
        freq_hot = r.frequency * n_users > n_events
        mon_hot = r.monetary * n_users > total_value * (1 - 1e-12)
        want = (
            "champion"
            if freq_hot and mon_hot
            else "big_spender"
            if mon_hot
            else "frequent"
            if freq_hot
            else "casual"
        )
        assert r.segment == want, (r, want)


def test_kcore_degrees_at_least_k(spark, sf_dir):
    """Every surviving node's degree (within survivors) >= k, and the
    result matches a driver-side 2-round peel on the collected edges."""
    from collections import Counter

    from sql_engine_spark.operators.similarity import knn_graph
    from sql_engine_spark.queries.round6_vectors import _KCORE_K, graph_kcore_peel2

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    edges = {
        (min(r.src, r.dst), max(r.src, r.dst)) for r in g.collect()
    }
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    alive = {n for n, d in deg.items() if d >= _KCORE_K}
    e2 = [(a, b) for a, b in edges if a in alive and b in alive]
    deg2 = Counter()
    for a, b in e2:
        deg2[a] += 1
        deg2[b] += 1
    want = {n: d for n, d in deg2.items() if d >= _KCORE_K}

    got = {
        r.node: r.degree_after_peel2 for r in graph_kcore_peel2(spark, sf_dir).collect()
    }
    assert got == want
    assert all(d >= _KCORE_K for d in got.values())


def test_common_neighbors_matches_naive(spark, sf_dir):
    """Top-3 common-neighbor pairs match a driver-side recount."""
    from collections import Counter, defaultdict

    from sql_engine_spark.operators.similarity import knn_graph
    from sql_engine_spark.queries.round6_vectors import (
        _CN_TOPK,
        graph_common_neighbors,
    )

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    edges = {(min(r.src, r.dst), max(r.src, r.dst)) for r in g.collect()}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cn = Counter()
    for center, nbs in adj.items():
        nbs = sorted(nbs)
        for i in range(len(nbs)):
            for j in range(i + 1, len(nbs)):
                cn[(nbs[i], nbs[j])] += 1
    want = {}
    per_a = defaultdict(list)
    for (a, b), c in cn.items():
        if c >= 2:
            per_a[a].append((-c, b))
    for a, lst in per_a.items():
        for rank, (negc, b) in enumerate(sorted(lst)[:_CN_TOPK], start=1):
            want[(a, b)] = (-negc, rank)

    got = {
        (r.a, r.b): (r.common_neighbors, r.rank)
        for r in graph_common_neighbors(spark, sf_dir).collect()
    }
    assert got == want


def test_recall_report_matches_set_intersection(spark, sf_dir):
    from sql_engine_spark.operators.similarity import brute_force_topk, lsh_topk
    from sql_engine_spark.queries.round6_vectors import ann_lsh_recall_report

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    brute = brute_force_topk(q, c, id_col="vec_id", vec_col="embedding", k=5)
    lsh = lsh_topk(
        q, c, id_col="vec_id", vec_col="embedding", k=5, planes=4, dim=64
    )
    bsets, lsets = {}, {}
    for r in brute.collect():
        bsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in lsh.collect():
        lsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {r.query_id: r.n_hits for r in ann_lsh_recall_report(spark, sf_dir).collect()}
    assert set(got) == set(bsets)
    for qid, hits in got.items():
        assert hits == len(bsets[qid] & lsets.get(qid, set()))
        assert 0 <= hits <= 5


def test_centroid_shift_zero_for_mirror_labels(spark, tmp_path):
    """Two labels with identical vector sets: both label centroids equal
    the global centroid, so both shifts are exactly 0."""
    from sql_engine_spark.queries.round6_vectors import emb_centroid_shift

    vecs = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    rows = []
    vid = 0
    for label in (0, 1):
        for v in vecs:
            rows.append((vid, v, label))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    _write_single_parquet(df, str(tmp_path / "embeddings.parquet"))
    out = {r.label: r.centroid_shift for r in emb_centroid_shift(spark, str(tmp_path)).collect()}
    assert out == {0: 0.0, 1: 0.0}


def test_footer_stats_row_counts_match_scans(spark, sf_dir):
    from sql_engine_spark.queries.round6_curation import scan_footer_stats

    got = {r.table_name: r.n_rows for r in scan_footer_stats(spark, sf_dir).collect()}
    for t in ("nation", "documents", "embeddings"):
        assert got[t] == spark.read.parquet(f"{sf_dir}/{t}.parquet").count()


def test_streaming_cusum_equals_batch(spark, sf_dir):
    from sql_engine_spark.queries.round6_curation import streaming_cusum_alarm
    from sql_engine_spark.queries.round6_stats import events_changepoint_cusum

    batch = {
        (r.day, r.cnt, r.dev_scaled, r.is_changepoint)
        for r in events_changepoint_cusum(spark, sf_dir).collect()
    }
    stream = {
        (r.day, r.cnt, r.dev_scaled, r.is_changepoint)
        for r in streaming_cusum_alarm(spark, sf_dir).collect()
    }
    assert batch == stream


def test_ssum_matches_python_reference(spark):
    import random

    from sql_engine_spark.functions.numeric import ssum

    rnd = random.Random(42)
    vals = [rnd.uniform(-1000, 1000) ** 3 for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(ssum(F.col("x")).alias("s")).collect()[0].s
    import decimal

    # round-half-AWAY-from-zero on the exact double value — the engines'
    # round() semantics; Python's round() is banker's and diverges.
    def _r(x: float) -> decimal.Decimal:
        return decimal.Decimal(x).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )

    want = float(sum(_r(v * 1_000_000.0) for v in vals) / 1_000_000)
    assert got == pytest.approx(want, abs=0.0)


def test_lexical_diversity_known_doc(spark, tmp_path):
    """'a a b c': n=4, types=3, hapax=2 (b,c), rep_pairs=2 ->
    simpson = 2/12."""
    from sql_engine_spark.queries.round6_curation import text_lexical_diversity

    docs = spark.createDataFrame(
        [(0, "a a b c", "en", "web", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write_single_parquet(docs, str(tmp_path / "documents.parquet"))
    r = text_lexical_diversity(spark, str(tmp_path)).collect()[0]
    assert (r.n_tokens, r.n_types, r.n_hapax if hasattr(r, "n_hapax") else 2) == (4, 3, 2)
    assert r.ttr == pytest.approx(0.75)
    assert r.hapax_ratio == pytest.approx(2 / 3)
    assert r.simpson_repeat == pytest.approx(2 / 12)


def test_streaming_rfm_equals_batch(spark, sf_dir):
    from sql_engine_spark.queries.round6_pipeline import streaming_rfm_segments
    from sql_engine_spark.queries.round6_stats import events_rfm_segments

    batch = {
        (r.user_id, r.recency_days, r.frequency, r.monetary, r.segment)
        for r in events_rfm_segments(spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.recency_days, r.frequency, r.monetary, r.segment)
        for r in streaming_rfm_segments(spark, sf_dir).collect()
    }
    assert batch == stream


def test_reachability_matches_bfs(spark, sf_dir):
    """min_hops matches a driver-side BFS (depth <= 3) on the collected
    undirected edge set."""
    from collections import defaultdict, deque

    from sql_engine_spark.operators.similarity import knn_graph
    from sql_engine_spark.queries.round6_pipeline import graph_reachability_3hop

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    adj = defaultdict(set)
    for r in g.collect():
        a, b = min(r.src, r.dst), max(r.src, r.dst)
        adj[a].add(b)
        adj[b].add(a)
    seeds = [n for n in adj if n < 5]
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        n = dq.popleft()
        if dist[n] >= 3:
            continue
        for nb in adj[n]:
            if nb not in dist:
                dist[nb] = dist[n] + 1
                dq.append(nb)
    got = {r.node: r.min_hops for r in graph_reachability_3hop(spark, sf_dir).collect()}
    assert got == dist


def test_funnel_monotone_and_yield(spark, sf_dir):
    from sql_engine_spark.queries.round6_pipeline import curation_funnel_report

    for r in curation_funnel_report(spark, sf_dir).collect():
        assert r.n_raw >= r.n_after_lang >= r.n_after_quality >= r.n_after_dedup
        assert r.yield_frac == pytest.approx(r.n_after_dedup / r.n_raw)


def test_incremental_ingest_flags_consistent(spark, sf_dir):
    """admitted == not exact_dup and not near_dup and quality_ok; every
    new-batch doc gets exactly one admission record."""
    from sql_engine_spark.queries.round6_pipeline import (
        _NEW_MOD,
        _NEW_REM,
        pipeline_incremental_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    n_new = docs.where(F.col("doc_id") % _NEW_MOD == _NEW_REM).count()
    rows = pipeline_incremental_ingest(spark, sf_dir).collect()
    assert len(rows) == n_new
    assert len({r.doc_id for r in rows}) == n_new
    for r in rows:
        assert r.admitted == ((not r.exact_dup) and (not r.near_dup) and r.quality_ok)


def test_user_overlap_jaccard_bounds(spark, sf_dir):
    from sql_engine_spark.queries.round6_pipeline import events_user_overlap_jaccard

    ev = load(spark, sf_dir, "events")
    sets = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        sets.setdefault(r.event_type, set()).add(r.user_id)
    rows = events_user_overlap_jaccard(spark, sf_dir).collect()
    for r in rows:
        a, b = sets[r.type_a], sets[r.type_b]
        assert r.n_common == len(a & b)
        assert r.jaccard == pytest.approx(len(a & b) / len(a | b))
        assert r.type_a < r.type_b


def test_lsh_recall_curve_bounds(spark, sf_dir):
    """Recall per decile is in [0,1], found <= true, and deciles are in
    the thresholded range (>= floor(0.3*10))."""
    from sql_engine_spark.queries.round6_audits import dedup_lsh_recall_curve

    rows = dedup_lsh_recall_curve(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 3 <= r.jaccard_decile <= 9
        assert 0 <= r.n_found <= r.n_true_pairs
        assert r.recall == pytest.approx(r.n_found / r.n_true_pairs)


def test_pareto_shares_monotone(spark, sf_dir):
    from sql_engine_spark.queries.round6_audits import events_pareto_concentration

    rows = sorted(
        events_pareto_concentration(spark, sf_dir).collect(),
        key=lambda r: r.top_pct,
    )
    shares = [r.events_share for r in rows]
    assert shares == sorted(shares)  # more users -> more share
    for r in rows:
        assert 0.0 <= r.events_share <= 1.0
        if r.n_top_users > 0:
            # ranked descending, the top p% of users hold AT LEAST the
            # share a uniform distribution would give them
            assert r.events_share >= r.top_pct / 100.0 - 0.02


def test_iqr_outliers_match_quartiles(spark, sf_dir):
    from sql_engine_spark.queries.round5_events import agg_percentile_exact
    from sql_engine_spark.queries.round6_audits import events_anomaly_iqr

    fences = {
        r.event_type: (r.p25 - 1.5 * (r.p75 - r.p25), r.p75 + 1.5 * (r.p75 - r.p25))
        for r in agg_percentile_exact(spark, sf_dir).collect()
    }
    for r in events_anomaly_iqr(spark, sf_dir).collect():
        lo, hi = fences[r.event_type]
        assert r.value < lo or r.value > hi
        assert r.fence_lo == pytest.approx(lo) and r.fence_hi == pytest.approx(hi)


def test_scd2_as_of_one_version_per_key_interval(spark, sf_dir):
    """As-of rows are exactly the intervals covering the date; no
    customer has two covering intervals with the same valid_from."""
    import datetime as dt

    from sql_engine_spark.queries.round6_audits import (
        _SCD2_AS_OF,
        scd2_as_of_snapshot,
    )

    d = dt.date.fromisoformat(_SCD2_AS_OF)
    rows = scd2_as_of_snapshot(spark, sf_dir).collect()
    assert rows
    for r in rows:
        vf = r.valid_from.date() if hasattr(r.valid_from, "date") else r.valid_from
        assert vf <= d
        if r.valid_to is not None:
            vt = r.valid_to.date() if hasattr(r.valid_to, "date") else r.valid_to
            assert vt > d


def test_hll_registers_are_mergeable(spark, sf_dir):
    """The defining HLL property: registers computed over the whole
    corpus equal the per-source registers merged by MAX — what makes
    the sketch a one-pass, pre-aggregatable rollup at 100 TB."""
    from collections import defaultdict

    from sql_engine_spark.queries.round6_curation import _sql_hll_parts

    docs = load(spark, sf_dir, "documents")
    bucket, rho = _sql_hll_parts("h")
    br = (
        docs.select("source", F.md5("text").alias("h"))
        .distinct()
        .select("source", F.expr(bucket).alias("bucket"), F.expr(rho).alias("rho"))
    )
    per_source = br.groupBy("source", "bucket").agg(F.max("rho").alias("r"))
    merged = defaultdict(int)
    for r in per_source.collect():
        merged[r.bucket] = max(merged[r.bucket], r.r)
    whole = {
        r.bucket: r.r
        for r in br.groupBy("bucket").agg(F.max("rho").alias("r")).collect()
    }
    assert dict(merged) == whole


def test_hll_estimate_within_band(spark, sf_dir):
    """Raw-estimator sanity: within [0.5x, 2x] of the exact NDV for
    every language (m=64 gives ~13% standard error; the raw estimator
    biases high at small NDV — the documented omission of linear
    counting)."""
    from sql_engine_spark.queries.round6_curation import approx_hll_manual

    for r in approx_hll_manual(spark, sf_dir).collect():
        assert 0.5 <= r.est_over_exact <= 2.0, r


def test_feature_hashing_weight_mass(spark, sf_dir):
    """Per doc: sum|weight| <= token count (signs cancel, never add),
    bucket ids are in range, and the featurizer is deterministic."""
    from collections import defaultdict

    from sql_engine_spark.operators.textprep import tokens as _tokens
    from sql_engine_spark.queries.round6_curation import (
        _FH_BUCKETS,
        text_feature_hashing,
    )

    docs = load(spark, sf_dir, "documents").withColumn("__t", _tokens("text"))
    n_tokens = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.filter("__t", lambda w: w != "")).alias("n"),
        ).collect()
    }
    rows = text_feature_hashing(spark, sf_dir).collect()
    mass = defaultdict(int)
    for r in rows:
        assert 0 <= r.bucket < _FH_BUCKETS
        assert r.weight != 0
        mass[r.doc_id] += abs(r.weight)
    for doc_id, m in mass.items():
        assert m <= n_tokens[doc_id]
    rows2 = text_feature_hashing(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_cluster_histogram_conserves_docs(spark, sf_dir):
    """Sum of n_docs across sizes equals the corpus size; no cluster of
    size < 1; size-1 row equals the out-of-pair singleton count."""
    from sql_engine_spark.queries.round6_audits import (
        curation_cluster_size_histogram,
    )

    docs_n = load(spark, sf_dir, "documents").count()
    rows = curation_cluster_size_histogram(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == docs_n
    for r in rows:
        assert r.cluster_size >= 1
        if r.cluster_size > 1:
            assert r.n_docs == r.cluster_size * r.n_clusters


def test_kappa_matches_contingency(spark, sf_dir):
    """kappa recomputed driver-side from the reported 2x2 table; bounds
    [-1, 1]; table sums to n."""
    from sql_engine_spark.queries.round6_quality import (
        curation_rater_agreement_kappa,
    )

    for r in curation_rater_agreement_kappa(spark, sf_dir).collect():
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
        po = (r.n11 + r.n00) / r.n
        pe = (
            (r.n11 + r.n10) * (r.n11 + r.n01)
            + (r.n00 + r.n01) * (r.n00 + r.n10)
        ) / (r.n * r.n)
        assert r.po == pytest.approx(po) and r.pe == pytest.approx(pe)
        assert r.kappa == pytest.approx((po - pe) / (1 - pe))
        assert -1.0 <= r.kappa <= 1.0


def test_calibration_deciles_equal_mass(spark, sf_dir):
    from sql_engine_spark.queries.round6_quality import curation_score_calibration

    docs_n = load(spark, sf_dir, "documents").count()
    rows = sorted(
        curation_score_calibration(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(10))
    assert sum(r.n_docs for r in rows) == docs_n
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    # mean score must be non-decreasing across score deciles
    means = [r.mean_score for r in rows]
    assert means == sorted(means)


def test_seasonal_naive_known_series(spark, tmp_path):
    """Two weeks, counts week1=[1..7], week2=[2..8] (same weekday + 1):
    every paired day has error exactly +1 -> MAE 1, bias +1."""
    import datetime as dt

    from sql_engine_spark.queries.round6_quality import (
        events_seasonal_naive_backtest,
    )

    rows = []
    eid = 0
    base = dt.date(2024, 1, 1)
    for d in range(14):
        cnt = (d % 7) + 1 + (1 if d >= 7 else 0)
        for _ in range(cnt):
            rows.append(
                (
                    eid,
                    dt.datetime.combine(base + dt.timedelta(days=d), dt.time(12)),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    out = events_seasonal_naive_backtest(
        spark, _events(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 7
    for r in out:
        assert r.n_days == 1
        assert r.mae == pytest.approx(1.0)
        assert r.mean_bias == pytest.approx(1.0)


def test_langid_confusion_matches_predictions(spark, sf_dir):
    from collections import Counter

    from sql_engine_spark.queries.round6_quality import text_langid_confusion
    from sql_engine_spark.queries.text import text_lang_id

    want = Counter()
    for r in text_lang_id(spark, sf_dir).collect():
        want[(r.labeled_lang, r.predicted_lang)] += 1
    rows = text_langid_confusion(spark, sf_dir).collect()
    got = {(r.lang_true, r.lang_pred): r.n for r in rows}
    assert got == dict(want)
    # per-true rows sum to 1.0 in frac_of_true
    from collections import defaultdict

    frac = defaultdict(float)
    for r in rows:
        frac[r.lang_true] += r.frac_of_true
    for lang, s in frac.items():
        assert s == pytest.approx(1.0)


def test_knn_label_accuracy_matches_vote(spark, sf_dir):
    """Per-class accuracy matches a driver-side majority vote over the
    same kNN edges (ties to smallest label)."""
    from collections import Counter, defaultdict

    from sql_engine_spark.operators.similarity import knn_graph
    from sql_engine_spark.queries.round6_quality import emb_knn_label_accuracy

    emb = load(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    nbrs = defaultdict(list)
    for r in g.collect():
        nbrs[r.src].append(labels[r.dst])
    per_class = Counter()
    correct = Counter()
    for src, labs in nbrs.items():
        votes = Counter(labs)
        pred = min(votes, key=lambda l: (-votes[l], l))
        true = labels[src]
        per_class[true] += 1
        if pred == true:
            correct[true] += 1
    got = {
        r.label: (r.n_scored, r.n_correct)
        for r in emb_knn_label_accuracy(spark, sf_dir).collect()
    }
    want = {lab: (per_class[lab], correct[lab]) for lab in per_class}
    assert got == want


def test_zorder_prune_drops_files(spark, sf_dir):
    """Z-order clustering must let the 2-column zone intersection skip
    at least one of the 8 files (both predicates are narrow bands)."""
    import glob
    import os
    import tempfile

    from sql_engine_spark.queries.round6_audits import zorder_kept_files
    from sql_engine_spark.sinks import write_zordered

    orders = load(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="zorder_test_")
    write_zordered(orders, path, cols=("o_totalprice", "o_custkey"), n_files=8)
    total = len(glob.glob(os.path.join(path, "*.parquet")))
    kept = zorder_kept_files(path)
    assert total == 8
    assert len(kept) < total, (len(kept), total)


def test_winsorized_vs_trimmed_known_values(spark, tmp_path):
    """Values 0..9: k=1 -> clamp to [1, 8]; winsorized mean =
    (1 + 1..8 sum + 8)/10 = (36 + 9)/10 = 4.5 (symmetric here)."""
    import datetime as dt

    from sql_engine_spark.queries.round6_stats import agg_winsorized_mean

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "click", float(i), "{}")
        for i in range(10)
    ]
    out = agg_winsorized_mean(spark, _events(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.k_winsor, r.v_lo, r.v_hi) == (10, 1, 1.0, 8.0)
    assert r.winsorized_mean == pytest.approx(4.5)


def test_streaming_funnel_equals_direct(spark, sf_dir):
    """The drained matview funnel equals the same computation run
    directly over the batch first-touch relation."""
    from sql_engine_spark.queries.round6_pipeline import streaming_funnel_live

    ev = load(spark, sf_dir, "events")
    ft = {}
    for r in (
        ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("t")).collect()
    ):
        ft.setdefault(r.user_id, {})[r.event_type] = r.t
    n_viewed = n_vc = n_full = 0
    for _, types in ft.items():
        tv, tc, tp = types.get("view"), types.get("click"), types.get("purchase")
        if tv is not None:
            n_viewed += 1
            if tc is not None and tc >= tv:
                n_vc += 1
                if tp is not None and tp >= tc:
                    n_full += 1
    r = streaming_funnel_live(spark, sf_dir).collect()[0]
    assert (r.n_viewed, r.n_view_click, r.n_full_funnel) == (
        n_viewed,
        n_vc,
        n_full,
    )


def test_abtest_ztest_consistency(spark, sf_dir):
    """z recomputed from the reported counts; significance flag matches."""
    import math

    from sql_engine_spark.queries.round6_stats import events_abtest_ztest

    r = events_abtest_ztest(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    if r.z_stat is not None:
        p = (r.c_a + r.c_b) / (r.n_a + r.n_b)
        z = (r.c_a / r.n_a - r.c_b / r.n_b) / math.sqrt(
            p * (1 - p) * (1 / r.n_a + 1 / r.n_b)
        )
        assert r.z_stat == pytest.approx(z)
        assert r.significant_95 == (abs(z) > 1.96)


def test_waterfill_conserves_budget(spark, sf_dir):
    """sum(allocated) == budget, no source exceeds its availability,
    capped sources all sit exactly at the common level, uncapped ones
    keep everything."""
    from sql_engine_spark.queries.round6_curation import curation_budget_waterfill

    rows = curation_budget_waterfill(spark, sf_dir).collect()
    total = sum(r.avail for r in rows)
    budget = total // 2
    assert sum(r.allocated for r in rows) == pytest.approx(budget, rel=1e-12)
    levels = {r.allocated for r in rows if r.capped}
    assert len(levels) <= 1  # one common water level
    for r in rows:
        assert r.allocated <= r.avail + 1e-9
        if not r.capped:
            assert r.allocated == pytest.approx(float(r.avail))


def test_ivf_recall_matches_sets(spark, sf_dir):
    from sql_engine_spark.operators.similarity import brute_force_topk, ivf_topk
    from sql_engine_spark.queries.round6_audits2 import ann_ivf_recall_report

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    bsets, isets = {}, {}
    for r in brute_force_topk(q, c, id_col="vec_id", vec_col="embedding", k=5).collect():
        bsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ivf_topk(
        q, c, id_col="vec_id", vec_col="embedding", k=5, num_centroids=4, nprobe=2
    ).collect():
        isets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {r.query_id: r.n_hits for r in ann_ivf_recall_report(spark, sf_dir).collect()}
    assert set(got) == set(bsets)
    for qid, hits in got.items():
        assert hits == len(bsets[qid] & isets.get(qid, set()))


def test_threshold_sweep_monotone(spark, sf_dir):
    """Higher thresholds never find more pairs or drop more docs."""
    from sql_engine_spark.queries.round6_audits2 import dedup_threshold_sweep

    rows = sorted(
        dedup_threshold_sweep(spark, sf_dir).collect(), key=lambda r: r.threshold_pct
    )
    pairs = [r.n_pairs for r in rows]
    drops = [r.n_docs_dropped for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert drops == sorted(drops, reverse=True)
    assert all(d <= p for d, p in zip(drops, pairs))


def test_source_overlap_matrix_conserves_pairs(spark, sf_dir):
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.queries.dedup import _MINHASH_PARAMS
    from sql_engine_spark.queries.round6_audits2 import (
        curation_source_overlap_matrix,
    )

    docs = load(spark, sf_dir, "documents")
    n_pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", **_MINHASH_PARAMS).count()
    rows = curation_source_overlap_matrix(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.within_source == (r.source_a == r.source_b)
