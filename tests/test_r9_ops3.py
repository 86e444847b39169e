"""Round-9 quality/diagnostics set: independent Python recompute pins."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_spiegelhalter_z_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT n_chars, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    lo = float(min(r[0] for r in rows))
    hi = float(max(r[0] for r in rows))
    num = den = 0.0
    for nc, lang in rows:
        p = (nc - lo) / (hi - lo)
        y = 1.0 if lang == "en" else 0.0
        num += (y - p) * (1 - 2 * p)
        den += (1 - 2 * p) ** 2 * p * (1 - p)
    got = _build(spark, sf_dir, "quality_spiegelhalter_z").collect()[0]
    assert got.n == len(rows)
    assert got.num == pytest.approx(num, abs=1e-6)
    assert got.den == pytest.approx(den, abs=1e-6)
    assert got.spiegelhalter_z == pytest.approx(num / math.sqrt(den), rel=1e-5)
    assert got.miscalibrated_5pct == (abs(num / math.sqrt(den)) > 1.96)


@pytest.fixture(scope="module")
def daily(sf_dir):
    rows = duckdb.sql(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS c
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    return [int(c) for _, c in rows]


def test_turning_points_matches_python(spark, sf_dir, daily):
    turns = sum(
        1
        for i in range(1, len(daily) - 1)
        if (daily[i] > daily[i - 1] and daily[i] > daily[i + 1])
        or (daily[i] < daily[i - 1] and daily[i] < daily[i + 1])
    )
    n_int = len(daily) - 2
    exp = 2.0 * n_int / 3.0
    z = (turns - exp) / math.sqrt((16.0 * len(daily) - 29.0) / 90.0)
    got = _build(spark, sf_dir, "events_turning_points").collect()[0]
    assert (got.n_days, got.n_turns) == (len(daily), turns)
    assert got.expected_turns == pytest.approx(exp)
    assert got.z == pytest.approx(z)


def test_ljung_box_matches_python(spark, sf_dir, daily):
    d = len(daily)
    mean = sum(daily) / d
    dev = [c - mean for c in daily]
    s0 = sum(v * v for v in dev)
    acc = 0.0
    for k in range(1, 8):
        rk = sum(dev[t] * dev[t - k] for t in range(k, d)) / s0
        acc += rk * rk / (d - k)
    q = d * (d + 2.0) * acc
    got = _build(spark, sf_dir, "events_ljung_box").collect()[0]
    assert (got.n_days, got.h_lags) == (d, 7)
    assert got.ljung_box_q == pytest.approx(q, rel=1e-5)


def test_energy_distance_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    # sf0.001 has 500 rows > target 100 -> the derived sample engages;
    # mirror the threshold exactly.
    from sql_engine_spark.operators.similarity import derived_sample_hex
    import hashlib

    thr = derived_sample_hex(len(rows), target_train_rows=100)
    if thr is not None:
        rows = [
            r
            for r in rows
            if hashlib.md5(str(r[0]).encode()).hexdigest()[: len(thr)] < thr
        ]
    pts = [((r[1] % 2 == 0), [float(x) for x in r[2]]) for r in rows]

    def d(a, b):
        return math.sqrt(
            max(0.0, sum(x * x for x in a) - 2 * sum(x * y for x, y in zip(a, b)) + sum(y * y for y in b))
        )

    sums = defaultdict(lambda: [0.0, 0])
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            gi, gj = pts[i][0], pts[j][0]
            kind = "xx" if gi and gj else "yy" if not gi and not gj else "xy"
            sums[kind][0] += d(pts[i][1], pts[j][1])
            sums[kind][1] += 1
    means = {k: s / n for k, (s, n) in sums.items()}
    got = _build(spark, sf_dir, "emb_energy_distance_sampled").collect()[0]
    assert got.n_x == sum(1 for g, _ in pts if g)
    assert got.n_y == sum(1 for g, _ in pts if not g)
    # mean folds through dsum (1e-6 DECIMAL grain per pair distance)
    assert got.mean_cross == pytest.approx(means["xy"], abs=1e-5)
    assert got.energy_distance == pytest.approx(
        2 * means["xy"] - means["xx"] - means["yy"], abs=3e-5
    )


def test_suppression_plan_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT lang, source, COUNT(*) FROM '{sf_dir}/documents.parquet'
            GROUP BY 1, 2"""
    ).fetchall()
    per_lang = defaultdict(lambda: [0, 0, 0, 0])
    for lang, _src, n in rows:
        e = per_lang[lang]
        e[0] += 1
        if n < 5:
            e[1] += 1
            e[2] += n
        else:
            e[3] += n
    got = {r.lang: r for r in _build(spark, sf_dir, "privacy_suppression_plan").collect()}
    assert set(got) == set(per_lang)
    for lang, (g, sg, lost, kept) in per_lang.items():
        r = got[lang]
        assert (r.n_groups, r.n_suppressed_groups, r.rows_lost, r.rows_kept) == (
            g,
            sg,
            lost,
            kept,
        )
        assert r.loss_frac == pytest.approx(lost / (lost + kept))


# --------------------------------------------------------------------------
# Round-9 vectors/clusters/engine batch
# --------------------------------------------------------------------------


def test_ivf_balance_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
            WHERE vec_id >= 10 ORDER BY vec_id"""
    ).fetchall()
    seeds = []
    for vid, emb in rows[:4]:
        e = [float(x) for x in emb]
        n = math.sqrt(sum(x * x for x in e))
        seeds.append((vid, [x / n for x in e]))
    counts = defaultdict(int)
    for vid, emb in rows:
        e = [float(x) for x in emb]
        best = max(
            seeds, key=lambda s: (sum(a * b for a, b in zip(e, s[1])), -s[0])
        )
        counts[best[0]] += 1
    got = {r.cent_id: r for r in _build(spark, sf_dir, "ann_ivf_balance_audit").collect()}
    assert {k: r.n_vectors for k, r in got.items()} == dict(counts)
    n = sum(counts.values())
    for k, r in got.items():
        assert r.share == pytest.approx(counts[k] / n)
        assert r.load_factor == pytest.approx(counts[k] / n * 4.0)


def test_cluster_purity_matches_python(spark, sf_dir):
    from sql_engine_spark.registry import all_queries as _aq

    docs = duckdb.sql(
        f"SELECT doc_id, md5(text) FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    tg_by_key = {}
    for d, k in docs:
        tg_by_key[k] = min(tg_by_key.get(k, d), d)
    cc = {
        r.doc_id: r.cluster_id
        for r in _build(spark, sf_dir, "dedup_connected_components").collect()
    }
    cells = defaultdict(int)
    for d, k in docs:
        cells[(cc.get(d, d), tg_by_key[k])] += 1
    by_cl = defaultdict(int)
    by_tg = defaultdict(int)
    for (cl, tg), c in cells.items():
        by_cl[cl] = max(by_cl[cl], c)
        by_tg[tg] = max(by_tg[tg], c)
    n = len(docs)
    p = sum(by_cl.values()) / n
    ip = sum(by_tg.values()) / n
    got = _build(spark, sf_dir, "curation_cluster_purity").collect()[0]
    assert got.n_docs == n
    assert (got.n_clusters, got.n_truth_groups) == (len(by_cl), len(by_tg))
    assert got.purity == pytest.approx(p)
    assert got.inverse_purity == pytest.approx(ip)
    assert got.f_purity == pytest.approx(2 * p * ip / (p + ip))


def test_component_histogram_matches_python(spark, sf_dir):
    from sql_engine_spark.operators.graph import knn_graph_shared

    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in knn_graph_shared(spark, sf_dir).collect()
    }
    # 3 rounds of min-label propagation, same as the fixed-iteration op.
    nodes = {n for e in edges for n in e}
    label = {n: n for n in nodes}
    for _ in range(3):
        nxt = dict(label)
        for a, b in edges:
            m = min(label[a], label[b])
            nxt[a] = min(nxt[a], m)
            nxt[b] = min(nxt[b], m)
        label = nxt
    spine = duckdb.sql(
        f"SELECT vec_id FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    comp = defaultdict(int)
    for (vid,) in spine:
        comp[label.get(vid, vid)] += 1
    hist = defaultdict(int)
    for sz in comp.values():
        hist[sz] += 1
    got = {
        r.component_size: r
        for r in _build(spark, sf_dir, "graph_component_size_histogram").collect()
    }
    assert {k: r.n_components for k, r in got.items()} == dict(hist)
    for k, r in got.items():
        assert r.n_nodes == k * hist[k]


def test_shingle_simpson_matches_python(spark, sf_dir):
    import hashlib

    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    per = defaultdict(lambda: defaultdict(int))
    for _d, src, text in rows:
        toks = text.strip().lower().split()
        if len(toks) < 3:
            sh = {" ".join(toks)}
        else:
            sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        for s in sh:
            per[src][hashlib.md5(s.encode()).hexdigest()] += 1
    got = {
        r.source: r
        for r in _build(spark, sf_dir, "text_shingle_simpson_by_source").collect()
    }
    assert set(got) == set(per)
    for src, digs in per.items():
        r = got[src]
        tot = sum(digs.values())
        s2 = sum(c * c for c in digs.values())
        assert (r.n_distinct_shingles, r.n_total) == (len(digs), tot)
        assert r.simpson_lambda == pytest.approx(s2 / (tot * tot))


def test_select_star_except_schema_and_rows(spark, sf_dir):
    df = _build(spark, sf_dir, "select_star_except")
    assert df.columns == ["doc_id", "lang", "source", "n_chars"]
    want = duckdb.sql(
        f"""SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'
            WHERE n_chars % 7 = 0"""
    ).fetchone()[0]
    assert df.count() == want


# --------------------------------------------------------------------------
# Quadrant aHash + Chebyshev check
# --------------------------------------------------------------------------


def test_quadrant_ahash_matches_python(spark, sf_dir):
    import hashlib

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    qhashes = {}
    for doc_id, text in rows:
        digs = [
            hashlib.md5(f"{text}#{c}".encode()).hexdigest() for c in range(4)
        ]
        grid = {}
        for i in range(8):
            for j in range(8):
                p = 8 * i + j
                h = digs[p // 16]
                b = p % 16
                grid[(i, j)] = 16 * int(h[2 * b], 16) + int(h[2 * b + 1], 16)
        for quad in range(4):
            qi, qj = divmod(quad, 2)
            cells = {
                (i, j): v
                for (i, j), v in grid.items()
                if i // 4 == qi and j // 4 == qj
            }
            s = sum(cells.values())
            bits = 0
            for (i, j), v in cells.items():
                if 16 * v > s:
                    bits |= 1 << (4 * (i % 4) + (j % 4))
            qhashes[(doc_id, quad)] = bits
    pairs = defaultdict(int)
    by_qh = defaultdict(list)
    for (d, q), hsh in qhashes.items():
        by_qh[(q, hsh)].append(d)
    for (_q, _h), docs in by_qh.items():
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pairs[(docs[i], docs[j])] += 1
    got = {
        (r.id_a, r.id_b): r.n_quadrant_matches
        for r in _build(spark, sf_dir, "multimodal_quadrant_ahash").collect()
    }
    assert got == dict(pairs)


def test_chebyshev_check_matches_python(spark, sf_dir, daily):
    n = len(daily)
    s1 = sum(daily)
    q = sum(c * c for c in daily)
    got = {r.k: r for r in _build(spark, sf_dir, "agg_chebyshev_bound_check").collect()}
    for k in (2, 3, 4):
        within = sum(
            1 for c in daily if (n * c - s1) ** 2 < k * k * (n * q - s1 * s1)
        )
        r = got[k]
        assert (r.n_days, r.n_within) == (n, within)
        assert r.frac_within == pytest.approx(within / n)
        assert r.chebyshev_floor == pytest.approx(1 - 1 / k**2)
        assert r.satisfied == (within / n >= 1 - 1 / k**2)
