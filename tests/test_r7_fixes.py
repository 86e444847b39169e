"""Round-7 fix pins (VERDICT r6 + ADVICE r6):

1. events_anomaly_mad's plan contains no per-group collect_list — both
   grouped medians run through the bucketed rank machinery (the last
   batch-path full-list buffer, VERDICT r6 'What's wrong' #1).
2. The 3-hop BFS frontier is deduped per hop: the hop-2 frontier row
   count equals its distinct node count (frontiers are node SETS, not
   path bags — 'What's wrong' #2).
3. derived_sample_hex sizes the kmeans training sample to the corpus:
   the kept fraction shrinks as the corpus grows and the sampled-in
   row count stays ~target ('What's wrong' #3).
4. Recall reports divide by the PER-QUERY brute-force count, so a
   query with fewer than k true neighbors still reads recall 1.0 when
   the index returned every one (ADVICE r6 #3).
5. int8_quantize handles NULL embedding vectors explicitly in both
   engines (ADVICE r6 #4).
6. IdempotentMatView.read() is side-effect-free: mid-commit it reads
   the roll-forward state WITHOUT performing the roll (ADVICE r6 #2).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _write_single_parquet(df, path: str) -> None:
    tmp = path + "__dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_anomaly_mad_plan_has_no_collect_list(spark, sf_dir):
    """Both grouped medians must use the bucketed rank + broadcast
    rank-target join, never a per-group value list."""
    qe = _build(spark, sf_dir, "events_anomaly_mad")._jdf.queryExecution()
    assert "collect_list" not in qe.optimizedPlan().toString()


def test_reachability_frontier_deduped(spark, sf_dir):
    """Replicates graph_reachability_3hop's frontier iteration and pins
    that each hop's frontier is a node SET: row count == distinct
    count. Without the per-hop distinct() the frontier is a bag of
    paths (seeds x deg^h rows by hop h)."""
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.similarity import knn_graph
    from sql_engine_spark.queries.round6_pipeline import _MAX_HOPS, _SEED_MAX

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    und = g.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    adj = _persist(
        und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
            und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
        )
    )
    frontier = adj.select("node").distinct().where(F.col("node") < _SEED_MAX)
    # Bag-semantics row volume for comparison: what hop 2 would carry
    # without the dedup.
    bag = frontier
    for hop in range(1, min(_MAX_HOPS, 2) + 1):
        bag = adj.join(bag.select("node"), "node").select(
            F.col("nb").alias("node")
        )
        frontier = (
            adj.join(frontier.select("node"), "node")
            .select(F.col("nb").alias("node"))
            .distinct()
        )
        n = frontier.count()
        assert n == frontier.distinct().count()
    # The dedup must be doing real work by hop 2 on the kNN graph.
    assert bag.count() > frontier.count()
    adj.unpersist()


def test_derived_sample_hex_shrinks_with_corpus():
    from sql_engine_spark.operators.similarity import derived_sample_hex

    # At or under the target: no sampling.
    assert derived_sample_hex(100, target_train_rows=250) is None
    assert derived_sample_hex(250, target_train_rows=250) is None

    def frac(n, t):
        h = derived_sample_hex(n, target_train_rows=t)
        return 1.0 if h is None else int(h, 16) / 16.0 ** len(h)

    # Fraction is monotone non-increasing in the corpus size...
    fracs = [frac(10**e, 250_000) for e in range(2, 14)]
    assert fracs == sorted(fracs, reverse=True)
    # ...and the expected sampled-in count stays ~target at ANY corpus
    # size (r7 advice: the old fixed 2-digit prefix floored the
    # fraction at 1/256, so a 1e12-row corpus sampled ~4e9 rows; the
    # prefix length now scales, bounding the overshoot at ~1/16).
    for n in (10**6, 10**8, 10**10, 10**12):
        kept = frac(n, 250_000) * n
        assert 250_000 <= kept <= 250_000 * 1.07
    # The query-registered operating point actually samples at the
    # test scale factors (corpus 490 at sf0.001/0.01, 1990 at sf0.1).
    assert derived_sample_hex(490, target_train_rows=250) == "83"
    assert derived_sample_hex(1990, target_train_rows=250) == "21"
    assert frac(1990, 250) < frac(490, 250)


def test_recall_denominator_is_per_query_brute_count(spark, tmp_path):
    """A 3-vector corpus has only 3 true neighbors per query: both
    recall reports must read 1.0 (n_true = 3), not 3/5."""
    import pandas as pd

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 10, 11, 12],
                "label": ["q", "a", "b", "c"],
                "embedding": [
                    [1.0, 0.0, 0.5, 0.2] * 16,
                    [0.9, 0.1, 0.4, 0.2] * 16,
                    [0.1, 1.0, 0.0, 0.7] * 16,
                    [0.5, 0.5, 0.5, 0.5] * 16,
                ],
            }
        )
    ).select(
        "vec_id", "label", F.col("embedding").cast("array<float>").alias("embedding")
    )
    _write_single_parquet(emb, str(tmp_path / "embeddings.parquet"))
    for name in ("ann_lsh_recall_report", "ann_ivf_recall_report"):
        rows = _build(spark, str(tmp_path), name).collect()
        assert rows, name
        for r in rows:
            assert r.n_true == 3, (name, r)
            assert r.n_hits <= r.n_true, (name, r)
            assert abs(r.recall - r.n_hits / 3.0) < 1e-12, (name, r)


def test_int8_quantize_null_vector_matches_oracle(spark, tmp_path):
    """NULL embeddings produce NULL stats in BOTH engines (a NULL is
    not an empty vector: empty reads q_l1 = 0, NULL reads q_l1 NULL)."""
    import duckdb
    import pandas as pd

    from sql_engine_spark.operators.quantize import int8_quantize, sql_int8_quantize

    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [[1.0, -2.0], None, [], [0.5, 127.0]],
        }
    )
    emb = spark.createDataFrame(pdf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / "embeddings.parquet")
    _write_single_parquet(emb, path)

    got = {
        r.vec_id: r
        for r in int8_quantize(
            spark.read.parquet(path), id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )
    want = {row[0]: row for row in con.execute(sql_int8_quantize()).fetchall()}

    assert set(got) == set(want) == {0, 1, 2, 3}
    for vid in got:
        g, w = got[vid], want[vid]
        assert (g.n_dims, g.q_l1, g.q_min, g.q_max) == tuple(w[1:5]), vid
        if w[5] is None:
            assert g.recon_mse is None, vid
        else:
            assert abs(g.recon_mse - w[5]) < 1e-12, vid
    # The NULL row specifically: all stats NULL, not zero.
    assert got[1].n_dims is None and got[1].q_l1 is None
    # The empty row keeps its distinct contract: n_dims 0, q_l1 0.
    assert got[2].n_dims == 0 and got[2].q_l1 == 0


def test_matview_read_is_passive_mid_commit(spark, tmp_path):
    """read() must return the roll-forward state mid-commit WITHOUT
    renaming anything — directory mutation belongs to __init__/merge()
    (the single-writer entry points)."""
    from sql_engine_spark.streaming.matview import IdempotentMatView

    def partial_of(df):
        return df.groupBy("k").agg(F.sum("v").alias("total"))

    def combine(cur, part):
        return (
            cur.unionByName(part).groupBy("k").agg(F.sum("total").alias("total"))
        )

    mv = IdempotentMatView(
        str(tmp_path / "view"), partial_of=partial_of, combine=combine
    )
    b0 = spark.createDataFrame([("a", 1)], "k string, v long")
    b1 = spark.createDataFrame([("a", 2), ("b", 5)], "k string, v long")
    mv.merge(b0, 0)

    # Simulate the crash window for batch 1: swap fully written,
    # current renamed away, second rename never ran.
    merged = combine(spark.read.parquet(mv.target), partial_of(b1))
    swap = os.path.join(mv.view_dir, "swap_1")
    merged.write.mode("overwrite").parquet(swap)
    with open(os.path.join(swap, "_applied_batch"), "w") as fh:
        fh.write("1")
    os.rename(mv.target, mv.target + ".old")

    got = {r.k: r.total for r in mv.read(spark).collect()}
    assert got == {"a": 3, "b": 5}
    # No directory mutation happened: the crash state is untouched.
    assert os.path.isdir(swap)
    assert os.path.isdir(mv.target + ".old")
    assert not os.path.isdir(mv.target)
    # merge()'s recovery still completes the commit afterwards.
    mv.merge(b1, 1)  # replay: dropped after roll-forward
    assert os.path.isdir(mv.target)
    assert {r.k: r.total for r in mv.read(spark).collect()} == {"a": 3, "b": 5}


def test_bpe_merges_match_reference_at_depth_20(spark, sf_dir):
    """VERDICT r6 #5: the r5 pin ran only 5 merges, leaving the
    tie-break and merge-application logic unpinned beyond toy depth.
    Run the identical comparison — Spark's vocabulary-relation trainer
    vs a pure-Python greedy BPE (count desc, pair asc tie-break) — at
    20 merge rounds, deep enough that learned multi-char symbols merge
    with each other and tie-breaks on composite symbols occur."""
    from collections import Counter

    from sql_engine_spark.operators.textprep import tokens as _tokens
    from sql_engine_spark.queries.round5_text import _bpe_train

    rounds = 20
    docs = load(spark, sf_dir, "documents").withColumn("__t", _tokens("text"))
    words = Counter()
    for r in docs.select(F.explode("__t").alias("w")).collect():
        if r.w:
            words[r.w] += 1
    vocab = {tuple(w): c for w, c in words.items()}

    got = _bpe_train(spark, sf_dir, rounds=rounds)

    want = []
    for rnd in range(1, rounds + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (l, rr), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, l, rr, l + rr, cnt))
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
    # Depth actually exercised: at least one learned symbol is itself a
    # merge of a previously-merged (multi-char) symbol.
    assert any(len(l) > 1 or len(rr) > 1 for _, l, rr, _, _ in got[5:])
