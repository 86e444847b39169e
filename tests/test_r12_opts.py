"""Round-12 optimization pins: changed operator internals must stay
bit-identical to the spellings they replaced."""

from __future__ import annotations

from pyspark.sql import functions as F


def _two(res):
    """(out, state) from a batch-state step result; steps may return a
    third element (frames to unpersist after the commits, r12 advice)."""
    return res[0], res[1]


def test_packed_hamming_equals_unrolled(spark, sf_dir):
    """The r12 bit_count(xor)-over-packed-words Hamming verify
    (operators/dedup.simhash_hamming_pairs_from_digests) must equal the
    per-character unrolled _hamming_expr for every pair, including at a
    bit width that exercises the 32-bit word remainder (48 = 32 + 16)."""
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.dedup import (
        _hamming_expr,
        simhash_bits_from_digests,
        tokens,
    )

    for bits in (48, 64):
        docs = load(spark, sf_dir, "documents").limit(60)
        digs = docs.select(
            F.col("doc_id").alias("__id"), tokens("text").alias("__t")
        ).withColumn("__digs", F.expr("transform(__t, t -> md5(t))"))
        sigs = digs.select(
            "__id", simhash_bits_from_digests("__digs", bits).alias("__sig")
        )
        n_words = (bits + 31) // 32
        word_cols = [
            F.conv(
                F.substring("__sig", w * 32 + 1, min(32, bits - w * 32)), 2, 10
            )
            .cast("long")
            .alias(f"__w{w}")
            for w in range(n_words)
        ]
        packed = sigs.select("__id", "__sig", *word_cols)
        a, b = packed.alias("a"), packed.alias("b")
        ham_packed = " + ".join(
            f"bit_count(a.__w{w} ^ b.__w{w})" for w in range(n_words)
        )
        rows = (
            a.join(b, F.col("a.__id") < F.col("b.__id"))
            .select(
                F.expr(ham_packed).cast("long").alias("packed"),
                F.expr(_hamming_expr("a.__sig", "b.__sig", bits))
                .cast("long")
                .alias("unrolled"),
            )
            .collect()
        )
        assert rows, "no pairs built"
        assert all(r.packed == r.unrolled for r in rows)


def test_bootstrap_weight_column_equals_inlined(spark, sf_dir):
    """The r12 materialized __v byte in agg_bootstrap_mean_ci must
    reproduce the inlined _boot_weight_sql weights integer-for-integer
    (same md5-derived byte, same Poisson thresholds)."""
    from sql_engine_spark.io import load
    from sql_engine_spark.queries.round7_stats2 import (
        _BOOT_B,
        _POIS_THRESHOLDS,
        _boot_weight_sql,
    )

    ev = load(spark, sf_dir, "events").select("event_id").limit(500)
    reps = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    inlined = reps.withColumn(
        "w", F.expr(_boot_weight_sql("event_id", "b", "STRING"))
    )
    v = (
        "((instr('0123456789abcdef', substring(md5(concat("
        "CAST(event_id AS STRING), '-', CAST(b AS STRING))), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(md5(concat("
        "CAST(event_id AS STRING), '-', CAST(b AS STRING))), 2, 1)) - 1))"
    )
    arms = " + ".join(
        f"(CASE WHEN __v >= {t} THEN 1 ELSE 0 END)" for t in _POIS_THRESHOLDS
    )
    materialized = reps.withColumn("__v", F.expr(v)).withColumn(
        "w2", F.expr(arms)
    )
    joined = inlined.join(materialized, ["event_id", "b"])
    assert joined.where(F.col("w") != F.col("w2")).count() == 0


def test_cc_small_path_equals_checkpoint_path(spark, sf_dir, monkeypatch):
    """The r12 measured-size CC paths (broadcast/no-checkpoint for small
    graphs vs width-pinned checkpointed loop for large ones) differ only
    in physical strategy: the label relation must be identical row for
    row on the same pair input."""
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.queries.dedup import _shared_pairs

    pairs = _shared_pairs(spark, sf_dir)
    small = {
        tuple(r)
        for r in D.connected_components_fixed(
            pairs, "id_a", "id_b", iterations=3
        ).collect()
    }
    # Force the large-graph (checkpointed) branch for the same input.
    monkeypatch.setattr(D, "_CC_SMALL_EDGES", -1)
    large = {
        tuple(r)
        for r in D.connected_components_fixed(
            pairs, "id_a", "id_b", iterations=3
        ).collect()
    }
    assert small, "no CC labels built"
    assert small == large


def test_lsh_candidates_verify_factoring(spark, sf_dir):
    """minhash_lsh_pairs_from_hs == verify(minhash_lsh_candidates_from_hs):
    the factored candidate set, exact-verified, must reproduce the
    verified pair relation exactly — the equivalence that lets
    dedup_lsh_recall_curve join truth pairs (already J >= t) against
    bare candidates and skip the verify leg."""
    from pyspark.sql import functions as F

    from sql_engine_spark.operators import dedup as D

    hs = D.shingle_hs_shared(spark, sf_dir)
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs_from_hs(hs, threshold=0.3).collect()
    }
    cands = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates_from_hs(hs).collect()
    }
    assert pairs <= cands, "verified pairs must be a candidate subset"
    # And intersecting candidates with the truth relation (J >= t) is
    # exactly the verified set: verify the candidates and compare.
    verified = {
        (r.id_a, r.id_b)
        for r in D._verify_jaccard(
            D.minhash_lsh_candidates_from_hs(hs),
            hs.select("__id", "__hs"),
            0.3,
        ).collect()
    }
    assert verified == pairs


def test_interval_overlap_responsible_cell_complete(spark, sf_dir):
    """The responsible-cell dedup must emit every overlapping session
    pair exactly once: compare against a brute-force theta join over
    the same interval relation."""
    from pyspark.sql import functions as F

    from sql_engine_spark.registry import all_queries

    out = all_queries()["join_interval_overlap"].build(spark, sf_dir)
    rows = [tuple(r) for r in out.collect()]
    assert len(rows) == len(set(rows)), "duplicate pair emitted"
    # Brute force: sessions from the SAME query output's interval logic
    # via a theta join on the events table.
    from sql_engine_spark.io import load
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), date_trunc('second', ts))"
    )
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    iv = sess.groupBy("user_id", F.col("sid").cast("long").alias("sid")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    a, b = iv.alias("a"), iv.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.user_id"),
            F.col("a.sid"),
            F.col("b.user_id").alias("ub"),
            F.col("b.sid").alias("sb"),
        )
    )
    got = {(r[0], r[1], r[2], r[3]) for r in rows}
    want = {tuple(r) for r in brute.collect()}
    assert got == want


def test_batchstate_two_commit_protocol(spark, tmp_path):
    """The JVM batch-state runner's exactly-once semantics: a replayed
    batch adds nothing, and a crash BETWEEN the output commit and the
    state commit replays to the identical final content (the output of
    batch k is a pure function of (state after k-1, batch k))."""
    import os

    from sql_engine_spark.streaming.batchstate import (
        _commit_output,
        batchstate_handler,
    )
    from sql_engine_spark.streaming.ewma import ewma_batchstate_step

    rows = [
        (u, f"2030-01-01 00:00:{i:02d}", i * 10 + u, float(i + u))
        for i in range(30)
        for u in (1, 2)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    batches = [
        df.where(F.col("event_id") < 200),
        df.where((F.col("event_id") >= 200) & (F.col("event_id") < 400)),
        df.where(F.col("event_id") >= 400),
    ]
    step = ewma_batchstate_step(4)

    def drain(out_root, state_dir, crash_after_output_of=None):
        os.makedirs(out_root, exist_ok=True)
        os.makedirs(state_dir, exist_ok=True)
        handle, _ = batchstate_handler(spark, out_root, state_dir, step)
        for bid, b in enumerate(batches):
            if crash_after_output_of == bid:
                # Simulate the crash window: output committed, state
                # commit never ran. The restart re-delivers this batch.
                out_df, _st = _two(step(
                    None
                    if bid == 0
                    else spark.read.parquet(os.path.join(state_dir, "current")),
                    b,
                ))
                _commit_output(out_df, out_root, bid)
                handle2, _ = batchstate_handler(
                    spark, out_root, state_dir, step
                )
                handle2(b, bid)  # replay of the same batch
                handle = handle2
                continue
            handle(b, bid)
            handle(b, bid)  # foreachBatch retry: must be a no-op
        return spark.read.parquet(os.path.join(out_root, "batch_*"))

    clean = drain(str(tmp_path / "o1"), str(tmp_path / "s1"))
    crashed = drain(
        str(tmp_path / "o2"), str(tmp_path / "s2"), crash_after_output_of=1
    )
    want = {r.event_id: r.ewma for r in clean.collect()}
    got = {r.event_id: r.ewma for r in crashed.collect()}
    assert len(want) == len(rows)
    assert got == want


def test_asof_batchstate_matches_single_shot_and_ties(spark):
    """The JVM as-of step's cross-batch fold equals the one-shot fold
    over the whole history (carried-state rule exercised), including
    the operators/asof.py tie rules: a simultaneous view matches, and
    equal-ts views break to the max event_id."""
    import datetime

    from sql_engine_spark.streaming.asof import asof_batchstate_step

    t = lambda s: datetime.datetime(2030, 1, 1, 0, 0, s)
    rows = [
        # user 1: view, purchase later in a DIFFERENT batch (carried
        # state must supply the match), then a newer view + purchase.
        (10, 1, t(0), "view"),
        (11, 1, t(1), "click"),  # filtered out
        (20, 1, t(5), "purchase"),
        (30, 1, t(6), "view"),
        (31, 1, t(6), "view"),  # equal-ts views: max event_id wins
        (40, 1, t(7), "purchase"),
        # user 2: simultaneous view matches its purchase (side order);
        # a purchase with NO prior view enriches as NULL.
        (50, 2, t(2), "purchase"),
        (60, 2, t(3), "view"),
        (61, 2, t(3), "purchase"),
    ]
    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string"
    df = spark.createDataFrame(rows, schema)
    step = asof_batchstate_step("view", "purchase")

    def drain(batches):
        state, got = None, {}
        for b in batches:
            out, state = _two(step(state, b))
            out.persist()
            for r in out.collect():
                got[r.event_id] = (r.asof_ts, r.asof_event_id)
            state.persist().count()
        return got

    whole = drain([df])
    split = drain(
        [
            df.where(F.col("event_id") < 30),
            df.where((F.col("event_id") >= 30) & (F.col("event_id") < 50)),
            df.where(F.col("event_id") >= 50),
        ]
    )
    assert whole == split
    assert whole[20] == (t(0), 10)  # carried across batches in `split`
    assert whole[40] == (t(6), 31)  # equal-ts views -> max event_id
    assert whole[50] == (None, None)  # no prior view
    assert whole[61] == (t(3), 60)  # simultaneous view matches


def test_asof_batchstate_strict_order_raises(spark):
    """An out-of-order cross-batch replay must fail loudly (the pandas
    twin's strict_order contract), not silently diverge."""
    import datetime

    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from sql_engine_spark.streaming.asof import asof_batchstate_step

    t = lambda s: datetime.datetime(2030, 1, 1, 0, 0, s)
    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string"
    b1 = spark.createDataFrame([(10, 1, t(5), "view")], schema)
    b2 = spark.createDataFrame([(20, 1, t(3), "purchase")], schema)
    step = asof_batchstate_step("view", "purchase")
    _out, state = _two(step(None, b1))
    state.persist().count()
    out2, state2 = _two(step(state, b2))
    with pytest.raises((Py4JJavaError, PySparkException)) as exc:
        out2.collect()
    assert "out-of-order replay" in str(exc.value)


def test_sessionize_batchstate_matches_single_shot(spark):
    """The JVM sessionize step's cross-batch fold equals the one-shot
    fold over the whole history: carried-open-session EXTENSION (gap <=
    threshold across the batch boundary), carried CLOSE (gap > threshold
    — the carried session must emit ahead of the batch's own sessions
    with the right ordinal), and untouched users pass through."""
    import datetime

    from sql_engine_spark.streaming.sessionize import sessionize_batchstate_step

    t = lambda m, s=0: datetime.datetime(2030, 1, 1, 0, m, s)
    rows = [
        # user 1: session A (0:00, 0:10), gap, session B (45:00) —
        # batch boundary lands INSIDE session A (extension case).
        (1, t(0), 100),
        (1, t(0, 30), 101),
        (1, t(10), 102),
        (1, t(45), 103),
        # user 2: one event per batch, gap > threshold between them
        # (carried-close case: batch 2's first event closes session 1).
        (2, t(0), 200),
        (2, t(50), 201),
        # user 3: only in batch 1 (pass-through in batch 2).
        (3, t(1), 300),
    ]
    schema = "user_id long, ts timestamp_ntz, event_id long"
    df = spark.createDataFrame(rows, schema)
    step = sessionize_batchstate_step(1800)  # 30 min

    def drain(batches):
        state, got = None, []
        for b in batches:
            out, state = _two(step(state, b))
            got.extend(
                (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
                for r in out.collect()
            )
            state.persist().count()
        return sorted(got), state

    whole, st_whole = drain([df])
    split, st_split = drain(
        [df.where(F.col("event_id") % 100 <= 1), df.where(F.col("event_id") % 100 > 1)]
    )
    assert whole == split
    # user 1's closed session A merged across the batch boundary:
    assert (1, 1, t(0), t(10), 3) in split
    # user 2's session 1 closed by batch 2's far event:
    assert (2, 1, t(0), t(0), 1) in split
    # open tails carried, ordinals advanced:
    tails = {
        r.user_id: (r.next_id, r.start, r.last, r.n) for r in st_split.collect()
    }
    assert tails[1] == (2, t(45), t(45), 1)
    assert tails[2] == (2, t(50), t(50), 1)
    assert tails[3] == (1, t(1), t(1), 1)
    assert tails == {
        r.user_id: (r.next_id, r.start, r.last, r.n) for r in st_whole.collect()
    }
