"""Round-5 fix pins: the three round-4 `weak` scale items.

1. prefix-filter dfs broadcast is SIZE-GATED (review: distinct shingles
   grow ~linearly with corpus tokens — an unconditional broadcast OOMs
   at 100 TB); both plans produce identical pairs.
2. SimHash shipped at the corpus-scalable 64-bit operating point; the
   bit scheme extension is backward-compatible for bits <= 32.
3. Zone-map stats come from parquet footers (driver-side metadata, no
   Spark scan), matching the full-scan stats build exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.io import load


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_prefix_filter_gate_plans_agree(spark, sf_dir):
    """broadcast_df True/False must return the identical pair set; the
    hint must appear in exactly the True plan."""
    from sql_engine_spark.operators.dedup import prefix_filter_pairs

    docs = load(spark, sf_dir, "documents")
    hinted = prefix_filter_pairs(
        docs, "doc_id", "text", threshold=0.3, broadcast_df=True
    )
    plain = prefix_filter_pairs(
        docs, "doc_id", "text", threshold=0.3, broadcast_df=False
    )
    assert "ResolvedHint" in _analyzed(hinted)
    assert "ResolvedHint" not in _analyzed(plain)
    got_h = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in hinted.collect()}
    got_p = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in plain.collect()}
    assert got_h == got_p and got_h


def test_prefix_filter_gate_auto_drops_hint_above_threshold(
    spark, sf_dir, monkeypatch
):
    """With the size cap forced to 0 the auto path must plan the
    shuffle equi-join (no broadcast hint) — the 100 TB posture."""
    import sql_engine_spark.operators.dedup as D

    monkeypatch.setattr(D, "_PREFIX_DF_BROADCAST_MAX_SRC_BYTES", 0)
    docs = load(spark, sf_dir, "documents")
    df = D.prefix_filter_pairs(docs, "doc_id", "text", threshold=0.3)
    assert "ResolvedHint" not in _analyzed(df)
    # And the default gate broadcasts for this tiny fixture.
    monkeypatch.setattr(D, "_PREFIX_DF_BROADCAST_MAX_SRC_BYTES", 64 << 20)
    df2 = D.prefix_filter_pairs(docs, "doc_id", "text", threshold=0.3)
    assert "ResolvedHint" in _analyzed(df2)


def test_simhash_bit_scheme_backward_compatible(spark, sf_dir):
    """Bits 1..32 of the extended scheme must equal the historical
    32-bit fingerprint: the 64-bit upgrade changes NO existing bit."""
    from sql_engine_spark.operators.dedup import simhash_bits
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents").limit(50)
    both = docs.select(
        tokens("text").alias("__t")
    ).select(
        simhash_bits("__t", 32).alias("s32"),
        simhash_bits("__t", 64).alias("s64"),
    )
    rows = both.collect()
    assert rows
    for r in rows:
        assert len(r.s64) == 64
        assert r.s64[:32] == r.s32


def test_simhash_hamming_64bit_complete_vs_naive(spark, sf_dir):
    """Pigeonhole completeness at the SHIPPED 64/4/d=2 operating point:
    block-joined pairs == naive all-pairs Hamming <= 2, exactly."""
    from sql_engine_spark.operators.dedup import (
        _hamming_expr,
        simhash_bits,
        simhash_hamming_pairs,
    )
    from sql_engine_spark.operators.textprep import tokens

    bits, d = 64, 2
    docs = load(spark, sf_dir, "documents").limit(150)
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
            F.expr(_hamming_expr("a.sig", "b.sig", bits))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= d)
        .collect()
    }
    assert got == naive


def test_zonemap_footer_stats_match_full_scan(spark, tmp_path):
    """The footer reader must reproduce the full-scan stats build
    (file, n_rows, min, max) exactly on a multi-file zoned table."""
    from sql_engine_spark.operators.zonemap import (
        collect_file_stats,
        footer_file_stats,
    )

    src = spark.range(0, 5000).withColumn("v", (F.col("id") * 3).cast("double"))
    path = str(tmp_path / "zoned")
    src.repartitionByRange(6, "v").write.mode("overwrite").parquet(path)
    scan = {
        r.file.replace("file://", ""): (r.n_rows, r.min_val, r.max_val)
        for r in collect_file_stats(spark, path, "v").collect()
    }
    foot = {
        z.file: (z.n_rows, z.min_val, z.max_val) for z in footer_file_stats(path, "v")
    }
    assert foot == scan and len(foot) == 6


def test_zonemap_stats_need_no_spark_session(spark, tmp_path):
    """footer_file_stats is pure driver-side metadata: it must work
    given only a path (proof there is no hidden Spark scan), and the
    pruned read must schedule ONLY surviving files."""
    from sql_engine_spark.operators.zonemap import footer_file_stats, pruned_read

    src = spark.range(0, 4000).withColumn("v", F.col("id").cast("double"))
    path = str(tmp_path / "zoned2")
    src.repartitionByRange(8, "v").write.mode("overwrite").parquet(path)
    zones = footer_file_stats(path, "v")  # no SparkSession argument
    assert len(zones) == 8 and all(z.has_stats for z in zones)
    df, kept, total = pruned_read(spark, path, "v", 500.0, 999.0)
    assert kept < total == 8
    scanned = {f.replace("file://", "") for f in df.inputFiles()}
    surviving = {
        z.file for z in zones if not (z.max_val < 500.0 or z.min_val > 999.0)
    }
    assert scanned == surviving
    assert df.count() == 500


def test_derived_planes_scales_with_corpus():
    """Pin the derivation: bounded buckets (~target rows each) as the
    corpus grows, floored for tiny corpora, capped for huge ones."""
    from sql_engine_spark.operators.similarity import derived_planes

    assert derived_planes(0) == 4
    assert derived_planes(1000) == 4  # <= target -> floor
    assert derived_planes(16 * 1024) == 4
    assert derived_planes(1 << 20) == 10  # 1M rows -> 1024 buckets
    assert derived_planes(1 << 30) == 20  # capped
    assert derived_planes(1 << 40) == 20
    # Monotone non-decreasing in n.
    vals = [derived_planes(n) for n in (10, 10**4, 10**6, 10**8, 10**10)]
    assert vals == sorted(vals)


def test_lsh_topk_derives_planes_from_corpus(spark, sf_dir):
    """planes=None must derive from the corpus count and still produce
    ranked rows (tiny fixture -> floor of 4 planes)."""
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.similarity import lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.limit(3)
    explicit = lsh_topk(
        queries, emb, id_col="vec_id", vec_col="embedding", k=5, planes=4
    )
    derived = lsh_topk(
        queries, emb, id_col="vec_id", vec_col="embedding", k=5, planes=None
    )
    got_e = {(r.query_id, r.neighbor_id, r.rank) for r in explicit.collect()}
    got_d = {(r.query_id, r.neighbor_id, r.rank) for r in derived.collect()}
    assert got_d == got_e and got_d  # tiny corpus: derived == floor == 4


def _ring_graph(spark, n=12):
    from pyspark.sql import functions as F

    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    ).unionByName(
        spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") + 3) % n).alias("dst")
        )
    )
    return nodes, edges


def test_pagerank_checkpoint_preserves_values(spark):
    """checkpoint_every must not change a single rank bit."""
    from sql_engine_spark.operators.graph import pagerank_fixed

    nodes, edges = _ring_graph(spark)
    plain = {
        r.node: r.pagerank
        for r in pagerank_fixed(nodes, edges, iterations=6).collect()
    }
    ckpt = {
        r.node: r.pagerank
        for r in pagerank_fixed(
            nodes, edges, iterations=6, checkpoint_every=2
        ).collect()
    }
    assert ckpt == plain and len(plain) == 12


def test_pagerank_deep_iterations_flat_plan(spark):
    """At iterations=10 with checkpointing the final plan must be flat:
    rooted in a checkpointed RDD scan, not 10 nested join+agg rounds."""
    from sql_engine_spark.operators.graph import pagerank_fixed

    nodes, edges = _ring_graph(spark)
    df = pagerank_fixed(nodes, edges, iterations=10, checkpoint_every=2)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    # Lineage truncated: the deep-round joins are gone from the plan.
    assert plan.count("Join") <= 2
    ranks = {r.node: r.pagerank for r in df.collect()}
    assert len(ranks) == 12
    assert abs(sum(ranks.values()) - 1.0) < 0.05


def test_matview_merge_is_idempotent_on_retry(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a batch id must NOT
    double-count (round-4 advice). Replay batch 0 and batch 1 twice
    each; the view must equal the one-shot aggregate exactly."""
    from sql_engine_spark.streaming.matview import IdempotentMatView

    view = IdempotentMatView(
        str(tmp_path / "mv"),
        partial_of=lambda b: b.groupBy("k").agg(F.count("*").alias("n")),
        combine=lambda cur, p: cur.unionByName(p)
        .groupBy("k")
        .agg(F.sum("n").alias("n")),
    )
    b0 = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    b1 = spark.createDataFrame([("a",), ("c",)], ["k"])
    view.merge(b0, 0)
    view.merge(b0, 0)  # task retry of the same trigger
    view.merge(b1, 1)
    view.merge(b1, 1)  # retried again
    view.merge(b0, 0)  # stale replay after later progress
    got = {r.k: r.n for r in view.read(spark).collect()}
    assert got == {"a": 3, "b": 1, "c": 1}
    assert view.last_applied() == 1


def test_sentinel_files_stamped_strictly_last(spark, sf_dir, tmp_path):
    """stamp_files_last must give appended files mtimes strictly above
    every chunk file's, so FileStreamSource orders them last."""
    import os

    from sql_engine_spark.streaming.source import (
        list_part_files,
        stamp_files_last,
        table_replay_chunks,
    )

    out_dir, _ = table_replay_chunks(
        spark, sf_dir, "events", ["ts", "event_id"], 3, str(tmp_path / "replay")
    )
    before = list_part_files(out_dir)
    spark.range(1).select(F.lit(1).alias("x")).coalesce(1).write.mode(
        "append"
    ).parquet(out_dir)
    added = stamp_files_last(out_dir, before)
    assert added
    max_before = max(os.path.getmtime(f) for f in before)
    assert all(os.path.getmtime(f) > max_before for f in added)


def test_perplexity_degenerate_group_is_middle(spark, tmp_path):
    """A single-doc (and a zero-variance) language must emit z=NULL /
    bucket 'middle' — not NULL-by-division or inf (round-4 advice)."""
    from sql_engine_spark.queries.curation import curation_perplexity_buckets

    docs = spark.createDataFrame(
        [
            (1, "zz", "alpha beta gamma delta"),
            (2, "yy", "same text here", ),
            (3, "yy", "same text here", ),
            (4, "en", "one two three"),
            (5, "en", "completely different words entirely"),
        ],
        ["doc_id", "lang", "text"],
    ).withColumn("source", F.lit("s")).withColumn("url", F.lit("u"))
    path = str(tmp_path)
    docs.write.mode("overwrite").parquet(path + "/documents.parquet")
    out = {r.doc_id: r for r in curation_perplexity_buckets(spark, path).collect()}
    assert out[1].z is None and out[1].bucket == "middle"  # n = 1
    assert out[2].z is None and out[2].bucket == "middle"  # zero variance
    assert out[3].z is None and out[3].bucket == "middle"


def test_derived_rank_buckets_scales():
    from sql_engine_spark.operators.prefix import derived_rank_buckets

    assert derived_rank_buckets(0) == 32
    assert derived_rank_buckets(10**6) == 32
    assert derived_rank_buckets(32 * 10**6) == 32
    assert derived_rank_buckets(10**8) == 100
    assert derived_rank_buckets(10**10) == 10000
    vals = [derived_rank_buckets(n) for n in (10, 10**6, 10**8, 10**10)]
    assert vals == sorted(vals)


def test_derived_bloom_bits_scales():
    from sql_engine_spark.operators.bloom import (
        BLOOM_MAX_BITS,
        derived_bloom_bits,
    )

    assert derived_bloom_bits(0) == 8192
    assert derived_bloom_bits(500) == 8192
    assert derived_bloom_bits(10_000) == 131072  # >= 10 bits/key, pow2
    assert derived_bloom_bits(10**9) == BLOOM_MAX_BITS  # capped
