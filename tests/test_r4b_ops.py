"""Plan-shape pins for the second round-4 operator batch: substring-span
dedup, the hashed linear classifier, and the retrieval pair. Correctness
is covered by the auto-parametrized oracle gate; these tests pin the
SCALE claims the docstrings make."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sql_engine_spark.plans.audit import audit, explain_str
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_substring_spans_island_window_is_per_doc(spark, sf_dir):
    """The only window may be partitioned by doc_id (bounded by document
    length) — never unpartitioned or keyed on a constant."""
    df = _build(spark, sf_dir, "dedup_substring_spans")
    plan = explain_str(df, "formatted")
    for m in re.finditer(r"Window \[([^\]]*)\]", plan):
        assert "doc_id" in m.group(0)
    a = audit(df)
    assert a.reads_only("doc_id", "text")


def test_substring_spans_finds_planted_duplicates(spark):
    """Two docs sharing an 8-token run produce mirrored spans; a unique
    doc produces none; overlapping hits merge into ONE maximal span."""
    shared = "a b c d e f g h i j"  # 10 tokens => 3 overlapping 8-windows
    rows = [
        (1, f"x1 y1 {shared} z1"),
        (2, f"{shared} q2 r2 s2"),
        (3, "entirely unique tokens without any repeated run at all"),
    ]
    from sql_engine_spark.operators.spans import duplicated_spans

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, "doc_id", "text", k=8).collect()
    }
    # doc 1: shared run at tokens 3..12; doc 2: at 1..10. One span each.
    assert got == {(1, 3, 12, 10), (2, 1, 10, 10)}


def test_quality_classifier_is_pure_map(spark, sf_dir):
    """Zero shuffles: no Exchange of any kind in the classifier plan."""
    df = _build(spark, sf_dir, "text_quality_classifier")
    plan = explain_str(df, "formatted")
    assert "Exchange" not in plan
    assert audit(df).reads_only("doc_id", "text")


def test_bm25_no_bare_query_window_and_broadcasts(spark, sf_dir):
    """Ranking must go through the salted two-level top-k: any window
    partitioned by query_id alone would re-open the single-task-sort
    class VERDICT r3 closed. Query terms / dfreq / stats sides must be
    broadcast. Since r13 the registered query scans the process-shared
    materialized ranking, so the guard reads the BUILD pipeline that
    ranked_shared evaluates once per process (the r12 prefix-pair guard
    repoint precedent) — the guarded class is unchanged."""
    from sql_engine_spark.operators import retrieval as R
    from sql_engine_spark.queries.retrieval import _BM25_K, _BM25_QUERIES

    tf, docstats = R.bm25_index_shared(spark, sf_dir)
    df = R.bm25_topk_from_index(tf, docstats, _BM25_QUERIES, k=_BM25_K)
    plan = explain_str(df, "formatted")
    for m in re.finditer(r"partitionBy=\[([^\]]*)\]", plan):
        spec = m.group(1)
        if "query_id" in spec:
            assert "__salt" in spec or "doc_id" in spec or spec.count(",") >= 1, plan
    # the only windows allowed on bare query_id rank <= buckets*k rows;
    # assert the salted window exists at all
    assert "__salt" in plan
    a = audit(df)
    assert a.broadcast_joins >= 3
    assert a.sortmerge_joins == 0


def test_inverted_index_postings_sorted_and_capped(spark):
    rows = [(2, "b a b"), (1, "a b"), (3, "a a a")]
    from sql_engine_spark.operators.retrieval import inverted_index

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.token: (r.df, r.postings)
        for r in inverted_index(df, id_col="doc_id", text_col="text").collect()
    }
    assert got["a"] == (3, "1:1,2:1,3:3")
    assert got["b"] == (2, "1:1,2:2")
    capped = {
        r.token
        for r in inverted_index(
            df, id_col="doc_id", text_col="text", max_df=2
        ).collect()
    }
    assert capped == {"b"}


def test_zonemap_actually_skips_files(spark, tmp_path):
    """Write a range-partitioned multi-file table; a narrow predicate
    must keep a strict subset of files and still return exact rows."""
    from sql_engine_spark.operators.zonemap import pruned_read

    src = spark.range(0, 10000).withColumn("v", F.col("id").cast("double"))
    path = str(tmp_path / "zoned")
    # repartitionByRange gives disjoint per-file v ranges => real zones
    src.repartitionByRange(8, "v").write.mode("overwrite").parquet(path)
    df, kept, total = pruned_read(spark, path, "v", 1000.0, 1999.0)
    assert total == 8
    assert kept < total
    got = df.agg(F.count("*"), F.min("v"), F.max("v")).collect()[0]
    assert tuple(got) == (1000, 1000.0, 1999.0)


def test_sorted_neighborhood_rank_has_no_global_window(spark, sf_dir):
    """The global sort rank must be the bucketed two-level rank: no
    window in the plan may have an EMPTY partition spec (that is the
    corpus-through-one-task shape the operator exists to avoid)."""
    df = _build(spark, sf_dir, "dedup_sorted_neighborhood")
    plan = explain_str(df, "formatted")
    empty_part = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # a bare "ORDER BY" spec has no partition columns before the
        # ordering exprs: partition cols appear before any "ASC"/"DESC"
        first = spec.split(",")[0].strip()
        if "ASC" in first or "DESC" in first:
            empty_part.append(first)
    # The ONLY empty-partition window allowed is the cross-bucket carry
    # over the per-bucket totals (bucket-count rows, not corpus rows).
    assert all("__bkt" in s for s in empty_part), plan
    # And the corpus-ranking window itself must exist, keyed by bucket.
    assert any("__bkt" in m.group(1).split(",")[0]
               and "ASC" not in m.group(1).split(",")[0]
               for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)), plan


def test_markov_window_is_per_user_and_matrix_broadcast(spark, sf_dir):
    """lag() must be partitioned by user_id (one user's history, never
    the corpus); the transition-total join must be broadcast."""
    df = _build(spark, sf_dir, "events_markov_transitions")
    plan = explain_str(df, "formatted")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1).split(",")[0], plan
    a = audit(df)
    assert a.broadcast_joins >= 1
    assert a.sortmerge_joins == 0
    assert a.reads_only("user_id", "event_type", "ts", "event_id")


def test_incremental_dedup_no_self_cartesian(spark, sf_dir):
    """The band join must be an equi-join on (band, key) — a cartesian
    product would mean the batch-vs-corpus bound broke."""
    df = _build(spark, sf_dir, "dedup_minhash_incremental")
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert audit(df).reads_only("doc_id", "text")


def test_countmin_sketch_relation_is_broadcast(spark, sf_dir):
    """The d x w counter relation is bounded; joining it back to the
    distinct keys must be broadcast, never a corpus shuffle join."""
    a = audit(_build(spark, sf_dir, "events_countmin_heavy_hitters"))
    assert a.broadcast_joins >= 1
    assert a.sortmerge_joins == 0
    assert a.reads_only("user_id")


def test_perplexity_buckets_single_scan_and_broadcast_stats(spark, sf_dir):
    """carry_cols rides lang through the scorer: the apply side is ONE
    documents scan; the per-lang stats join is broadcast."""
    df = _build(spark, sf_dir, "curation_perplexity_buckets")
    a = audit(df)
    assert a.broadcast_joins >= 1
    assert a.sortmerge_joins == 0
    assert len(a.read_schemas) <= 2  # stats branch + apply branch
    assert a.reads_only("doc_id", "lang", "text")


def test_point_in_time_no_lateral_quadratic(spark, sf_dir):
    """The as-of spelling must be union+window (one exchange on the
    entity key), not a per-row correlated LIMIT-1 join: no nested-loop
    or cartesian operators in the plan."""
    df = _build(spark, sf_dir, "asof_point_in_time")
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "o_custkey" in m.group(1).split(",")[0]


def test_zonemap_all_null_file_skipped(spark, tmp_path):
    """A file whose stats column is entirely NULL must be skipped, not
    crash the driver-side range check (review finding)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from sql_engine_spark.operators.zonemap import pruned_read

    schema = StructType(
        [StructField("id", LongType()), StructField("v", DoubleType())]
    )
    path = str(tmp_path / "nullzone")
    spark.createDataFrame([(1, 5.0), (2, 50.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame([(3, None), (4, None)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    df, kept, total = pruned_read(spark, path, "v", 0.0, 100.0)
    assert total == 2 and kept == 1
    assert sorted(r.id for r in df.collect()) == [1, 2]
