"""IO surface: multi-format quoted-path reads, write paths, partitioned
layouts, and scan-efficiency audits (pushdown/pruning actually reaching
the scans)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sql_engine_spark.engine import Engine
from sql_engine_spark.io import load
from sql_engine_spark.plans.audit import audit
from sql_engine_spark.sinks import write_table
from sql_engine_spark.tables import read_path


def test_write_read_roundtrip_all_formats(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    expected = sorted(map(tuple, src.collect()))
    for fmt in ["parquet", "orc", "json", "csv"]:
        path = str(tmp_path / f"nation_out_{fmt}")
        write_table(src, path, format=fmt)
        back = (
            spark.read.options(header=True, inferSchema=True)
            .format(fmt)
            .load(path)
            .select("n_nationkey", "n_name", "n_regionkey")  # json sorts columns
        )
        got = sorted(tuple(r) for r in back.collect())
        assert got == expected, fmt


def test_engine_reads_csv_and_json_paths(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    csv_path = str(tmp_path / "region.csv")
    json_path = str(tmp_path / "region.json")
    write_table(src, csv_path, format="csv")
    write_table(src, json_path, format="json")
    eng = Engine(spark)
    n = src.count()
    res_csv = eng.execute(f"select count(*) as n from '{csv_path}'")
    res_json = eng.execute(f"select r_name from '{json_path}' where r_regionkey = 0")
    assert res_csv.rows[0][0] == n
    assert len(res_json.rows) >= 1


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = load(spark, sf_dir, "orders")
    write_table(
        orders,
        path,
        partition_by=["o_orderstatus"],
        sort_by=["o_orderdate"],
        max_records_per_file=500_000,
    )
    # hive layout on disk
    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert len(dirs) >= 2, dirs

    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    a = audit(back)
    assert a.partition_filters, "filter on partition column must prune partitions"
    # correctness of the pruned read
    expect = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == expect


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    a = audit(li)
    assert any("l_quantity" in f for f in a.pushed_filters), a.pushed_filters
    assert a.reads_only("l_orderkey", "l_quantity"), a.read_schemas
    assert a.has_codegen


def test_small_dim_join_broadcasts(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    a = audit(joined)
    assert a.broadcast_joins >= 1, "25-row nation must broadcast, not shuffle"


def test_read_path_rejects_unknown_format(spark, tmp_path):
    import pytest

    from sql_engine_spark.errors import StorageError

    with pytest.raises(StorageError):
        read_path(spark, str(tmp_path / "nope.xyz"))


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed by the join key into the same bucket count must
    sort-merge join with ZERO shuffle exchanges — the co-located layout
    that pays the join shuffle once at write time."""
    from sql_engine_spark.plans.audit import explain_str
    from sql_engine_spark.sinks import write_bucketed

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    write_bucketed(
        o, "b_orders", str(tmp_path / "b_orders"),
        bucket_by=["o_orderkey"], num_buckets=4, sort_by=["o_orderkey"],
    )
    write_bucketed(
        li, "b_lineitem", str(tmp_path / "b_lineitem"),
        bucket_by=["l_orderkey"], num_buckets=4, sort_by=["l_orderkey"],
    )
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
                "l_orderkey", "l_quantity", "o_orderpriority"
            )
            plan = explain_str(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # correctness: matches the plain (shuffled) join
            expected = (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .select("l_orderkey", "l_quantity", "o_orderpriority")
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, expected.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_dataset(spark, sf_dir, tmp_path):
    """Many tiny files -> few right-sized files, same rows, atomic swap."""
    from sql_engine_spark.sinks import compact_dataset

    src = load(spark, sf_dir, "lineitem")
    path = str(tmp_path / "fragmented")
    # Simulate pathological incremental ingest: 64 tiny files.
    src.repartition(64).write.mode("overwrite").parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.startswith("part-"))
    assert n_before >= 64
    expected = src.count()

    n_after = compact_dataset(
        spark, path, target_file_bytes=4 * 1024 * 1024, sort_by=["l_orderkey"]
    )
    assert n_after < n_before
    back = spark.read.parquet(path)
    assert back.count() == expected
    # No temp dir left behind.
    assert not os.path.exists(path + ".__compact_tmp__")


def test_zorder_layout_skips_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order files must each cover a small range of BOTH cluster columns
    (checked from real parquet footer stats); a plain sort only localizes
    its leading column, leaving the second column's per-file range ~the
    full domain."""
    import pyarrow.parquet as pq
    from sql_engine_spark.sinks import write_zordered

    src = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")

    def avg_file_range(path, col):
        spans = []
        for f in os.listdir(path):
            if not (f.startswith("part-") and f.endswith(".parquet")):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index(col)
            los = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
            his = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
            spans.append(max(his) - min(los))
        return sum(spans) / len(spans)

    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "sorted")
    write_zordered(src, z_path, cols=("l_partkey", "l_suppkey"), n_files=8)
    (
        src.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(s_path)
    )
    # Same rows either way.
    assert spark.read.parquet(z_path).count() == src.count()
    # Plain sort localizes only the leading column; Z-order localizes both.
    domain = src.agg(F.max("l_suppkey") - F.min("l_suppkey")).first()[0]
    assert avg_file_range(s_path, "l_suppkey") > 0.9 * domain
    assert avg_file_range(z_path, "l_suppkey") < 0.6 * domain
    assert avg_file_range(z_path, "l_partkey") < 0.6 * (
        src.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    )


def test_compact_dataset_partitioned_layout(spark, sf_dir, tmp_path):
    """partition_by preserves the hive layout through the rewrite and the
    returned file count walks subdirectories."""
    from sql_engine_spark.sinks import compact_dataset

    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "part_frag")
    src.repartition(16).write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    expected = src.count()

    n_after = compact_dataset(
        spark, path, target_file_bytes=64 * 1024 * 1024, partition_by=["l_returnflag"]
    )
    assert n_after >= 1
    # Hive partition dirs survived the swap.
    subdirs = [d for d in os.listdir(path) if d.startswith("l_returnflag=")]
    assert len(subdirs) >= 2
    back = spark.read.parquet(path)
    assert back.count() == expected
    assert set(back.columns) == {"l_orderkey", "l_quantity", "l_returnflag"}
    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")

def test_compact_dataset_recovers_stale_swap_dirs(spark, sf_dir, tmp_path):
    """A compaction that crashed mid-swap leaves `.__compact_old__` /
    `.__compact_tmp__` behind; the next run must self-heal instead of
    failing its own os.replace — including the worst case where the crash
    landed between the two renames and `old` holds the only copy."""
    import shutil
    from sql_engine_spark.sinks import compact_dataset

    src = load(spark, sf_dir, "region")
    path = str(tmp_path / "crashy")
    src.write.mode("overwrite").parquet(path)
    expected = src.count()

    # Case 1: crash after the swap but before deleting the old copy.
    shutil.copytree(path, path + ".__compact_old__")
    os.makedirs(path + ".__compact_tmp__/junk")
    compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(path).count() == expected
    assert not os.path.exists(path + ".__compact_old__")
    assert not os.path.exists(path + ".__compact_tmp__")

    # Case 2: crash between the renames — dataset exists only at `old`.
    os.replace(path, path + ".__compact_old__")
    compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(path).count() == expected
    assert not os.path.exists(path + ".__compact_old__")
    assert not os.path.exists(path + ".__compact_tmp__")


def test_bucketed_scan_prunes_buckets(spark, sf_dir, tmp_path):
    """Point lookups on a bucketed table must read a strict subset of
    buckets (SelectedBucketsCount in the scan) — the read-side payoff
    of paying the bucket shuffle at write time."""
    from sql_engine_spark.plans.audit import explain_str
    from sql_engine_spark.sinks import write_bucketed

    o = load(spark, sf_dir, "orders")
    write_bucketed(
        o, "bp_orders", str(tmp_path / "bp_orders"),
        bucket_by=["o_custkey"], num_buckets=8,
    )
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        # autoBucketedScan drops the bucketed layout for filter-only
        # plans (no shuffle to save); disable it to exercise pruning.
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        df = spark.table("bp_orders").where(F.col("o_custkey") == 7)
        plan = explain_str(df, "formatted")
        import re
        m = re.search(r"SelectedBucketsCount: (\d+) \(out of (\d+)\)|SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        sel, tot = (m.group(1) or m.group(3)), (m.group(2) or m.group(4))
        assert int(sel) == 1 and int(tot) == 8
        got = {r.o_custkey for r in df.collect()}
        assert got <= {7}
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS bp_orders")


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Joining a partitioned fact against a FILTERED dim must inject a
    dynamic pruning subquery on the fact's partition column — the
    runtime analogue of static partition pruning, and the single
    biggest scan-saver on star joins over partitioned 100 TB tables."""
    from sql_engine_spark.plans.audit import explain_str

    o = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        spark.createDataFrame(
            [("F", "finished"), ("O", "open"), ("P", "pending")],
            ["status", "label"],
        )
        .where(F.col("label") == "open")
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        # Defeat the broadcast-reuse shortcut threshold so the DPP filter
        # is visible regardless of dim size heuristics.
        joined = fact.join(dim, fact.o_orderstatus == dim.status).select(
            "o_orderkey", "label"
        )
        plan = explain_str(joined, "formatted")
        assert "dynamicpruning" in plan.lower(), plan
        # Correctness: equals the statically-filtered scan.
        expected = fact.where(F.col("o_orderstatus") == "O").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With broadcast off (the big-join regime), Catalyst must inject a
    runtime Bloom filter from the selective dim side into the fact scan
    (might_contain in the plan) — the shuffle-join row-reducer that
    matters when both sides are too big to broadcast at 100 TB."""
    from sql_engine_spark.plans.audit import explain_str

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
        j = li.join(
            o.where(F.col("o_totalprice") > 400000),
            li.l_orderkey == o.o_orderkey,
        ).select("l_orderkey", "l_quantity")
        plan = explain_str(j, "simple")
        assert "might_contain" in plan.lower(), plan
        # Correctness unchanged by the filter.
        expected = (
            li.join(
                o.where(F.col("o_totalprice") > 400000).hint("broadcast"),
                li.l_orderkey == o.o_orderkey,
            ).count()
        )
        assert j.count() == expected
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Two parquet batches with evolved schemas (added column) must read
    as one table under mergeSchema, old rows NULL-filled — the
    lakehouse schema-drift contract for long-lived ingest paths."""
    path = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")).write.mode(
        "append"
    ).parquet(path)
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "v1", "v2"}
    rows = {r.id: (r.v1, r.v2) for r in df.collect()}
    assert rows[0] == ("a", None) and rows[4] == ("b", 1.5)


def test_bucketed_aggregate_no_exchange(spark, sf_dir, tmp_path):
    """GROUP BY on the bucket column of a bucketed table must aggregate
    with ZERO exchanges — the write-once-shuffle payoff for repeated
    aggregations, same contract as the bucketed join."""
    from sql_engine_spark.plans.audit import explain_str
    from sql_engine_spark.sinks import write_bucketed

    o = load(spark, sf_dir, "orders")
    write_bucketed(
        o, "ba_orders", str(tmp_path / "ba_orders"),
        bucket_by=["o_custkey"], num_buckets=4,
    )
    try:
        agg = (
            spark.table("ba_orders")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"), F.max("o_totalprice").alias("mx"))
        )
        plan = explain_str(agg)
        assert "Exchange" not in plan, plan
        expected = sorted(
            map(tuple, o.groupBy("o_custkey").agg(F.count("*"), F.max("o_totalprice")).collect())
        )
        assert sorted(map(tuple, agg.collect())) == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS ba_orders")
