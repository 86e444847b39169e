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
