"""SparkSession factory.

The reference engine executes one synchronous in-process pull loop
(/root/reference/src/executor/mod.rs:113-135; no threads/spill anywhere).
Our equivalent is a SparkSession tuned for scale-out execution: AQE on
(runtime join-strategy switching + skew handling), Arrow on (fast
Python<->JVM transfer for the pandas-UDF operators), parquet
filter-pushdown on. The same configuration scales from local[N] to a
1000-executor cluster — only `master` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "sql-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    Honors SPARK_GRAFT_CPUS for local core count. All settings are safe
    on a real cluster: AQE coalesces post-shuffle partitions at runtime,
    so a generous static `spark.sql.shuffle.partitions` costs nothing.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Deterministic timestamp semantics regardless of host tz.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and dynamic broadcast conversion — the scale story.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate clones a generator's child expression
        # into a `size(e) > 0` Filter below the Generate; for our
        # explode-over-HOF pipelines (shingles, minhash, n-grams) that
        # re-evaluates the whole tokenize/shingle expression a second
        # time per row OUTSIDE whole-stage codegen — measured 5.5x wall
        # on text_decontaminate (6.7s -> 1.2s at sf0.1). The rule only
        # pays off when generator inputs are frequently empty/null,
        # which none of ours are.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Scan efficiency: pushdown + pruning reach the parquet reader.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Long-session shuffle-file hygiene: ContextCleaner only removes
        # shuffle files when the driver GC collects the corresponding
        # ShuffleDependency — a long benchmark/ETL session with a large
        # driver heap can accumulate every shuffle it ever ran (the r10
        # sf1 stress run filled 79 GB of /tmp spill this way and died of
        # ENOSPC mid-suite). Forcing a periodic driver GC bounds the
        # window; on a real cluster this also returns executor disk.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
