"""Round-8 streaming: the KMV distinct sketch as an incrementally
maintained view — the mergeable-synopsis story made executable: the KMV
synopsis is a plain bottom-k SET, so its streaming merge is
union + re-truncate, idempotent and associative, exactly what the
idempotent matview machinery wants. Converges EXACTLY to the batch
approx_kmv_distinct (shared oracle): after any replay the view holds
THE k smallest distinct hash values of everything seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.queries.round8_extras import _KMV_HEX, _KMV_K, _KMV_M
from sql_engine_spark.registry import _REGISTRY, register


@register(
    "streaming_kmv_distinct",
    oracle=None,  # spliced below: the batch KMV oracle
    doc="Streaming KMV distinct-user sketch through the idempotent "
    "matview: per micro-batch, the batch's bottom-k distinct 48-bit "
    "md5 hash values; merge = union + distinct + re-truncate to k — "
    "idempotent (replayed batches add nothing) and associative "
    "(shard synopses merge in any order), the textbook mergeable-"
    "summary contract (Agarwal et al., 'Mergeable Summaries'). View "
    f"state is AT MOST k={_KMV_K} rows regardless of stream length; "
    "per-trigger cost is O(batch) + O(k). The drained view yields "
    "the same k-th minimum — and therefore the same estimate row — "
    "as the batch approx_kmv_distinct, whose oracle it shares "
    "(exact-convergence gate, the streaming_bitmap_distinct "
    "pattern). The exact-distinct audit column reads the batch table "
    "once at the end (it is the convergence target, not stream "
    "state).",
)
def streaming_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.matview import IdempotentMatView
    from sql_engine_spark.streaming.source import table_stream

    def hashes(b: DataFrame) -> DataFrame:
        return b.select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, _KMV_HEX),
                16,
                10,
            )
            .cast("long")
            .alias("hv")
        )

    def partial_of(b: DataFrame) -> DataFrame:
        return hashes(b).distinct().orderBy("hv").limit(_KMV_K)

    def combine(cur: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            cur.unionByName(partial).distinct().orderBy("hv").limit(_KMV_K)
        )

    view = IdempotentMatView(
        tempfile.mkdtemp(prefix="kmv_view_"),
        partial_of=partial_of,
        combine=combine,
    )
    with _state_partitions(spark):
        stream = table_stream(spark, sf_dir, "events", ["event_id"], 4)
        q = (
            stream.select("user_id")
            .writeStream.outputMode("append")
            .foreachBatch(view.merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    kth = view.read(spark).agg(
        F.max("hv").cast("long").alias("h_k"),
        F.count("*").cast("long").alias("k_used"),
    )
    exact = load(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    m = kth.crossJoin(F.broadcast(exact))
    est = (F.lit(float(_KMV_K)) - F.lit(1.0)) * (
        F.lit(float(_KMV_M)) / F.col("h_k").cast("double")
    )
    kmv = F.when(F.col("k_used") < _KMV_K, F.col("k_used").cast("double")).otherwise(
        est
    )
    claim = F.when(F.col("k_used") < _KMV_K, F.lit(True)).otherwise(
        F.abs(est - F.col("exact_distinct").cast("double"))
        / F.col("exact_distinct").cast("double")
        < 0.5
    )
    return m.select(
        "k_used",
        "h_k",
        "exact_distinct",
        kmv.alias("kmv_estimate"),
        claim.alias("within_50pct"),
    )


_REGISTRY["streaming_kmv_distinct"].oracle = _REGISTRY["approx_kmv_distinct"].oracle
