"""Round-8 pipeline/maintenance operators: compaction planning over a
shard manifest and per-label embedding outlier mining.

Both are table-maintenance / curation primitives a 100 TB lakehouse
pipeline runs routinely: OPTIMIZE-style small-file coalescing needs a
PLAN (which inputs merge into which output file) before any data moves,
and embedding outlier mining is the curation reviewer's queue (vectors
far from their label's centroid are mislabels, OOD docs, or junk). The
reference engine has neither surface (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import register

# Compaction target: output files of ~this many bytes.
_COMPACT_TARGET = 16384
_SHARD_DOCS = 50


@register(
    "maintenance_compaction_plan",
    oracle=f"""
        WITH shards AS (
            SELECT doc_id // {_SHARD_DOCS} AS shard_id,
                   CAST(SUM(n_chars) AS BIGINT) AS bytes
            FROM documents GROUP BY 1
        ),
        cum AS (
            SELECT shard_id, bytes,
                   CAST(SUM(bytes) OVER (ORDER BY shard_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
            FROM shards
        ),
        binned AS (
            SELECT shard_id, bytes,
                   (cum_bytes - 1) // {_COMPACT_TARGET} AS bin
            FROM cum
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_shards,
               CAST(SUM(bytes) AS BIGINT) AS total_bytes,
               MIN(shard_id) AS first_shard, MAX(shard_id) AS last_shard
        FROM binned GROUP BY bin
    """,
    doc="Compaction (OPTIMIZE) plan over a shard manifest: coalesce "
    f"adjacent small shards into ~{_COMPACT_TARGET}-byte output files "
    "by cumulative-size binning — bin = (running_bytes - 1) div "
    "target, the standard size-based coalescer (a bin closes when the "
    "running total crosses a target multiple; same device Spark's "
    "file-source packing and Delta OPTIMIZE use, and unlike true "
    "bin-packing it is ONE window pass, order-preserving, and "
    "deterministic). The manifest here derives from the documents "
    f"table ({_SHARD_DOCS}-doc shards sized by n_chars) so the plan "
    "is data-real and oracle-checkable; in production the input is "
    "the file listing (manifest-sized — thousands of rows per "
    "partition, never corpus-sized), and a manifest too large for one "
    "window task goes through the bucketed running-sum machinery "
    "(operators/prefix.bucketed_running_sum). Output: per output "
    "file, its input span and size.",
)
def maintenance_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    shards = docs.groupBy(
        F.expr(f"doc_id div {_SHARD_DOCS}").alias("shard_id")
    ).agg(F.sum("n_chars").cast("long").alias("bytes"))
    binned = shards.select(
        "shard_id",
        "bytes",
        F.expr(f"(sum(bytes) over (order by shard_id) - 1) div {_COMPACT_TARGET}")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_shards"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("shard_id").alias("first_shard"),
        F.max("shard_id").alias("last_shard"),
    )


_OUT_TOPK = 3


@register(
    "emb_label_centroid_outliers",
    oracle=f"""
        WITH ex AS (
            SELECT vec_id, label, i AS dim, CAST(v AS DOUBLE) AS x
            FROM (
                SELECT vec_id, label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ),
        cent AS (
            SELECT label, dim, {sql_dsum('x')} / COUNT(*) AS mu
            FROM ex GROUP BY label, dim
        ),
        dist AS (
            SELECT e.vec_id, e.label,
                   sqrt({sql_dsum('(e.x - c.mu) * (e.x - c.mu)')}) AS dist
            FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
            GROUP BY e.vec_id, e.label
        )
        SELECT vec_id, label, dist,
               CAST(row_number() OVER (PARTITION BY label
                    ORDER BY dist DESC, vec_id) AS BIGINT) AS rank
        FROM dist
        QUALIFY rank <= {_OUT_TOPK}
    """,
    doc="Per-label embedding outliers: the top-3 vectors FARTHEST from "
    "their own label's centroid — the curation review queue (a vector "
    "far from its class center is a mislabel, an out-of-distribution "
    "document, or junk worth pulling before training; the local "
    "complement of emb_centroid_shift's global drift number). One "
    "exploded (label, dim) aggregate builds the centroids "
    "(label-count x dim rows — bounded); per-vector distance is the "
    "dim-keyed join + a DECIMAL-exact squared-deviation sum (dsum — "
    "order-independent, so the sqrt input is bit-identical cross-"
    "engine); the top-k window partitions on label (bounded "
    "candidate lists per partition).",
)
def emb_label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ex = _persist(
        emb.select(
            "vec_id",
            "label",
            F.posexplode("embedding").alias("i0", "v"),
        ).select(
            "vec_id",
            "label",
            (F.col("i0") + 1).alias("dim"),
            F.col("v").cast("double").alias("x"),
        )
    )
    cent = ex.groupBy("label", "dim").agg(
        (dsum(F.col("x")) / F.count("*")).alias("mu")
    )
    dev = (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(dsum(dev)).alias("dist"))
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    return (
        dist.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _OUT_TOPK)
        .select("vec_id", "label", "dist", "rank")
    )
