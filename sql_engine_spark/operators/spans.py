"""Exact duplicated-substring spans (ExactSubstr-style dedup).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) removes EXACT token substrings that repeat across a corpus —
a different signal from document-level MinHash: it catches boilerplate
(licenses, navigation chrome, templated headers) embedded inside
otherwise-unique documents. Their implementation builds a corpus-wide
suffix array on one machine; that is the part that cannot survive
100 TB. The Spark-native spelling below gets the same spans for a fixed
window size k with nothing but map stages, ONE corpus shuffle, and
bounded per-doc windows:

1. explode each document into its k-token windows WITH their positions
   (pure map — no shuffle, text column pruned at the scan);
2. find window-hashes seen in more than one document: a single
   map-side-combinable hash aggregate on the window hash (the one
   corpus shuffle; ``min(doc) <> max(doc)`` replaces count-distinct);
3. semi-join the positions back against the duplicated hashes (AQE
   plans this as a shuffled semi-join on the same hash key — and can
   reuse step 2's exchange);
4. merge each document's duplicated positions into maximal spans with
   a gaps-and-islands pass in TOKEN space: a new span starts when the
   gap to the previous duplicated window exceeds k (token ranges no
   longer overlap or touch). The window is partitioned by doc_id —
   bounded by DOCUMENT length, never by corpus size, so it
   parallelizes across every executor at any scale.

A hit at position p means tokens [p, p+k-1] also occur elsewhere;
overlapping hits chain, so a 200-token duplicated block shows up as one
span, exactly as in the suffix-array formulation restricted to matches
of length >= k.

The reference engine (hand-rolled Rust Volcano executor,
/root/reference/src/executor/) has no window functions or generators;
this operator exists only in the Spark-native engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_engine_spark.operators.textprep import tokens


def _window_hashes(tokens_col: str, k: int) -> Column:
    """array<struct<pos:int, h:string>> of md5-hashed k-token windows,
    1-based positions. Built from sequence/slice/array_join HOFs so the
    whole thing runs inside whole-stage codegen."""
    return F.expr(
        f"transform(sequence(1, size({tokens_col}) - {k - 1}), "
        f"  i -> struct(i AS pos, md5(array_join(slice({tokens_col}, i, {k}), ' ')) AS h))"
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
) -> DataFrame:
    """Maximal per-document spans of tokens covered by some k-token
    window that also occurs in ANOTHER document.

    Returns (doc_id, span_start, span_end, span_tokens), positions
    1-based over the whitespace tokenization; span_tokens =
    span_end - span_start + 1 >= k. Documents shorter than k tokens
    produce no rows. Within-doc-only repeats are NOT reported (the
    dedup target is cross-document boilerplate).
    """
    sh = (
        df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__tokens"))
        .where(F.size("__tokens") >= k)
        .select("doc_id", F.explode(_window_hashes("__tokens", k)).alias("s"))
        .select("doc_id", F.col("s.pos").cast("long").alias("pos"), F.col("s.h").alias("h"))
    )
    # One corpus shuffle: hash-aggregate on the window hash. min<>max on
    # doc ids is the cheap spelling of "appears in >= 2 distinct docs"
    # (no count-distinct expansion), and it combines map-side.
    dup = (
        sh.groupBy("h")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
        .where(F.col("__mn") != F.col("__mx"))
        .select("h")
    )
    hits = sh.join(dup, "h", "left_semi")
    # Gaps-and-islands per document, in TOKEN space: two duplicated
    # windows at positions p1 < p2 cover overlapping-or-adjacent token
    # ranges iff p2 - p1 <= k, so a new span starts exactly when the
    # position gap exceeds k. (Plain `pos - row_number()` would split
    # runs whose windows overlap but aren't consecutive — e.g. hits at
    # 1 and 3 with k=8 — yielding token-overlapping "maximal" spans;
    # caught by tests/test_r4c_props.py.) Windows are bounded by doc
    # length.
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "__isl",
        F.sum(
            F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy("doc_id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def sql_duplicated_spans(k: int, source: str = "documents") -> str:
    """DuckDB oracle: the identical pipeline spelled in ANSI-ish SQL
    (range is end-exclusive; list slicing t[i:j] is inclusive)."""
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM {source}
        ),
        pos AS (
            SELECT doc_id, t, unnest(range(1, len(t) - {k} + 2)) AS pos
            FROM toks WHERE len(t) >= {k}
        ),
        sh AS (
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   md5(array_to_string(t[pos:pos + {k - 1}], ' ')) AS h
            FROM pos
        ),
        dup AS (
            SELECT h FROM sh GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)
        ),
        hits AS (
            SELECT doc_id, pos FROM sh WHERE h IN (SELECT h FROM dup)
        ),
        gaps AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             > {k} THEN 1 ELSE 0 END AS brk
            FROM hits
        ),
        isl AS (
            SELECT doc_id, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS isl
            FROM gaps
        )
        SELECT doc_id,
               MIN(pos) AS span_start,
               MAX(pos) + {k - 1} AS span_end,
               MAX(pos) + {k - 1} - MIN(pos) + 1 AS span_tokens
        FROM isl
        GROUP BY doc_id, isl
    """
