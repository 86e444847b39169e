"""Deduplication queries over the `documents` / `embeddings` tables.

Each entry wires an operator from operators/dedup.py to a DuckDB oracle
that computes the *identical* md5-based pipeline, so even MinHash-LSH is
exact-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators import dedup as D
from sql_engine_spark.operators.similarity import embedding_cosine_pairs
from sql_engine_spark.operators.spans import duplicated_spans, sql_duplicated_spans
from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens, tokens
from sql_engine_spark.registry import register


@register(
    "dedup_exact",
    oracle="""
        SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: one hash-aggregate on the content digest; "
    "representative = min doc id. Scales as a single shuffle.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("__key", F.md5("text"))
    return D.exact_dedup_groups(docs, ["__key"], "doc_id").select("rep_id", "n_copies")


_MINHASH_PARAMS = dict(shingle_k=3, num_hashes=8, bands=4, threshold=0.2)


def _shared_pairs(spark, sf_dir, **overrides):
    """The house MinHash-LSH pair relation, computed from the SHARED
    hashed-shingle-set build (operators/dedup.shingle_hs_shared) so the
    twelve consumers of the full-documents pipeline tokenize and hash
    the corpus once per process instead of once each. A `shingle_k`
    override routes to the shared BUILD (which caches per k), not to
    the from-hs scorer — the signature pipeline is k-agnostic once the
    digests exist (r8 advice: forwarding it blindly raised TypeError)."""
    p = {k: v for k, v in _MINHASH_PARAMS.items() if k != "shingle_k"}
    p.update(overrides)
    shingle_k = p.pop("shingle_k", _MINHASH_PARAMS["shingle_k"])
    hs = D.shingle_hs_shared(spark, sf_dir, shingle_k=shingle_k)
    return D.minhash_lsh_pairs_from_hs(hs, **p)


def _sql_minhash_lsh(
    k: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    cap: int | None = None,
    source: str = "documents",
) -> str:
    r = num_hashes // bands
    width = 32 // num_hashes
    toks = sql_tokens("text")
    qualify = (
        f"QUALIFY COUNT(*) OVER (PARTITION BY b, key) <= {cap}" if cap else ""
    )
    return f"""
        WITH docs AS (
            SELECT doc_id AS id, {sql_shingles(toks, k)} AS sh FROM {source}
        ),
        digs AS (
            SELECT id, shset, list_transform(shset, s -> md5(s)) AS dig
            FROM (SELECT id, list_distinct(sh) AS shset FROM docs)
        ),
        sigs AS (
            SELECT id, shset,
                   list_transform(range(0, {num_hashes}), j ->
                       list_aggregate(list_transform(dig, h ->
                           substring(h, j * {width} + 1, {width})), 'min')) AS sig
            FROM digs
        ),
        buckets AS (
            SELECT id, b,
                   md5(array_to_string(sig[b*{r}+1 : b*{r}+{r}], '|')) AS key
            FROM sigs CROSS JOIN range(0, {bands}) t(b)
            {qualify}
        ),
        candidates AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM buckets a JOIN buckets b ON a.b = b.b AND a.key = b.key AND a.id < b.id
        )
        SELECT id_a, id_b,
               len(list_intersect(sa.shset, sb.shset))
                 / len(list_distinct(list_concat(sa.shset, sb.shset))) AS jaccard
        FROM candidates
        JOIN sigs sa ON id_a = sa.id
        JOIN sigs sb ON id_b = sb.id
        WHERE len(list_intersect(sa.shset, sb.shset))
                 / len(list_distinct(list_concat(sa.shset, sb.shset))) >= {threshold}
    """


@register(
    "dedup_minhash_lsh",
    oracle=_sql_minhash_lsh(3, 8, 4, 0.2),
    doc="MinHash+LSH near-dup: shingle -> 8 minhashes -> 4 bands -> "
    "bucket equi-join -> exact Jaccard verify. The only shuffles are the "
    "band-key join and the verify joins; no O(n^2) stage.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared_pairs(spark, sf_dir)


@register(
    "dedup_minhash_lsh_capped",
    oracle=_sql_minhash_lsh(3, 8, 4, 0.2, cap=20),
    doc="MinHash+LSH with a per-bucket size cap (20): band buckets larger "
    "than the cap are dropped before the self-join, bounding the "
    "quadratic blowup a boilerplate-heavy corpus would otherwise cause "
    "in a hot bucket. The over-cap keys come from a map-side-combinable "
    "aggregate and are removed with a broadcast anti-join — no sort of "
    "the bucket stream.",
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared_pairs(spark, sf_dir, max_bucket_size=20)


@register(
    "dedup_simhash",
    oracle=f"""
        SELECT doc_id, {D.sql_simhash_bits(sql_tokens('text'), 16)} AS simhash
        FROM documents
    """,
    doc="SimHash fingerprint (16-bit, per-row map work): hamming-close "
    "fingerprints indicate near-dups; grouping equal fingerprints is the "
    "cheap first pass at scale.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .withColumn("__tokens", tokens("text"))
        .withColumn("__digs", F.expr("transform(__tokens, t -> md5(t))"))
    )
    return docs.select(
        "doc_id", D.simhash_bits_from_digests("__digs", 16).alias("simhash")
    )


_NGRAM_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id AS id, lang, source,
               list_distinct({sql_shingles(sql_tokens('text'), 2)}) AS shset
        FROM documents
    )
    SELECT a.id AS id_a, b.id AS id_b,
           len(list_intersect(a.shset, b.shset))
             / len(list_distinct(list_concat(a.shset, b.shset))) AS jaccard
    FROM docs a
    JOIN docs b ON a.lang = b.lang AND a.source = b.source AND a.id < b.id
    WHERE len(list_intersect(a.shset, b.shset))
             / len(list_distinct(list_concat(a.shset, b.shset))) >= 0.15
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_NGRAM_ORACLE,
    doc="All-pairs word-bigram Jaccard within (lang, source) blocks — the "
    "explicit-blocking fallback when LSH recall isn't wanted.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        docs, "doc_id", "text", ["lang", "source"], ngram_k=2, threshold=0.15
    )


_EMB_ORACLE = """
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_reduce(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]),
                           (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(b.e, x -> x * x), (x, y) -> x + y)))
               AS cosine
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.2
"""


@register(
    "dedup_embedding_cosine",
    oracle=_EMB_ORACLE,
    doc="Embedding-cosine near-dup pairs within label blocks. Vector math "
    "is zip_with/aggregate (JVM codegen); sequential double reduction is "
    "bit-identical to the oracle's list_reduce.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(
        emb, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.2
    )


def _sql_cc_iter(prev: str, cur: str) -> str:
    return f"""
        {cur} AS (
            SELECT n.node, LEAST(n.label, MIN(ld.label)) AS label
            FROM {prev} n
            JOIN cc_edges e ON e.src = n.node
            JOIN {prev} ld ON ld.node = e.dst
            GROUP BY n.node, n.label
        )"""


@register(
    "dedup_connected_components",
    oracle=f"""
        WITH cc_pairs AS (
            SELECT id_a, id_b FROM ({_sql_minhash_lsh(3, 8, 4, 0.2)})
        ),
        cc_edges AS (
            SELECT id_a AS src, id_b AS dst FROM cc_pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM cc_pairs
        ),
        l0 AS (
            SELECT DISTINCT src AS node, src AS label FROM cc_edges
        ),
        {_sql_cc_iter('l0', 'l1')},
        {_sql_cc_iter('l1', 'l2')},
        {_sql_cc_iter('l2', 'l3')}
        SELECT node AS doc_id, label AS cluster_id FROM l3
    """,
    doc="Near-dup clusters: MinHash-LSH pairs -> undirected edges -> "
    "3 rounds of min-label propagation (join + hash-agg per round; the "
    "standard distributed connected-components loop). Fixed iteration "
    "count keeps it oracle-hashable; at scale you loop until a "
    "convergence counter hits zero instead.",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_pairs(spark, sf_dir)
    return D.connected_components_fixed(pairs, "id_a", "id_b", iterations=3).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


@register(
    "dedup_containment",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id AS id, lang, source,
                   list_distinct({sql_shingles(sql_tokens('text'), 2)}) AS shset
            FROM documents
        ),
        nz AS (SELECT * FROM docs WHERE len(shset) > 0)
        SELECT id_a, id_b, c_ab, c_ba FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   len(list_intersect(a.shset, b.shset)) / len(a.shset) AS c_ab,
                   len(list_intersect(a.shset, b.shset)) / len(b.shset) AS c_ba
            FROM nz a
            JOIN nz b ON a.lang = b.lang AND a.source = b.source AND a.id < b.id
        ) WHERE GREATEST(c_ab, c_ba) >= 0.3
    """,
    doc="Asymmetric containment |A∩B|/|A| within (lang, source) blocks: "
    "finds subset/quote near-dups that Jaccard under-scores (short doc "
    "inside long doc). Integer-cardinality division is single-rounding "
    "IEEE, so it hash-matches cross-engine.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.containment_pairs(
        docs, "doc_id", "text", ["lang", "source"], ngram_k=2, threshold=0.3
    )


@register(
    "dedup_keep_best",
    oracle=f"""
        WITH cc_pairs AS (
            SELECT id_a, id_b FROM ({_sql_minhash_lsh(3, 8, 4, 0.2)})
        ),
        cc_edges AS (
            SELECT id_a AS src, id_b AS dst FROM cc_pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM cc_pairs
        ),
        l0 AS (
            SELECT DISTINCT src AS node, src AS label FROM cc_edges
        ),
        {_sql_cc_iter('l0', 'l1')},
        {_sql_cc_iter('l1', 'l2')},
        {_sql_cc_iter('l2', 'l3')},
        toks AS (
            SELECT doc_id, CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        labeled AS (
            SELECT t.doc_id, COALESCE(l.label, t.doc_id) AS cluster_id, t.n_tokens
            FROM toks t LEFT JOIN l3 l ON l.node = t.doc_id
        )
        SELECT doc_id, cluster_id, n_tokens,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_tokens DESC, doc_id) = 1 AS keep
        FROM labeled
    """,
    doc="Canonical-document selection: MinHash-LSH pairs -> connected "
    "components -> keep the longest doc per duplicate cluster (ties to "
    "the lowest id); singletons keep themselves. The full "
    "find-dups/cluster/select pipeline a dedup pass actually ships — "
    "selection is one rank window over the cluster key (labeled rows "
    "consumed once, no self-join), nothing corpus-quadratic.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    pairs = _shared_pairs(spark, sf_dir)
    cc = D.connected_components_fixed(pairs, "id_a", "id_b", iterations=3)
    toks = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    labeled = toks.join(
        cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id"), "n_tokens"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    return labeled.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("keep"),
    )


@register(
    "dedup_shared_ngrams",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, md5(gram) AS h
            FROM (
                SELECT doc_id,
                       unnest(list_distinct({sql_shingles(sql_tokens('text'), 5)})) AS gram
                FROM documents
            )
        ),
        c AS (SELECT h, COUNT(*) AS ndocs FROM g GROUP BY h)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared_grams,
               CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(COUNT(*) AS BIGINT) AS shared_frac
        FROM g JOIN c USING (h)
        GROUP BY doc_id
    """,
    doc="Per-document duplicated-span statistics (Lee et al. ACL 2022 "
    "exact-substring posture at 5-gram granularity): the fraction of a "
    "doc's distinct 5-grams occurring in >= 2 documents — the signal "
    "for dropping or trimming boilerplate-heavy docs. One gram explode "
    "+ one count-by-gram-hash + a same-key join back + one per-doc "
    "aggregate; a gram shared by m docs costs m rows, never m^2 pairs.",
)
def dedup_shared_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.shared_ngram_stats(docs, id_col="doc_id", text_col="text", ngram_k=5)


_WP_K, _WP_W, _WP_MIN, _WP_CAP = 3, 4, 3, 50


@register(
    "dedup_winnow_pairs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_transform({sql_shingles(sql_tokens('text'), _WP_K)},
                                  g -> md5(g)) AS hs
            FROM documents
        ),
        fps AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(hs) - {_WP_W - 1}, 1) + 1),
                       i -> list_aggregate(hs[i : i + {_WP_W - 1}], 'min')))) AS fp
            FROM t
        ),
        ok AS (
            SELECT doc_id, fp FROM fps
            QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {_WP_CAP}
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_fps
        FROM ok a JOIN ok b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {_WP_MIN}
    """,
    doc=f"Copied-run candidate pairs from winnowing fingerprints (the "
    f"MOSS pairing step): docs sharing >= {_WP_MIN} fingerprints, with "
    f"the winnowing guarantee that each shared fingerprint witnesses a "
    f">= {_WP_W + _WP_K - 1}-token identical run — substring-level "
    "evidence MinHash's set-Jaccard can't give. Fingerprints carried "
    f"by > {_WP_CAP} docs are dropped first (boilerplate; same "
    "rationale as the LSH hot-bucket cap) so pair blocks stay bounded.",
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.text import winnow_pairs

    docs = load(spark, sf_dir, "documents")
    return winnow_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        k=_WP_K,
        w=_WP_W,
        min_shared=_WP_MIN,
        max_fp_docs=_WP_CAP,
    )


_SPAN_K = 8


@register(
    "dedup_substring_spans",
    oracle=sql_duplicated_spans(_SPAN_K),
    doc=f"Exact duplicated-substring spans (Lee et al. ACL 2022 "
    f"ExactSubstr, window k={_SPAN_K}): maximal per-doc token spans "
    "covered by an 8-token window occurring in another document — the "
    "boilerplate-trimming signal suffix-array dedup gives, re-expressed "
    "as one window-hash aggregate + a semi-join + per-doc "
    "gaps-and-islands. No corpus-wide suffix array, no single-machine "
    "stage; the only corpus shuffle is the hash aggregate.",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", k=_SPAN_K)


@register(
    "dedup_sorted_neighborhood",
    oracle=D.sql_sorted_neighborhood(window=3, key_tokens=5, threshold=0.3),
    doc="Sorted-neighborhood blocking (Hernandez & Stolfo SIGMOD 1995): "
    "sort by an md5 blocking key of the first 5 tokens, compare each "
    "record with its 3 sort-successors only — O(n*w) pairs. The global "
    "sort rank is a bucketed two-level rank (operators/prefix.py), "
    "never a corpus-wide single-task row_number; pairing is a linear "
    "rank -> rank+1..w equi-join.",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.sorted_neighborhood_pairs(
        docs, id_col="doc_id", text_col="text", window=3, key_tokens=5, threshold=0.3
    )


_INCR_MOD = 10


def _sql_minhash_incremental(k: int, num_hashes: int, bands: int, threshold: float) -> str:
    r = num_hashes // bands
    width = 32 // num_hashes
    toks = sql_tokens("text")
    return f"""
        WITH docs AS (
            SELECT doc_id AS id, {sql_shingles(toks, k)} AS sh FROM documents
        ),
        digs AS (
            SELECT id, shset, list_transform(shset, s -> md5(s)) AS dig
            FROM (SELECT id, list_distinct(sh) AS shset FROM docs)
        ),
        sigs AS (
            SELECT id, shset,
                   list_transform(range(0, {num_hashes}), j ->
                       list_aggregate(list_transform(dig, h ->
                           substring(h, j * {width} + 1, {width})), 'min')) AS sig
            FROM digs
        ),
        buckets AS (
            SELECT id, b,
                   md5(array_to_string(sig[b*{r}+1 : b*{r}+{r}], '|')) AS key
            FROM sigs CROSS JOIN range(0, {bands}) t(b)
        ),
        candidates AS (
            SELECT DISTINCT n.id AS new_id, o.id AS base_id
            FROM buckets n JOIN buckets o ON n.b = o.b AND n.key = o.key
            WHERE n.id % {_INCR_MOD} = 0 AND o.id % {_INCR_MOD} <> 0
        )
        SELECT new_id, base_id,
               len(list_intersect(sa.shset, sb.shset))
                 / len(list_distinct(list_concat(sa.shset, sb.shset))) AS jaccard
        FROM candidates
        JOIN sigs sa ON new_id = sa.id
        JOIN sigs sb ON base_id = sb.id
        WHERE len(list_intersect(sa.shset, sb.shset))
                 / len(list_distinct(list_concat(sa.shset, sb.shset))) >= {threshold}
    """


@register(
    "dedup_minhash_incremental",
    oracle=_sql_minhash_incremental(3, 8, 4, 0.2),
    doc="Continuous-ingest dedup: an incoming batch (every 10th doc) "
    "band-joined against the existing corpus — near-dup pairs ACROSS "
    "the boundary only, no self-join. At production scale the corpus "
    "side is a precomputed signature/bucket table (shingle+minhash "
    "paid once per doc ever, appended per batch), so daily ingest "
    "dedup costs O(batch), not O(corpus); the plan here — band "
    "equi-join, exact verify on candidates only — is the one that "
    "runs against that stored table.",
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_split(
        docs, "doc_id", "text", F.col("doc_id") % _INCR_MOD == 0, **_MINHASH_PARAMS
    )


# Crossmodal semantic side: OR-amplified multitable LSH at the
# crossmodal threshold — the SCALE path (bucket-confined candidates),
# replacing the label-blocked all-pairs cosine whose per-block volume
# grows quadratically with the corpus (r10 sf1 stress finding: the
# label-blocked leg was 100x the pair volume at 10x vectors). Bonus:
# LSH also surfaces CROSS-label near-dups the label blocking was
# structurally blind to.
_XM_TABLES = 8
_XM_PLANES = 4
_XM_SEM_T = 0.2


def _sql_xm_sem_pairs() -> str:
    from sql_engine_spark.operators.similarity import sql_lsh_bucket

    cos = """
        list_reduce(list_transform(list_zip(a.e, c.e), p -> p[1] * p[2]),
                    (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(c.e, x -> x * x), (x, y) -> x + y)))
    """
    bucket_rows = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{sql_lsh_bucket('e', _XM_PLANES, 64, offset=t * _XM_PLANES)} AS bk"
        " FROM xv"
        for t in range(_XM_TABLES)
    )
    return f"""
        xv AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        xb AS ({bucket_rows}),
        xcands AS (
            SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
            FROM xb x JOIN xb y
              ON x.t = y.t AND x.bk = y.bk AND x.vec_id < y.vec_id
        ),
        sem_pairs AS (
            SELECT id_a, id_b
            FROM xcands
            JOIN xv a ON a.vec_id = id_a
            JOIN xv c ON c.vec_id = id_b
            WHERE {cos} >= {_XM_SEM_T}
        )"""


@register(
    "dedup_crossmodal_agreement",
    oracle=f"""
        WITH text_pairs AS (
            SELECT id_a, id_b FROM ({_sql_minhash_lsh(3, 8, 4, 0.2)})
        ),
        {_sql_xm_sem_pairs()}
        SELECT COALESCE(t.id_a, s.id_a) AS id_a,
               COALESCE(t.id_b, s.id_b) AS id_b,
               t.id_a IS NOT NULL AS text_dup,
               s.id_a IS NOT NULL AS semantic_dup,
               CASE WHEN t.id_a IS NOT NULL AND s.id_a IS NOT NULL THEN 'both'
                    WHEN t.id_a IS NOT NULL THEN 'text_only'
                    ELSE 'semantic_only' END AS agreement
        FROM text_pairs t FULL JOIN sem_pairs s
          ON t.id_a = s.id_a AND t.id_b = s.id_b
    """,
    doc="Cross-modal dedup agreement: the near-dup pairs surfaced by "
    "text MinHash-LSH vs by OR-amplified multitable embedding LSH "
    f"({_XM_TABLES} tables x {_XM_PLANES} planes, exact-cosine verify "
    f"at {_XM_SEM_T} — vec_id and doc_id share the id space in the "
    "testdata), full-outer joined and classified both/text_only/"
    "semantic_only — the audit a curation run does before trusting "
    "one modality's dedup to stand in for the other. The semantic "
    "side was label-blocked all-pairs cosine through r9; the r10 sf1 "
    "stress probe measured that leg at ~100x pair volume for 10x "
    "vectors (in-block quadratic), so it now composes the "
    "semantic_dup_pairs_multitable scale path instead — bucket-"
    "confined candidates, and cross-label near-dups the label "
    "blocking was structurally blind to. Pair relations are "
    "candidate-sized, never corpus^2.",
)
def dedup_crossmodal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.similarity import (
        semantic_dup_pairs_multitable,
    )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    tp = _shared_pairs(spark, sf_dir).select(
        "id_a", "id_b"
    )
    sp = semantic_dup_pairs_multitable(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        planes=_XM_PLANES,
        tables=_XM_TABLES,
        dim=64,
        threshold=_XM_SEM_T,
    ).select("id_a", "id_b")
    t, s = tp.alias("t"), sp.alias("s")
    joined = t.join(
        s,
        (F.col("t.id_a") == F.col("s.id_a")) & (F.col("t.id_b") == F.col("s.id_b")),
        "full_outer",
    )
    text_dup = F.col("t.id_a").isNotNull()
    sem_dup = F.col("s.id_a").isNotNull()
    return joined.select(
        F.coalesce("t.id_a", "s.id_a").alias("id_a"),
        F.coalesce("t.id_b", "s.id_b").alias("id_b"),
        text_dup.alias("text_dup"),
        sem_dup.alias("semantic_dup"),
        F.when(text_dup & sem_dup, "both")
        .when(text_dup, "text_only")
        .otherwise("semantic_only")
        .alias("agreement"),
    )


@register(
    "dedup_prefix_filter",
    oracle=D.sql_prefix_filter_pairs(shingle_k=3, threshold=0.3),
    doc="EXACT set-similarity self-join via prefix filtering (Chaudhuri "
    "et al. ICDE 2006; Bayardo et al. WWW 2007): sort each doc's "
    "3-shingles rarest-first by global document frequency, join only on "
    "the |x| - ceil(t|x|) + 1 prefix shingles, verify exact Jaccard. "
    "Zero recall loss (the prefix lemma guarantees every J >= t pair "
    "shares a prefix element) — the complete-answer alternative to "
    "MinHash-LSH, with candidate volume bounded by rare-shingle df^2 "
    "instead of band collisions. tests pin completeness against naive "
    "all-pairs. The pair relation is the process-shared materialized "
    "build (prefix_filter_pairs_shared — also the ground truth of "
    "dedup_lsh_recall_curve): the exact join, the repo's documented "
    "exactness floor, runs once per process and every consumer scans "
    "the result.",
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.prefix_filter_pairs_shared(spark, sf_dir, threshold=0.3)


@register(
    "dedup_simhash_hamming",
    oracle=D.sql_simhash_hamming_pairs(bits=64, n_blocks=4, max_hamming=2),
    doc="SimHash Hamming-distance pairing (Manku-Jain-Sarma WWW 2007, "
    "the Google crawl-dedup scheme): 64-bit fingerprints split into 4 "
    "16-bit blocks; pigeonhole guarantees every pair within Hamming "
    "distance 2 agrees exactly on some block, so 4 block equi-joins "
    "find ALL qualifying pairs (complete, unlike probabilistic LSH) "
    "and an unrolled integer Hamming verify filters. 64/4 is the "
    "corpus-scalable operating point: 2^16 buckets per block keeps "
    "candidate volume sub-quadratic as the corpus grows (the 32/4 "
    "split capped block keys at 256 — flagged in round-4 review). "
    "Fingerprint computed once into a column, blocks stack()ed from "
    "the materialized string — the 64-aggregate simhash expression "
    "never re-evaluates per block.",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.simhash_hamming_pairs(
        docs, "doc_id", "text", bits=64, n_blocks=4, max_hamming=2
    )


@register(
    "dedup_exact_normalized",
    oracle="""
        WITH n AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')))
                       AS h
            FROM documents
        )
        SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies,
               COUNT(*) > 1 AS is_dup_group
        FROM n GROUP BY h
    """,
    doc="Exact dedup after text normalization (lowercase, strip "
    "non-alphanumerics, collapse runs) — the cheap first-line dedup "
    "every production pipeline runs before MinHash: catches "
    "case/punctuation/whitespace variants plain md5 misses. Same "
    "single map-side-combinable hash-aggregate shape as dedup_exact. "
    "DuckDB regexp_replace needs the explicit 'g' flag (Spark always "
    "replaces all — see the verify notes).",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn(
        "__key",
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]+", " "))
        ),
    )
    grouped = D.exact_dedup_groups(docs, ["__key"], "doc_id")
    return grouped.select(
        "rep_id", "n_copies", (F.col("n_copies") > 1).alias("is_dup_group")
    )
