"""Round-5 text operators: trigram stupid-backoff LM, n-gram novelty,
RAKE keywords, BPE tokenizer training/encoding, per-source TV drift,
and the vocabulary-coverage curve.

Split from queries/round5.py along domain lines (round-6 refactor);
semantics, registry keys, and oracles unchanged.
"""



from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.text import hashed_linear_score, sql_hashed_linear_score
from sql_engine_spark.registry import register


from sql_engine_spark.operators.textprep import (  # noqa: E402
    shingles,
    sql_shingles,
    sql_tokens,
    tokens,
)

_TRI_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


@register(
    "text_trigram_backoff",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('text')} AS t FROM documents
        ),
        tg AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
            FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
        ),
        train AS (SELECT * FROM tg WHERE doc_id % 2 = 0),
        c3 AS (SELECT w1, w2, w3, COUNT(*) AS n3 FROM train GROUP BY 1, 2, 3),
        c2ctx AS (SELECT w1, w2, COUNT(*) AS ctx2 FROM train GROUP BY 1, 2),
        c2 AS (SELECT w2, w3, COUNT(*) AS n2 FROM train GROUP BY 1, 2),
        c1ctx AS (SELECT w2, COUNT(*) AS ctx1 FROM train GROUP BY 1),
        c1 AS (SELECT w3, COUNT(*) AS n1 FROM train GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM train),
        p AS (
            SELECT g.doc_id, g.pos,
                   CASE WHEN c3.n3 IS NOT NULL
                            THEN CAST(c3.n3 AS DOUBLE) / CAST(c2ctx.ctx2 AS DOUBLE)
                        WHEN c2.n2 IS NOT NULL
                            THEN {_TRI_ALPHA} *
                                 (CAST(c2.n2 AS DOUBLE) / CAST(c1ctx.ctx1 AS DOUBLE))
                        ELSE {_TRI_ALPHA} * {_TRI_ALPHA} *
                             (CAST(COALESCE(c1.n1, 0) AS DOUBLE) / total)
                   END AS p
            FROM tg g
            LEFT JOIN c3 USING (w1, w2, w3)
            LEFT JOIN c2ctx USING (w1, w2)
            LEFT JOIN c2 USING (w2, w3)
            LEFT JOIN c1ctx USING (w2)
            LEFT JOIN c1 USING (w3)
            CROSS JOIN tot
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(list_sort(list(struct_pack(pos := pos,
                                                                 p := p))),
                                      s -> s.p)),
                   (a, x) -> a + x) / COUNT(*) AS mean_score
        FROM p GROUP BY doc_id
    """,
    doc="Trigram LM with stupid backoff (Brants et al., EMNLP 2007 — "
    "'Large Language Models in Machine Translation', THE web-scale "
    "LM-scoring scheme before neural LMs): P(w3|w1 w2) backs off "
    "trigram -> 0.4*bigram -> 0.16*unigram when the higher-order "
    "context is unseen. Counts train on the EVEN-doc_id half of the "
    "corpus and score every doc, so the backoff paths are genuinely "
    "exercised (a self-trained LM never sees an unseen n-gram). "
    "Shape: one trigram explode (persisted — five count aggregates "
    "and the probe read it), bounded-vocab count relations joined "
    "back by hash equi-joins, per-doc fold in position order. Ratios "
    "and folds are order-pinned doubles; no libm log anywhere "
    "(arithmetic mean, same rationale as text_bigram_lm_score).",
)
def text_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    # Docs under 3 tokens yield no trigrams (the oracle's range(1, n-1)
    # is empty for them) — and Spark's sequence(1, n) DESCENDS when
    # n < 1, so an unguarded transform would index out of range on a
    # 2-token doc. Pre-filter, matching the oracle's empty result.
    docs = docs.where(F.size("__t") >= 3)
    tg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 2), "
                "i -> struct(CAST(i AS BIGINT) AS pos, "
                "element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2, "
                "element_at(__t, i + 2) AS w3))"
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.w1", "s.w2", "s.w3")
    tg = _persist(tg)
    train = tg.where(F.col("doc_id") % 2 == 0)
    c3 = train.groupBy("w1", "w2", "w3").agg(F.count("*").alias("n3"))
    c2ctx = train.groupBy("w1", "w2").agg(F.count("*").alias("ctx2"))
    c2 = train.groupBy("w2", "w3").agg(F.count("*").alias("n2"))
    c1ctx = train.groupBy("w2").agg(F.count("*").alias("ctx1"))
    c1 = train.groupBy("w3").agg(F.count("*").alias("n1"))
    tot = train.agg(F.count("*").cast("double").alias("total"))
    p = (
        tg.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2ctx, ["w1", "w2"], "left")
        .join(c2, ["w2", "w3"], "left")
        .join(c1ctx, ["w2"], "left")
        .join(c1, ["w3"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("n3").isNotNull(),
                F.col("n3").cast("double") / F.col("ctx2").cast("double"),
            )
            .when(
                F.col("n2").isNotNull(),
                F.lit(_TRI_ALPHA)
                * (F.col("n2").cast("double") / F.col("ctx1").cast("double")),
            )
            .otherwise(
                F.lit(_TRI_ALPHA)
                * F.lit(_TRI_ALPHA)
                * (
                    F.coalesce(F.col("n1"), F.lit(0)).cast("double")
                    / F.col("total")
                )
            )
            .alias("p"),
        )
    )
    return p.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        (
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, p))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.p)"
            )
            / F.count("*")
        ).alias("mean_score"),
    )


_NOVEL_K = 5


@register(
    "text_ngram_novelty",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(
                       {sql_shingles(sql_tokens('text'), _NOVEL_K)})) AS g
            FROM documents
        ),
        first_doc AS (SELECT g, MIN(doc_id) AS first_id FROM sh GROUP BY g)
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_frac
        FROM sh JOIN first_doc f USING (g)
        GROUP BY sh.doc_id
    """,
    doc="N-gram novelty scoring: the fraction of a document's distinct "
    "5-gram shingles whose FIRST corpus occurrence (min doc_id) is "
    "this document — the marginal-contribution signal dedup-aware "
    "data valuation uses (a doc that introduces no new n-grams is "
    "redundant with earlier data; cf. the D4/SemDeDup family's "
    "novelty pruning). Shape: one shingle explode, one min-per-shingle "
    "aggregate (map-side combinable), one equi-join back, one per-doc "
    "count — all corpus-linear, and the min() makes the result "
    "independent of partitioning and arrival order.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    sh = _persist(
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles("__t", _NOVEL_K))
            ).alias("g"),
        )
    )
    first_doc = sh.groupBy("g").agg(F.min("doc_id").alias("first_id"))
    hit = (F.col("first_id") == F.col("doc_id")).cast("long")
    return (
        sh.join(first_doc, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(hit).cast("long").alias("n_novel"),
            (F.sum(hit).cast("double") / F.count("*").cast("double")).alias(
                "novelty_frac"
            ),
        )
    )


_RAKE_TOPN = 3


def _rake_stop_sql() -> str:
    from sql_engine_spark.operators.text import STOPWORDS

    return "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "text_rake_keywords",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS tok,
                   CASE WHEN t[i] IN {_rake_stop_sql()} THEN 1 ELSE 0 END
                       AS is_stop
            FROM (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
                 unnest(range(1, len(t) + 1)) u(i)
        ),
        seg AS (
            SELECT doc_id, pos, tok, is_stop,
                   SUM(is_stop) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS phrase_id
            FROM pos
        ),
        phrases AS (
            SELECT doc_id, phrase_id,
                   array_to_string(
                       list_transform(
                           list_sort(list(struct_pack(pos := pos, tok := tok))),
                           s -> s.tok),
                       ' ') AS phrase,
                   CAST(COUNT(*) AS BIGINT) AS plen
            FROM seg WHERE is_stop = 0
            GROUP BY doc_id, phrase_id
        ),
        occ AS (
            SELECT s.tok, p.plen
            FROM seg s JOIN phrases p
              ON p.doc_id = s.doc_id AND p.phrase_id = s.phrase_id
            WHERE s.is_stop = 0
        ),
        wordstats AS (
            SELECT tok,
                   CAST(COUNT(*) AS DOUBLE) AS freq,
                   CAST(SUM(plen) AS DOUBLE) AS deg
            FROM occ GROUP BY tok
        ),
        scored AS (
            SELECT s.doc_id, s.phrase_id,
                   list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(
                               list_sort(list(struct_pack(pos := s.pos,
                                                          sc := w.deg / w.freq))),
                               t -> t.sc)),
                       (a, x) -> a + x) AS score
            FROM seg s JOIN wordstats w ON w.tok = s.tok
            WHERE s.is_stop = 0
            GROUP BY s.doc_id, s.phrase_id
        )
        SELECT doc_id, phrase, score, rank FROM (
            SELECT p.doc_id, p.phrase, sc.score,
                   CAST(row_number() OVER (
                       PARTITION BY p.doc_id
                       ORDER BY sc.score DESC, p.phrase) AS BIGINT) AS rank
            FROM phrases p JOIN scored sc
              ON sc.doc_id = p.doc_id AND sc.phrase_id = p.phrase_id
        ) WHERE rank <= {_RAKE_TOPN}
    """,
    doc="RAKE keyword extraction (Rose et al. 2010 'Automatic Keyword "
    "Extraction from Individual Documents'): token runs between "
    "stopwords are candidate phrases; word score = corpus "
    "degree/frequency over phrase co-occurrence; phrase score = sum "
    "of word scores (folded in phrase position order for "
    "cross-engine bit-equality); top-3 phrases per doc. Shape: one "
    "position explode, a per-doc running stopword count (doc-keyed "
    "window, high cardinality), a bounded word-stats aggregate joined "
    "back, a per-doc rank — all corpus-linear. The per-doc windows "
    "key on doc_id, never the corpus.",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.text import STOPWORDS

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    pos = docs.select(
        "doc_id",
        F.posexplode("__t").alias("pos0", "tok"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        "tok",
        F.expr(f"CASE WHEN array_contains({stop_arr}, tok) THEN 1 ELSE 0 END")
        .alias("is_stop"),
    )
    w_seg = Window.partitionBy("doc_id").orderBy("pos")
    seg = _persist(
        pos.withColumn("phrase_id", F.sum("is_stop").over(w_seg))
    )
    nonstop = seg.where(F.col("is_stop") == 0)
    phrases = nonstop.groupBy("doc_id", "phrase_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))), "
            "s -> s.tok), ' ')"
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    occ = nonstop.join(
        phrases.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"]
    )
    wordstats = occ.groupBy("tok").agg(
        F.count("*").cast("double").alias("freq"),
        F.sum("plen").cast("double").alias("deg"),
    )
    scored = (
        nonstop.join(wordstats, "tok")
        .withColumn("sc", F.col("deg") / F.col("freq"))
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, sc))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.sc)"
            ).alias("score")
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        phrases.join(scored, ["doc_id", "phrase_id"])
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= _RAKE_TOPN)
        .select("doc_id", "phrase", "score", "rank")
    )


_BPE_ROUNDS = 5


def _sql_bpe_round(prev_vocab: str, r: int) -> str:
    """One BPE round: weighted adjacent-pair counts over the symbol
    vocabulary, deterministic argmax pick, string-replace merge."""
    return f"""bpe_p{r} AS (
            SELECT pr[1] AS l, pr[2] AS rr, SUM(wcount) AS cnt
            FROM (
                SELECT unnest(list_transform(
                           range(1, len(syms)),
                           i -> [syms[i], syms[i + 1]])) AS pr,
                       wcount
                FROM (
                    SELECT string_split(trim(sym_str), ' ') AS syms, wcount
                    FROM {prev_vocab}
                )
            ) GROUP BY 1, 2
        ),
        bpe_pick{r} AS (
            SELECT l, rr, CAST(cnt AS BIGINT) AS cnt,
                   CAST({r} AS BIGINT) AS round
            FROM (
                SELECT l, rr, cnt,
                       row_number() OVER (ORDER BY cnt DESC, l, rr) AS k
                FROM bpe_p{r}
            ) WHERE k = 1
        ),
        bpe_v{r} AS (
            SELECT replace(v.sym_str, ' ' || p.l || ' ' || p.rr || ' ',
                           ' ' || p.l || p.rr || ' ') AS sym_str,
                   v.wcount
            FROM {prev_vocab} v CROSS JOIN bpe_pick{r} p
        )"""


def _bpe_oracle() -> str:
    rounds = ",\n        ".join(
        _sql_bpe_round("bpe_v0" if r == 1 else f"bpe_v{r - 1}", r)
        for r in range(1, _BPE_ROUNDS + 1)
    )
    picks = " UNION ALL ".join(
        f"SELECT round, l AS left_sym, rr AS right_sym, l || rr AS merged, cnt "
        f"FROM bpe_pick{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
        WITH bpe_words AS (
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
            FROM (SELECT unnest({sql_tokens('text')}) AS w FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        bpe_v0 AS MATERIALIZED (
            SELECT ' ' || array_to_string(
                       list_transform(range(1, length(word) + 1),
                                      i -> substring(word, i, 1)), ' ')
                   || ' ' AS sym_str,
                   wcount
            FROM bpe_words
        ),
        {rounds}
        SELECT * FROM ({picks})
    """


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = _BPE_ROUNDS
) -> list[tuple]:
    """Run `rounds` BPE merge rounds; returns [(round, l, r, merged, cnt)].
    Shared by the trainer query and the encoder.

    Scale posture: the corpus-sized work is exactly ONE tokenize + word
    count; every merge round runs over the word-frequency VOCABULARY
    (bounded, ~100k rows for web-scale corpora) with a 1-row argmax
    collect. At a real operating point (10k+ merges) the per-round
    Spark-job overhead dominates — by then the vocabulary relation is
    model-sized, so the right move is to collect it ONCE and run the
    merge loop driver-side (as reference BPE trainers do), or batch k
    non-overlapping merges per Spark round. The distributed loop here
    is the corpus-to-vocab bridge, not the inner trainer.
    """
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    words = (
        docs.select(F.explode("__t").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wcount"))
    )
    vocab = _persist(
        words.select(
            F.expr(
                "concat(' ', array_join(transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1)), ' '), ' ')"
            ).alias("sym_str"),
            "wcount",
        )
    )
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            # Split ONCE into a column (r12, guide §4.1): the old
            # spelling re-ran split(trim(sym_str)) inside the generator
            # input and once more per struct-field access (generator
            # nested-field aliasing duplicates the whole transform).
            # The pair is emitted as one space-joined string — symbols
            # can never contain a space (initial symbols are single
            # non-space characters; merges concatenate without a
            # separator) — and re-split after the explode, so the
            # (l, rr, cnt) relation is identical row for row.
            # The size filter also dodges Spark's sequence(1, 0)
            # yielding a DESCENDING [1, 0] instead of empty.
            vocab.select(
                F.expr("split(trim(sym_str), ' ')").alias("__syms"), "wcount"
            )
            .where(F.size("__syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__syms) - 1), "
                        "i -> concat(element_at(__syms, i), ' ', "
                        "element_at(__syms, i + 1)))"
                    )
                ).alias("__p"),
                "wcount",
            )
            .groupBy(
                F.expr("substring_index(__p, ' ', 1)").alias("l"),
                F.expr("substring_index(__p, ' ', -1)").alias("rr"),
            )
            .agg(F.sum("wcount").cast("long").alias("cnt"))
        )
        pick = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("rr")).limit(1).collect()[0]
        merges.append((r, pick.l, pick.rr, pick.l + pick.rr, pick.cnt))
        old_vocab = vocab
        vocab = _persist(
            vocab.select(
                # Column-safe literals (never f-string SQL): a learned
                # symbol can contain quotes/backslashes ("don't"), which
                # would break an interpolated expression string.
                F.replace(
                    F.col("sym_str"),
                    F.lit(f" {pick.l} {pick.rr} "),
                    F.lit(f" {pick.l}{pick.rr} "),
                ).alias("sym_str"),
                "wcount",
            )
        )
        old_vocab.unpersist()
    return merges



@register(
    "text_bpe_train_merges",
    oracle=_bpe_oracle(),
    doc="Byte-pair-encoding tokenizer training, 5 merge rounds "
    "(Sennrich et al. 2016): per round, ONE weighted adjacent-pair "
    "count over the word-frequency VOCABULARY (bounded relation, not "
    "the corpus — the standard BPE trick), a deterministic argmax "
    "pick (count desc, pair asc — a TakeOrdered top-1, no global "
    "sort), and the merge applied as a delimiter-guarded string "
    "replace whose left-to-right non-overlapping semantics are "
    "identical in the JVM and DuckDB — so both engines learn the "
    "IDENTICAL merge table, which is the output (round, left, right, "
    "merged, count). The picked pair returns to the driver per round "
    "(1 row — the kmeans-literal discipline); corpus-sized work is "
    "exactly one tokenize + word count.",
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round long, left_sym string, right_sym string, merged string, cnt long"
    )


def _bpe_encode_oracle() -> str:
    """Training CTEs (identical to the trainer) + per-doc encoding: each
    word's symbol string passes through the 5 learned replaces, then
    symbols are summed per document."""
    rounds = ",\n        ".join(
        _sql_bpe_round("bpe_v0" if r == 1 else f"bpe_v{r - 1}", r)
        for r in range(1, _BPE_ROUNDS + 1)
    )
    enc = "enc0"
    steps = []
    for r in range(1, _BPE_ROUNDS + 1):
        steps.append(
            f"""enc{r} AS (
            SELECT doc_id,
                   replace(sym_str,
                           ' ' || (SELECT l FROM bpe_pick{r}) || ' '
                               || (SELECT rr FROM bpe_pick{r}) || ' ',
                           ' ' || (SELECT l FROM bpe_pick{r})
                               || (SELECT rr FROM bpe_pick{r}) || ' ')
                       AS sym_str
            FROM enc{r - 1}
        )"""
        )
        enc = f"enc{r}"
    steps_sql = ",\n        ".join(steps)
    return f"""
        WITH bpe_words AS (
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
            FROM (SELECT unnest({sql_tokens('text')}) AS w FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        bpe_v0 AS MATERIALIZED (
            SELECT ' ' || array_to_string(
                       list_transform(range(1, length(word) + 1),
                                      i -> substring(word, i, 1)), ' ')
                   || ' ' AS sym_str,
                   wcount
            FROM bpe_words
        ),
        {rounds},
        enc0 AS MATERIALIZED (
            SELECT doc_id,
                   ' ' || array_to_string(
                       list_transform(range(1, length(w) + 1),
                                      i -> substring(w, i, 1)), ' ')
                   || ' ' AS sym_str
            FROM (SELECT doc_id, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        {steps_sql}
        SELECT doc_id,
               CAST(SUM(length(trim(sym_str))
                        - length(replace(trim(sym_str), ' ', '')) + 1)
                    AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(length(replace(trim(sym_str), ' ', ''))) AS BIGINT)
                   AS n_chars
        FROM {enc}
        GROUP BY doc_id
    """


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc="Apply the corpus-trained BPE merges to ENCODE every document: "
    "each word's character-symbol string passes through the 5 learned "
    "merge replaces (literal patterns — the merge table is model-"
    "sized driver state, exactly like trained centroids), then "
    "per-doc BPE token and character counts come from delimiter "
    "arithmetic. Train-then-apply in one pipeline: the token-count "
    "ratio n_chars/n_bpe_tokens is the compression the tokenizer "
    "bought — the metric tokenizer ablations report. Encoding is a "
    "pure map stage (5 string replaces per word), one explode + one "
    "per-doc aggregate around it.",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    enc = docs.select(
        "doc_id", F.explode("__t").alias("w")
    ).where(F.col("w") != "").select(
        "doc_id",
        F.expr(
            "concat(' ', array_join(transform(sequence(1, length(w)), "
            "i -> substring(w, i, 1)), ' '), ' ')"
        ).alias("sym_str"),
    )
    for _, l, rr, merged, _cnt in merges:
        # Column-safe literals — see _bpe_train's merge apply.
        enc = enc.withColumn(
            "sym_str",
            F.replace(
                F.col("sym_str"), F.lit(f" {l} {rr} "), F.lit(f" {merged} ")
            ),
        )
    return enc.groupBy("doc_id").agg(
        F.expr(
            "CAST(SUM(length(trim(sym_str)) "
            "- length(replace(trim(sym_str), ' ', '')) + 1) AS BIGINT)"
        ).alias("n_bpe_tokens"),
        F.expr(
            "CAST(SUM(length(replace(trim(sym_str), ' ', ''))) AS BIGINT)"
        ).alias("n_chars"),
    )


@register(
    "text_source_drift_tv",
    oracle=f"""
        WITH toks AS (
            SELECT source, w
            FROM (SELECT source, unnest({sql_tokens('text')}) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        per_source AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS nsw
            FROM toks GROUP BY source, w
        ),
        source_totals AS (
            SELECT source, CAST(SUM(nsw) AS BIGINT) AS ns
            FROM per_source GROUP BY source
        ),
        corpus AS (
            SELECT w, CAST(SUM(nsw) AS BIGINT) AS nw FROM per_source GROUP BY w
        ),
        corpus_total AS (SELECT CAST(SUM(nw) AS BIGINT) AS n FROM corpus),
        sums AS (
            SELECT s.source, t.ns, ct.n,
                   SUM(abs(CAST(s.nsw AS DECIMAL(19,0)) * CAST(ct.n AS DECIMAL(19,0))
                           - CAST(c.nw AS DECIMAL(19,0)) * CAST(t.ns AS DECIMAL(19,0))))
                       AS a,
                   CAST(SUM(c.nw) AS BIGINT) AS b
            FROM per_source s
            JOIN source_totals t USING (source)
            JOIN corpus c USING (w)
            CROSS JOIN corpus_total ct
            GROUP BY s.source, t.ns, ct.n
        )
        SELECT source, ns AS n_tokens,
               CAST(a AS DOUBLE)
                   / (2.0 * CAST(ns AS DOUBLE) * CAST(n AS DOUBLE))
               + (1.0 - CAST(b AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0
                   AS tv_distance
        FROM sums
    """,
    doc="Per-source distribution drift as TOTAL-VARIATION distance "
    "from the corpus unigram distribution: TV = 0.5 * sum |p_s(w) - "
    "p(w)| — the log-free drift/contamination monitor (KL/JS need "
    "libm log, which is not cross-engine bit-stable; TV is a proper "
    "metric with only abs/ratios). Words absent from a source "
    "contribute p(w)/2, folded in CLOSED FORM: over present words sum "
    "|p_s-p|/2 and add (1 - sum_present p)/2 — no per-source "
    "materialization of the full vocabulary. The sums are EXACT "
    "integers (TV numerators scaled by ns*n as decimal products — "
    "order-free, overflow-safe), converted to double once at the end: "
    "per-term decimal->double conversions round differently across "
    "engines in the last ulp, which a first draft of this operator "
    "hit on one source.",
)
def text_source_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    toks = docs.select("source", F.explode("__t").alias("w")).where(
        F.col("w") != ""
    )
    per_source = _persist(
        toks.groupBy("source", "w").agg(F.count("*").cast("long").alias("nsw"))
    )
    source_totals = per_source.groupBy("source").agg(
        F.sum("nsw").cast("long").alias("ns")
    )
    corpus = per_source.groupBy("w").agg(F.sum("nsw").cast("long").alias("nw"))
    corpus_total = corpus.agg(F.sum("nw").cast("long").alias("n"))
    D19 = "decimal(19,0)"
    term = F.abs(
        F.col("nsw").cast(D19) * F.col("n").cast(D19)
        - F.col("nw").cast(D19) * F.col("ns").cast(D19)
    )
    sums = (
        per_source.join(source_totals, "source")
        .join(corpus, "w")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source", "ns", "n")
        .agg(
            F.sum(term).alias("a"),
            F.sum("nw").cast("long").alias("b"),
        )
    )
    return sums.select(
        "source",
        F.col("ns").alias("n_tokens"),
        (
            F.col("a").cast("double")
            / (2.0 * F.col("ns").cast("double") * F.col("n").cast("double"))
            + (1.0 - F.col("b").cast("double") / F.col("n").cast("double")) / 2.0
        ).alias("tv_distance"),
    )


@register(
    "text_vocab_coverage_curve",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(
                       {sql_shingles(sql_tokens('text'), _NOVEL_K)})) AS g
            FROM documents
        ),
        first_doc AS (SELECT g, MIN(doc_id) AS first_id FROM sh GROUP BY g),
        per_doc AS (
            SELECT sh.doc_id,
                   CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM sh JOIN first_doc f USING (g)
            GROUP BY sh.doc_id
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM first_doc)
        SELECT doc_id, n_novel,
               CAST(SUM(n_novel) OVER (ORDER BY doc_id) AS BIGINT)
                   AS cum_novel,
               CAST(SUM(n_novel) OVER (ORDER BY doc_id) AS DOUBLE)
                   / CAST(vocab AS DOUBLE) AS vocab_frac
        FROM per_doc CROSS JOIN tot
    """,
    doc="Vocabulary-coverage curve: cumulative distinct 5-grams as the "
    "corpus is consumed in doc_id order — the saturation curve that "
    "tells a data buyer when additional documents stop contributing "
    "new content (the marginal-value sibling of text_ngram_novelty, "
    "whose per-doc counts feed it). The cumulative sum is the "
    "bucketed two-level prefix scan over a doc_id range bucket "
    "(operators/prefix) with corpus-scaled bucket count — never a "
    "bare ORDER BY window; the oracle is the single-window spelling, "
    "identical by the associativity argument.",
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import (
        bucketed_running_sum,
        derived_rank_buckets,
        range_bucket,
    )
    from sql_engine_spark.operators.textprep import shingles

    docs = load(spark, sf_dir, "documents").withColumn("__t", tokens("text"))
    sh = _persist(
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(shingles("__t", _NOVEL_K))).alias("g"),
        )
    )
    first_doc = _persist(sh.groupBy("g").agg(F.min("doc_id").alias("first_id")))
    # r12 optimization, results identical: n_novel(doc) = #{g : min
    # doc_id over g == doc} needs only first_doc — counting per
    # first_id replaces the join of the full exploded shingle relation
    # back to first_doc (a second corpus-explode-sized shuffle); a left
    # join at doc granularity restores the n_novel = 0 rows.
    novel_counts = first_doc.groupBy("first_id").agg(
        F.count("*").cast("long").alias("n_novel")
    )
    per_doc = _persist(
        sh.select("doc_id")
        .distinct()
        .join(
            novel_counts.withColumnRenamed("first_id", "doc_id"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel")
        )
    )
    vocab = first_doc.agg(F.count("*").cast("long").alias("vocab"))
    bounds = per_doc.agg(
        F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi")
    )
    nb = derived_rank_buckets(per_doc.count())
    cum = bucketed_running_sum(
        per_doc.crossJoin(F.broadcast(bounds)),
        part_cols=[],
        order_col="doc_id",
        value_col="n_novel",
        bucket=range_bucket(F.col("doc_id"), F.col("__lo"), F.col("__hi"), nb),
        out_col="cum_novel",
    )
    return cum.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "n_novel",
        F.col("cum_novel").cast("long").alias("cum_novel"),
        (F.col("cum_novel").cast("double") / F.col("vocab").cast("double")).alias(
            "vocab_frac"
        ),
    )
