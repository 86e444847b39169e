"""Two-level (salted) per-query top-k: bit-equal to the single-window
spelling for any bucket count, and no ANN query plan may rank a
corpus-derived candidate set with a row_number window partitioned by
bare query_id (VERDICT r3 scale-killer #1) — every bare-query_id window
must sit ABOVE the salted level-1 pruning filter."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_engine_spark.operators.similarity import two_level_topk
from sql_engine_spark.registry import all_queries

ANN_TOPK_QUERIES = [
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_lsh_multitable_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
]


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# windowspecdefinition(query_id#12, <second>...) — the token right after
# the query_id partition column. A salted (level-1) window has `__salt`
# there; a bare per-query window has a sort spec (col ASC/DESC) there.
_SPEC = re.compile(r"windowspecdefinition\(query_id#\d+L?, (\w+)#\d+L?( DESC| ASC)?")


@pytest.mark.parametrize("n_buckets", [1, 2, 3, 32, 1000])
def test_two_level_topk_matches_single_window(spark, n_buckets):
    # Scores engineered with heavy ties so the neighbor_id tie-break is
    # load-bearing; 1000 buckets > the 120-row candidate sets.
    rows = [
        (q, n, float((n * 7 + q) % 11))
        for q in range(4)
        for n in range(120)
    ]
    df = spark.createDataFrame(rows, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    expected = sorted(
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .collect()
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in two_level_topk(
            df, score_col="score", k=10, buckets=n_buckets
        ).collect()
    )
    assert got == expected, f"mismatch at buckets={n_buckets}"


@pytest.mark.parametrize("name", ANN_TOPK_QUERIES)
def test_ann_plan_has_no_unsalted_corpus_rank_window(spark, sf_dir, name):
    plan = _optimized_plan(all_queries()[name].build(spark, sf_dir))
    specs = [(m.start(), m.group(1), m.group(2)) for m in _SPEC.finditer(plan)]
    assert specs, f"{name}: expected per-query windows in the plan"
    salted = [s for s in specs if s[1] == "__salt"]
    assert salted, f"{name}: no salted level-1 window found\n{plan}"
    # Every window partitioned by BARE query_id (second token is a sort
    # spec, not __salt) must be ABOVE a level-1 pruning filter — i.e. a
    # `__r1` reference occurs deeper (later) in the printed tree, so its
    # input is the bounded <= buckets*k survivor set, never the raw
    # corpus-derived candidate stream.
    for pos, second, sort_dir in specs:
        if second == "__salt":
            continue
        assert sort_dir is not None, f"{name}: unexpected spec shape {second}"
        assert re.search(r"__r1#\d+", plan[pos:]), (
            f"{name}: bare query_id window at offset {pos} has no salted "
            f"pruning below it\n{plan}"
        )
