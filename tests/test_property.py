"""Property-based differential testing: hypothesis generates random
filter + group + aggregate plans over lineitem; each must match DuckDB
exactly. The reference has NO property/randomized testing (SURVEY.md §5)
— this is the superset guard that catches expression-semantics drift the
hand-written corpus never thought to write down."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.oracle import compare_query, duckdb_connection
from sql_engine_spark.registry import Query

NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1, 7),
}
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
OPS = ["<", "<=", ">", ">=", "=", "<>"]

_num_pred = st.builds(
    lambda c, op, frac: (c, op, round(NUM_COLS[c][0] + frac * (NUM_COLS[c][1] - NUM_COLS[c][0]), 3)),
    st.sampled_from(sorted(NUM_COLS)),
    st.sampled_from(OPS),
    st.floats(0.0, 1.0, allow_nan=False),
)
_str_pred = st.builds(
    lambda c, op, i: (c, op, STR_COLS[c][i % len(STR_COLS[c])]),
    st.sampled_from(sorted(STR_COLS)),
    st.sampled_from(["=", "<>"]),
    st.integers(0, 2),
)
_predicates = st.lists(st.one_of(_num_pred, _str_pred), min_size=1, max_size=3)
_connectors = st.lists(st.sampled_from(["AND", "OR"]), min_size=2, max_size=2)
_group = st.sampled_from([(), ("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")])
_agg_col = st.sampled_from(["l_quantity", "l_extendedprice", "l_linenumber"])


def _sql_lit(v):
    return f"'{v}'" if isinstance(v, str) else repr(v)


def _where_sql(preds, conns):
    parts = [f"({c} {op} {_sql_lit(v)})" for c, op, v in preds]
    out = parts[0]
    for i, p in enumerate(parts[1:]):
        out = f"({out} {conns[i]} {p})"
    return out


def _where_col(preds, conns):
    def one(c, op, v):
        col = F.col(c)
        return {
            "<": col < v, "<=": col <= v, ">": col > v,
            ">=": col >= v, "=": col == v, "<>": col != v,
        }[op]

    out = one(*preds[0])
    for i, p in enumerate(preds[1:]):
        out = (out & one(*p)) if conns[i] == "AND" else (out | one(*p))
    return out


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=_predicates, conns=_connectors, group=_group, agg_col=_agg_col)
def test_random_filter_agg_matches_duckdb(spark, con, sf_dir, preds, conns, group, agg_col):
    where_sql = _where_sql(preds, conns)
    gcols = ", ".join(group)
    sql = (
        f"SELECT {gcols + ', ' if gcols else ''}COUNT(*) AS n, "
        f"MIN({agg_col}) AS mn, MAX({agg_col}) AS mx, {sql_dsum(agg_col)} AS s "
        f"FROM lineitem WHERE {where_sql}"
        + (f" GROUP BY {gcols}" if gcols else "")
    )

    def build(spark_, sf_dir_):
        li = load(spark_, sf_dir_, "lineitem").where(_where_col(preds, conns))
        aggs = [
            F.count("*").alias("n"),
            F.min(agg_col).alias("mn"),
            F.max(agg_col).alias("mx"),
            dsum(agg_col).alias("s"),
        ]
        return li.groupBy(*group).agg(*aggs) if group else li.agg(*aggs)

    res = compare_query(spark, con, Query(name="prop", build=build, oracle=sql), sf_dir)
    assert res.ok, f"{sql}\n{res.problems}"


_o_pred = st.builds(
    lambda op, frac: ("o_totalprice", op, round(1000 + frac * 500000, 2)),
    st.sampled_from(OPS),
    st.floats(0.0, 1.0, allow_nan=False),
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(li_preds=_predicates, conns=_connectors, o_pred=_o_pred, group=_group)
def test_random_join_agg_matches_duckdb(spark, con, sf_dir, li_preds, conns, o_pred, group):
    li_where = _where_sql(li_preds, conns)
    oc, oop, ov = o_pred
    gcols = ", ".join(group)
    sql = (
        f"SELECT {gcols + ', ' if gcols else ''}COUNT(*) AS n, "
        f"MIN(o_totalprice) AS mn, {sql_dsum('l_quantity')} AS s "
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE {li_where} AND ({oc} {oop} {_sql_lit(ov)})"
        + (f" GROUP BY {gcols}" if gcols else "")
    )

    def build(spark_, sf_dir_):
        li = load(spark_, sf_dir_, "lineitem").where(_where_col(li_preds, conns))
        o = load(spark_, sf_dir_, "orders").where(_where_col([o_pred], []))
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        aggs = [
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("mn"),
            dsum("l_quantity").alias("s"),
        ]
        return j.groupBy(*group).agg(*aggs) if group else j.agg(*aggs)

    res = compare_query(spark, con, Query(name="prop_join", build=build, oracle=sql), sf_dir)
    assert res.ok, f"{sql}\n{res.problems}"


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    chunk=st.integers(4, 48),
    stride_frac=st.floats(0.25, 1.0, allow_nan=False),
)
def test_random_chunk_stride_matches_duckdb(spark, con, sf_dir, chunk, stride_frac):
    """Context-window chunking must match DuckDB for ANY (chunk, stride)
    with stride <= chunk — slicing off-by-ones between Spark's
    slice(start, len) and DuckDB's inclusive [a:b] only surface at odd
    parameter combos the hand-written query never pins."""
    from sql_engine_spark.operators.textprep import sql_tokens, tokens

    stride = max(1, int(chunk * stride_frac))

    def build(s, d):
        docs = load(s, d, "documents").select("doc_id", tokens("text").alias("__t"))
        return (
            docs.select(
                "doc_id",
                "__t",
                F.explode(
                    F.sequence(
                        F.lit(0), F.floor((F.size("__t") - 1) / stride).cast("int")
                    )
                ).alias("k"),
            )
            .select(
                "doc_id",
                F.col("k").cast("long").alias("chunk_id"),
                F.array_join(
                    F.slice("__t", F.col("k") * stride + 1, chunk), " "
                ).alias("chunk_text"),
            )
        )

    toks = sql_tokens("text")
    oracle = f"""
        WITH t AS (SELECT doc_id, {toks} AS tt FROM documents)
        SELECT doc_id, k AS chunk_id,
               array_to_string(tt[k * {stride} + 1 : k * {stride} + {chunk}], ' ')
                   AS chunk_text
        FROM t CROSS JOIN LATERAL (
            SELECT unnest(range(0, CAST(floor((len(tt) - 1) / {stride}) AS BIGINT) + 1)) AS k
        ) u
    """
    q = Query(name=f"prop_chunk_{chunk}_{stride}", build=build, oracle=oracle)
    res = compare_query(spark, con, q, sf_dir)
    assert res.ok, f"chunk={chunk} stride={stride}: {res.problems}"


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(k=st.integers(2, 6), w=st.integers(2, 8))
def test_random_winnow_params_match_duckdb(spark, con, sf_dir, k, w):
    """Winnowing fingerprints must match DuckDB for any (k-gram, window)
    combo, including degenerate docs shorter than the gram/window size."""
    from sql_engine_spark.operators.text import winnow_fingerprints
    from sql_engine_spark.operators.textprep import sql_shingles, sql_tokens

    def build(s, d):
        return winnow_fingerprints(
            load(s, d, "documents"), id_col="doc_id", text_col="text", k=k, w=w
        )

    oracle = f"""
        WITH t AS (
            SELECT doc_id,
                   list_transform({sql_shingles(sql_tokens('text'), k)}, g -> md5(g)) AS hs
            FROM documents
        ),
        fps AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(hs) - {w - 1}, 1) + 1),
                       i -> list_aggregate(hs[i : i + {w - 1}], 'min'))) AS f
            FROM t
        )
        SELECT doc_id, unnest(f) AS fp FROM fps
    """
    q = Query(name=f"prop_winnow_{k}_{w}", build=build, oracle=oracle)
    res = compare_query(spark, con, q, sf_dir)
    assert res.ok, f"k={k} w={w}: {res.problems}"
