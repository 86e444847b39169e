"""The correctness gate: every registered query must match its DuckDB
oracle exactly at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from sql_engine_spark.oracle import compare_query, duckdb_connection
from sql_engine_spark.registry import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match(spark, con, sf_dir, name):
    res = compare_query(spark, con, QUERIES[name], sf_dir)
    assert res.ok, f"{name}: {res.problems}"
    if QUERIES[name].oracle is not None:
        assert res.spark_rows == res.oracle_rows
