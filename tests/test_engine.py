"""Engine surface tests: quoted-path tables, result formatting, error
taxonomy, multi-statement behavior — the reference's Database/REPL surface
(SURVEY.md §3), including its SLT-pinned behaviors re-normalized to
standard SQL semantics (SURVEY.md §7.4).
"""

from __future__ import annotations

import pytest

from sql_engine_spark.engine import Engine, split_statements
from sql_engine_spark.errors import ParserError, PlannerError
from sql_engine_spark.result import Result


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def movies1(tmp_path_factory, spark):
    """Recreate the reference's movies1 fixture (FIXTURES.md §3)."""
    rows = [
        ("taxi driver", 9, 8, 7, 1976),
        ("lion king", 2, 3, 5, 1994),
        ("drive", 10, 9, 4, 2011),
        ("avengers", 2, 1, 6, 2012),
        ("django", 8, 8, 8, 2012),
        ("the shawshank redemption", 10, 9, 10, 1994),
        ("a star is born", 5, 6, 6, 1976),
        ("carrie", 2, 3, 0, 1976),
    ]
    path = str(tmp_path_factory.mktemp("data") / "movies1.parquet")
    df = spark.createDataFrame(rows, "movie string, score1 int, score2 int, score3 int, year int")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_path_table_select(engine, movies1):
    # The reference's core surface: quoted path as table name
    # (/root/reference/src/planner/mod.rs:508-535).
    res = engine.execute(f"select movie, score1 from '{movies1}' where year = 1976")
    assert res.columns == ["movie", "score1"]
    assert sorted(res.rows) == [("a star is born", 5), ("carrie", 2), ("taxi driver", 9)]


def test_path_table_join_and_alias(engine, movies1):
    res = engine.execute(
        f"select m1.movie from '{movies1}' m1 join '{movies1}' m2 "
        "on m1.year = m2.year and m1.score1 < m2.score1"
    )
    assert res.columns == ["movie"]
    assert len(res.rows) == 5


def test_aggregate_query(engine, movies1):
    res = engine.execute(
        f"select year, max(score1) as mx, avg(score2) as av from '{movies1}' "
        "group by year having count(*) > 1 order by year"
    )
    assert res.rows[0][0] == 1976
    assert res.rows[0][1] == 9


def test_select_without_from(engine):
    res = engine.execute("select 1 as x, 'a' as s")
    assert res.rows == [(1, "a")]


def test_multi_statement_runs_last(engine, movies1):
    # Reference quirk kept: only the last statement executes
    # (/root/reference/src/planner/mod.rs:132-137).
    res = engine.execute(f"select 1 as a; select 2 as b from '{movies1}' limit 1")
    assert res.columns == ["b"]


def test_parser_error(engine):
    with pytest.raises(ParserError) as e:
        engine.execute("select 1 from (")
    assert "Parser Error" in str(e.value)


def test_planner_error_unknown_column(engine, movies1):
    # Reference: "Planner Error: Field not found: dne" (aggregates4.slt:13-14).
    with pytest.raises(PlannerError):
        engine.execute(f"select dne from '{movies1}'")


def test_result_pretty_print(engine):
    res = engine.execute("select 1 as x, null as y")
    s = str(res)
    assert "╭" in s and "NULL" in s and "x" in s


def test_split_statements_quote_aware():
    assert split_statements("select ';x'; select 2") == ["select ';x'", "select 2"]


def test_superset_clauses(engine, movies1):
    # ORDER BY / OFFSET / DISTINCT / CASE / IN / BETWEEN — all absent in the
    # reference (SURVEY.md §2.5), first-class here.
    res = engine.execute(
        f"select distinct year from '{movies1}' order by year desc limit 2 offset 1"
    )
    assert res.rows == [(2011,), (1994,)]


def test_result_from_df_truncation(spark):
    res = Result.from_df(spark.range(10).toDF("i"), max_rows=3)
    assert res.truncated and len(res.rows) == 3


def test_ddl_dml_surface(engine):
    """CREATE/INSERT/SELECT/DROP through the engine (reference rejects all
    DDL/DML, /root/reference/src/planner/mod.rs:205-207 — superset here)."""
    engine.execute("DROP TABLE IF EXISTS t_ddl_probe")
    engine.execute("CREATE TABLE t_ddl_probe (a INT, b STRING) USING parquet")
    try:
        engine.execute("INSERT INTO t_ddl_probe VALUES (1, 'x'), (2, 'y')")
        res = engine.execute("SELECT a, b FROM t_ddl_probe ORDER BY a")
        assert res.rows == [(1, "x"), (2, "y")]
        engine.execute("INSERT OVERWRITE TABLE t_ddl_probe VALUES (3, 'z')")
        res = engine.execute("SELECT a, b FROM t_ddl_probe")
        assert res.rows == [(3, "z")]
        n = engine.execute(
            "SELECT count(*) AS n FROM t_ddl_probe JOIN t_ddl_probe USING (a)"
        )
        assert n.rows == [(1,)]
    finally:
        engine.execute("DROP TABLE t_ddl_probe")
