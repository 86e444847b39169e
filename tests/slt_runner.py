"""Minimal sqllogictest-style runner for the Engine surface.

Mirrors the reference's test strategy (end-to-end golden-output files run
through the public Database/Engine API; /root/reference/tests/common/mod.rs
drives the same way) — but the corpus is our own and expectations follow
standard SQL semantics (SURVEY.md §7.4), not the reference's quirks.

Directive grammar (subset of sqllogictest):

    statement ok
    <sql...>

    statement error <substring expected in the EngineError message>
    <sql...>

    query [rowsort]
    <sql...>
    ----
    <one expected row per line, columns joined by a single tab>

Blocks are separated by blank lines; `#` lines are comments. `{data}` in
SQL is replaced with the fixture directory (exercising the quoted-path
table surface).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from pathlib import Path

from sql_engine_spark.engine import Engine
from sql_engine_spark.errors import EngineError


@dataclass
class Block:
    kind: str  # "ok" | "error" | "query"
    sql: str
    source: str  # file:line for failure messages
    expect_error: str = ""
    rowsort: bool = False
    expected: list[str] = field(default_factory=list)


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    return str(v)


def parse_slt(path: str | Path) -> list[Block]:
    lines = Path(path).read_text().splitlines()
    blocks: list[Block] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        source = f"{path}:{i + 1}"
        if line.startswith("statement"):
            rest = line[len("statement") :].strip()
            kind, expect = ("error", rest[len("error") :].strip()) if rest.startswith(
                "error"
            ) else ("ok", "")
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and not lines[i].startswith("#"):
                sql_lines.append(lines[i])
                i += 1
            blocks.append(
                Block(kind=kind, sql="\n".join(sql_lines), source=source, expect_error=expect)
            )
        elif line.startswith("query"):
            rowsort = "rowsort" in line.split()
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            if i >= n:
                raise ValueError(f"{source}: query block missing ---- separator")
            i += 1  # skip ----
            expected = []
            while i < n and lines[i].strip():
                expected.append(lines[i].rstrip("\n"))
                i += 1
            blocks.append(
                Block(
                    kind="query",
                    sql="\n".join(sql_lines),
                    source=source,
                    rowsort=rowsort,
                    expected=expected,
                )
            )
        else:
            raise ValueError(f"{source}: unknown directive {line!r}")
    return blocks


def run_slt_file(engine: Engine, path: str | Path, data_dir: str) -> None:
    """Execute every block; raises AssertionError with file:line context."""
    for b in parse_slt(path):
        sql = b.sql.replace("{data}", data_dir)
        if b.kind == "ok":
            engine.execute(sql)
        elif b.kind == "error":
            try:
                engine.execute(sql)
            except EngineError as e:
                msg = str(e)
                assert b.expect_error in msg, (
                    f"{b.source}: expected error containing {b.expect_error!r}, got {msg!r}"
                )
            else:
                raise AssertionError(f"{b.source}: expected an error, statement succeeded")
        else:
            result = engine.execute(sql)
            got = ["\t".join(_cell(v) for v in row) for row in result.rows]
            exp = list(b.expected)
            if b.rowsort:
                got, exp = sorted(got), sorted(exp)
            assert got == exp, (
                f"{b.source}: result mismatch\n  got: {got!r}\n  expected: {exp!r}"
            )
