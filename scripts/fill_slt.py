#!/usr/bin/env python
"""Fill SLT expected sections from the DuckDB oracle.

Usage: python scripts/fill_slt.py <data_dir> tests/slt/*.slt

Runs every `query` block through DuckDB (the independent oracle — never
our engine, so goldens can't be circular) and rewrites the file's expected
rows in place using the same cell formatting as tests/slt_runner.py.
`statement` blocks are left untouched.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from slt_runner import _cell  # noqa: E402


def fill(path: Path, data_dir: str, con) -> None:
    lines = path.read_text().splitlines()
    out: list[str] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if line.strip().startswith("query"):
            out.append(line)
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                out.append(lines[i])
                sql_lines.append(lines[i])
                i += 1
            out.append("----")
            i += 1  # skip ----
            while i < n and lines[i].strip():  # drop old expectations
                i += 1
            sql = "\n".join(sql_lines).replace("{data}", data_dir)
            # engine semantics: multi-statement input runs only the last
            sql = sql.split(";")[-1]
            rows = con.execute(sql).fetchall()
            for row in rows:
                out.append("\t".join(_cell(v) for v in row))
        else:
            out.append(line)
            i += 1
    path.write_text("\n".join(out) + "\n")
    print(f"filled {path}")


def main() -> int:
    data_dir = sys.argv[1]
    con = duckdb.connect()
    for p in sys.argv[2:]:
        fill(Path(p), data_dir, con)
    return 0


if __name__ == "__main__":
    sys.exit(main())
