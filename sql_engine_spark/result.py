"""Result surface: schema header + rows + pretty table.

Mirrors the reference's `ResultSet { output_schema, data_chunks }` with its
`tabled`-rounded-style Display (/root/reference/src/types/mod.rs:145-178).
Unlike the reference (names-only schema, /root/reference/src/planner/mod.rs:13-74)
our schema is fully typed via Spark's StructType.

Collecting is a driver-side convenience for REPL/tests only — operator code
paths never collect (100 TB posture); `Result.from_df` caps rows fetched.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 10_000


@dataclass
class Result:
    columns: list[str]
    types: list[str]
    rows: list[tuple[Any, ...]]
    truncated: bool = False
    df: DataFrame | None = field(default=None, repr=False)

    @classmethod
    def from_df(cls, df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS) -> "Result":
        taken = df.take(max_rows + 1)
        truncated = len(taken) > max_rows
        rows = [tuple(r) for r in taken[:max_rows]]
        return cls(
            columns=list(df.columns),
            types=[f.dataType.simpleString() for f in df.schema.fields],
            rows=rows,
            truncated=truncated,
            df=df,
        )

    @staticmethod
    def _cell(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def __str__(self) -> str:
        # Rounded box table like the reference REPL (types/mod.rs:160-178).
        cells = [[self._cell(v) for v in row] for row in self.rows]
        widths = [
            max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
            for i, h in enumerate(self.columns)
        ]
        if not widths:
            return "(no columns)"

        def line(l: str, m: str, r: str) -> str:
            return l + m.join("─" * (w + 2) for w in widths) + r

        def row_str(vals: list[str]) -> str:
            return "│" + "│".join(f" {v.ljust(w)} " for v, w in zip(vals, widths)) + "│"

        out = [line("╭", "┬", "╮"), row_str(self.columns), line("├", "┼", "┤")]
        out.extend(row_str(r) for r in cells)
        out.append(line("╰", "┴", "╯"))
        if self.truncated:
            out.append(f"(output truncated at {len(self.rows)} rows)")
        return "\n".join(out)
