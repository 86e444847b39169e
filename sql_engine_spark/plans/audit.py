"""Plan introspection: EXPLAIN surface + scan-efficiency audit.

The reference has no EXPLAIN and an identity optimizer
(/root/reference/src/optimizer/mod.rs:10-12). Here the optimizer is
Catalyst; this module makes its decisions *inspectable* so tests (and
operators) can assert the plan they want at 100 TB — filters pushed to
the parquet scan, columns pruned, partitions pruned, broadcast joins
chosen — instead of trusting it blindly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(...) as a string instead of stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class ScanAudit:
    """What actually reaches the file scans of a plan."""

    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    has_codegen: bool = False

    def reads_only(self, *cols: str) -> bool:
        """True if every scan's ReadSchema is a subset of `cols`."""
        allowed = set(cols)
        for schema in self.read_schemas:
            got = set(re.findall(r"(\w+):", schema))
            if not got <= allowed:
                return False
        return True


def audit(df: DataFrame) -> ScanAudit:
    plan = explain_str(df, "formatted")
    return ScanAudit(
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()
        ],
        partition_filters=[
            m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if m.strip()
        ],
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        broadcast_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        sortmerge_joins=len(re.findall(r"SortMergeJoin", plan)),
        # formatted mode prefixes codegen'd operators with "* "
        has_codegen=bool(re.search(r"^\s*\*(?:\(\d+\))? ", plan, re.MULTILINE)),
    )
