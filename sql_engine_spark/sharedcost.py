"""Process-level ledger of shared-build wall costs.

Several derived relations are built once per (process, dataset) and
materialized to a tracked tmpdir (bm25 index, hashed-shingle sets, the
exact prefix-filter pair table, the kNN graph, streaming replay dirs,
the fleet replay pass). Every consumer after the first scans the
materialized result, so the bench's recorded per-query walls capture
the scan, not the build — the r12 verdict asked for the builds to be
priced as explicit line items so section totals decompose into
true process cost (VERDICT r12 #5 / "what's wrong" #2).

Each build site calls `record(name, seconds)` around its cold branch;
bench.py emits `snapshot()` as `shared_builds` in both the artifact and
the compact final stdout line. Names are short on purpose: the final
line must survive the driver's 2,000-char stdout-tail capture.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

_COSTS: dict[str, float] = {}


def record(name: str, seconds: float) -> None:
    """Accumulate `seconds` of cold-build wall under `name` (a process
    may pay a build more than once, e.g. per dataset fingerprint)."""
    _COSTS[name] = round(_COSTS.get(name, 0.0) + seconds, 3)


@contextmanager
def timed(name: str):
    t0 = time.time()
    try:
        yield
    finally:
        record(name, time.time() - t0)


def snapshot() -> dict[str, float]:
    return dict(sorted(_COSTS.items()))
