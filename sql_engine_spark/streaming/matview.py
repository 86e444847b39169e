"""Idempotent foreachBatch-maintained materialized view.

foreachBatch gives AT-LEAST-ONCE semantics: on task retry, trigger
replay, or restart-from-checkpoint, the same (batch_df, batch_id) can
be delivered again. A merge that blindly folds the partial into the
view double-counts on every such retry. The classic fix (the one Delta
spells as `txnAppId`/`txnVersion`) is to make the applied batch id part
of the view's own atomic commit:

- the marker file (`_applied_batch`, underscore-prefixed so parquet
  directory reads ignore it) is written INTO the new view directory
  BEFORE the directory rename, so data + id travel as one unit;
- a batch whose id is <= the recorded id is dropped on arrival;
- the commit itself is TWO renames (current -> current.old, then
  swap_<id> -> current), so a crash can land between them. Recovery is
  deterministic from what survives on disk and runs on every entry
  (`_recover`): a fully-written swap directory (its marker exists)
  with `current` missing rolls FORWARD; `current.old` with neither
  `current` nor a complete swap rolls BACK; everything stale is
  removed. Either way the view is a consistent committed state and
  `last_applied` tells the stream exactly which batches to refold.

Batch ids from one streaming query are strictly increasing, so the
"<= last applied" test is exactly the dedup condition.

Concurrency contract: SINGLE WRITER. One foreachBatch stream owns the
view directory; __init__ and merge() are the only entry points that
mutate it (recovery renames included). read() is side-effect-free and
BEST-EFFORT under a racing commit: mid-commit it falls back to the
state recovery would roll to, without performing the roll, and retries
the fallback chain once if a directory vanishes between its existence
probe and the parquet read (the TOCTOU window is real — r7 advice). A
rename landing between read() returning and the consuming ACTION is
outside its control; strict readers should pin the result promptly
(collect/persist) or serialize with the writer.

View state stays aggregate-sized; per-trigger cost is O(batch) +
O(view), never O(history).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame

_MARKER = "_applied_batch"


class IdempotentMatView:
    """A parquet-backed view directory with exactly-once batch merges.

    `combine(current_or_none, partial) -> merged` defines the view
    update; `partial_of(batch_df) -> partial` the per-batch reduction.
    """

    def __init__(
        self,
        view_dir: str,
        *,
        partial_of: Callable[[DataFrame], DataFrame],
        combine: Callable[[DataFrame, DataFrame], DataFrame],
    ) -> None:
        self.view_dir = view_dir
        self.target = os.path.join(view_dir, "current")
        self._partial_of = partial_of
        self._combine = combine
        self._recover()

    @staticmethod
    def _marker_id(d: str) -> int | None:
        """Batch id from a directory's marker, or None if the marker is
        absent/garbled (an incompletely-written swap)."""
        try:
            with open(os.path.join(d, _MARKER)) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return None

    def _swap_dirs(self) -> list[tuple[int, str]]:
        try:
            names = os.listdir(self.view_dir)
        except OSError:
            return []
        out = []
        for n in names:
            if not n.startswith("swap_"):
                continue
            d = os.path.join(self.view_dir, n)
            bid = self._marker_id(d)
            if bid is not None:
                out.append((bid, d))
        return sorted(out)

    def _recover(self) -> None:
        """Make the on-disk state a consistent committed view again after
        a crash anywhere in merge()'s two-rename commit (see module
        docstring). Idempotent; called on every entry point."""
        old = self.target + ".old"
        if not os.path.isdir(self.target):
            swaps = self._swap_dirs()
            if swaps:
                # Crash BETWEEN the renames: the new view was fully
                # written (marker present) — roll forward.
                _, newest = swaps[-1]
                os.rename(newest, self.target)
            elif os.path.isdir(old):
                # No complete swap to roll forward to — roll back.
                os.rename(old, self.target)
        # Stale leftovers: a .old surviving a completed commit (crash
        # before the rmtree) and swaps at-or-below the committed id
        # (crash before the first rename, or roll-forward losers).
        shutil.rmtree(old, ignore_errors=True)
        applied = self.last_applied()
        for bid, d in self._swap_dirs():
            if bid <= applied:
                shutil.rmtree(d, ignore_errors=True)

    def last_applied(self) -> int:
        bid = self._marker_id(self.target)
        return -1 if bid is None else bid

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        self._recover()
        if batch_id <= self.last_applied():
            return  # retried / replayed batch: already folded in
        partial = self._partial_of(batch_df)
        if os.path.isdir(self.target):
            cur = batch_df.sparkSession.read.parquet(self.target)
            merged = self._combine(cur, partial)
        else:
            merged = partial
        tmp = os.path.join(self.view_dir, f"swap_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _MARKER), "w") as fh:
            fh.write(str(batch_id))
        old = self.target + ".old"
        if os.path.isdir(self.target):
            os.rename(self.target, old)
        os.rename(tmp, self.target)
        shutil.rmtree(old, ignore_errors=True)

    def read(self, spark, schema=None) -> DataFrame:
        """Read the latest committed view state WITHOUT mutating the
        view directory: recovery renames belong to __init__/merge()
        (the single-writer entry points), so a reader racing a
        concurrent merge between its two renames can never steal the
        swap -> current rename out from under it. When `current` is
        momentarily absent mid-commit, fall back to the same state
        _recover() would roll to — the newest fully-written swap
        (roll-forward target), else current.old (roll-back target) —
        read-only. The isdir-probe -> parquet-read window is a genuine
        TOCTOU against a concurrent merge(), so a vanished path is
        retried once through the whole chain (see module docstring:
        best-effort for readers racing a commit)."""
        from pyspark.errors import AnalysisException

        # An explicit schema (when the caller knows it — e.g. the
        # batch-state runner, whose state schema is fixed per query)
        # skips the per-read parquet footer-inference job.
        reader = spark.read if schema is None else spark.read.schema(schema)
        last_exc: AnalysisException | None = None
        for _ in range(2):
            try:
                if os.path.isdir(self.target):
                    return reader.parquet(self.target)
                swaps = self._swap_dirs()
                if swaps:
                    return reader.parquet(swaps[-1][1])
                old = self.target + ".old"
                if os.path.isdir(old):
                    return reader.parquet(old)
                break  # nothing committed yet — retrying cannot help
            except AnalysisException as exc:
                # Path vanished between the probe and the read: a
                # commit's rename landed mid-chain. Re-walk the chain.
                last_exc = exc
        if last_exc is not None:
            raise last_exc
        # Nothing committed yet: surface the standard missing-path error.
        return spark.read.parquet(self.target)
