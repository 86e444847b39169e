"""Idempotent foreachBatch-maintained materialized view.

foreachBatch gives AT-LEAST-ONCE semantics: on task retry, trigger
replay, or restart-from-checkpoint, the same (batch_df, batch_id) can
be delivered again. A merge that blindly folds the partial into the
view double-counts on every such retry. The classic fix (the one Delta
spells as `txnAppId`/`txnVersion`) is to make the applied batch id part
of the view's own atomic commit:

- the marker file (`_applied_batch`, underscore-prefixed so parquet
  directory reads ignore it) is written INTO the new view directory
  BEFORE the directory rename, so data + id swap as one unit — either
  the whole merge landed or none of it did;
- a batch whose id is <= the recorded id is dropped on arrival.

Batch ids from one streaming query are strictly increasing, so the
"<= last applied" test is exactly the dedup condition.

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

    def last_applied(self) -> int:
        try:
            with open(os.path.join(self.target, _MARKER)) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
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

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.target)
