"""Matrix-free PCA by power iteration — the whitening/top-direction
primitive embedding pipelines run before semantic clustering, computed
without ever materializing the covariance matrix.

Each round is v <- normalize(X^T (X v)): one distributed pass (per-row
dot against the LITERAL v, then per-dimension DECIMAL-exact column
sums), with only the dim-sized result vector returning to the driver —
the same model-sized-collect discipline as train_kmeans_literal
(operators/similarity.py). The DECIMAL(27,6) rounding of each per-row
contribution is part of the operator's definition, applied identically
in the SQL oracle, making every round bit-reproducible across engines
and partitionings. Convergence rate depends on the spectral gap
(slow on near-isotropic corpora — standard power-iteration behavior);
fix the iteration count for oracle determinism and raise it (or seed
from a prior component) when the gap is small.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_power_component(
    df: DataFrame, *, vec_col: str, dim: int, iterations: int
) -> tuple[list[float], float]:
    """Returns (unit component vector as list[dim], eigenvalue estimate
    |X^T X v| / n). Start vector is e_1 (deterministic)."""
    n = df.count()
    v = [1.0] + [0.0] * (dim - 1)
    nrm = 1.0
    for _ in range(iterations):
        vlit = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")"
        xv = (
            f"aggregate(zip_with({vec_col}, {vlit}, "
            f"(a, b) -> CAST(a AS DOUBLE) * b), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        sums = (
            df.withColumn("__xv", F.expr(xv))
            .select(F.posexplode(vec_col).alias("dim0", "__x"), F.col("__xv"))
            .groupBy("dim0")
            .agg(
                F.sum(
                    (F.col("__x").cast("double") * F.col("__xv")).cast(
                        "decimal(27,6)"
                    )
                )
                .cast("double")
                .alias("s")
            )
            .collect()
        )
        raw = [0.0] * dim
        for r in sums:
            raw[r.dim0] = r.s
        acc = 0.0
        for y in raw:  # dimension order, matching the oracle's fold
            acc = acc + y * y
        nrm = math.sqrt(acc)
        v = [x / nrm for x in raw]
    return v, nrm / float(n)
