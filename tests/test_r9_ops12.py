"""Round-9 final pair (EWMA fleet twin + anisotropy): recompute pins
and the exact batch-convergence check."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _rha(x: float) -> int:
    f = math.floor(abs(x) + 0.5)
    return int(f if x >= 0 else -f)


def _ssum(vals, scale=1e6):
    return sum(_rha(v * scale) for v in vals) / scale


def test_streaming_ewma_chart_converges_to_batch(spark, sf_dir):
    batch = {
        r.day: r
        for r in _build(spark, sf_dir, "events_ewma_control_chart").collect()
    }
    live = {
        r.day: r
        for r in _build(
            spark, sf_dir, "streaming_ewma_control_chart"
        ).collect()
    }
    assert set(live) == set(batch)
    for d, r in live.items():
        b = batch[d]
        assert (r.cnt, r.out_of_control) == (b.cnt, b.out_of_control)
        assert r.ewma == b.ewma
        assert (r.lcl, r.ucl) == (b.lcl, b.ucl)


def test_anisotropy_matches_python(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = [list(map(float, v)) for v in emb.embedding]
    n = len(vecs)
    dim = len(vecs[0])
    mu = [
        _ssum(v[d] for v in vecs) / n for d in range(dim)
    ]
    mean_vec_norm = math.sqrt(_ssum((m * m for m in mu), scale=1e9))
    mean_norm = (
        _ssum(math.sqrt(sum(x * x for x in v)) for v in vecs) / n
    )
    row = _build(spark, sf_dir, "emb_anisotropy_profile").collect()[0]
    assert row.n == n
    assert row.mean_norm == pytest.approx(mean_norm, rel=1e-9)
    assert row.mean_vec_norm == pytest.approx(mean_vec_norm, rel=1e-9)
    assert row.anisotropy == pytest.approx(
        mean_vec_norm / mean_norm, rel=1e-9
    )
    assert 0.0 <= row.anisotropy <= 1.0 + 1e-12
