"""Pin for the DCT perceptual hash: a plain-Python recompute of the
md5-chain grid, the relational DCT (with ssum's shared half-away-from-
zero rounding replicated exactly), the median threshold, and the bit
pack — exact equality on every document."""

from __future__ import annotations

import hashlib
import math

from sql_engine_spark.io import load
from sql_engine_spark.queries.round7_multimodal2 import _DCT_C, _N
from sql_engine_spark.registry import all_queries

_S = 1_000_000_000.0


def _ssum(terms):
    """round(x*1e9) half-away-from-zero, exact integer sum, scale back —
    the engines' shared reduction."""
    tot = 0
    for x in terms:
        v = x * _S
        tot += math.floor(abs(v) + 0.5) * (1 if v >= 0 else -1)
    return tot / _S


def test_phash_matches_python_recompute(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {
        r.doc_id: (r.phash, r.n_bits, r.median_coeff)
        for r in all_queries()["multimodal_phash_dct"].build(spark, sf_dir).collect()
    }
    assert len(got) == len(docs)
    for r in docs:
        digests = [
            hashlib.md5(f"{r.text}#{c}".encode("utf-8")).digest() for c in range(4)
        ]
        x = [
            [digests[(_N * i + j) // 16][(_N * i + j) % 16] for j in range(_N)]
            for i in range(_N)
        ]
        t1 = [
            [_ssum(_DCT_C[u][i] * float(x[i][j]) for i in range(_N)) for j in range(_N)]
            for u in range(_N)
        ]
        y = {
            (u, v): _ssum(t1[u][j] * _DCT_C[v][j] for j in range(_N))
            for u in range(_N)
            for v in range(_N)
        }
        ac = sorted(
            (c, u, v) for (u, v), c in y.items() if (u, v) != (0, 0)
        )
        median = ac[31][0]  # rank 32 of 63
        phash = 0
        n_bits = 0
        for (u, v), c in y.items():
            if (u, v) != (0, 0) and c > median:
                phash |= 1 << (_N * u + v - 1)
                n_bits += 1
        g = got[r.doc_id]
        assert g[0] == phash, f"doc {r.doc_id}"
        assert g[1] == n_bits
        assert g[2] == median
        assert bin(g[0]).count("1") == g[1]
        assert 0 < g[1] <= 32
