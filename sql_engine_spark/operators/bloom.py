"""Bloom-filter join pre-filtering — the runtime-filter pattern (Spark's
own `spark.sql.optimizer.runtime.bloomFilter.enabled`, Bloom 1970)
spelled explicitly so the engine exposes it as an operator.

At 100 TB the expensive part of fact-joins-dim is shuffling the FACT
side; when the dim side is selective, most fact rows shuffle only to be
dropped by the join. A Bloom filter of the dim keys — a few KB of bits —
travels to every fact task and drops non-matching rows MAP-SIDE, before
the exchange. False positives (tunable via m/k) survive the pre-filter
but are removed by the exact join that follows, so the operator's
result is definitionally the plain semi join — which is what the
oracle checks.

Construction keeps everything bounded:
- positions: k=`n_hashes` positions per key via xxhash64(key, seed) mod
  m — computed distributed, one explode over the (already filtered,
  bounded) dim side;
- the distinct position list (<= m entries, m defaults to 8192 bits) is
  collected to the driver and folded into `m/64` longs — a model-sized
  collect, same class as the k-means centroid literals
  (operators/similarity.py);
- the bitset ships to fact tasks as a LITERAL array<long>: the
  membership probe is k element_at + bit-shift ops per row, pure JVM
  codegen, no join, no shuffle.

The driver round-trip makes this a two-job operator (build, then
probe) — exactly how Spark's own runtime bloom filter executes its
subquery. For a streaming/fully-lazy variant, broadcast the positions
relation instead and probe with a broadcast join on position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 8192  # m: power of two, 128 longs
BLOOM_HASHES = 4  # k

# The literal-expression probe embeds m/64 longs into the plan, so m is
# capped where the plan stays small (2^20 bits = 16k longs ~ 128 KB of
# literals). Beyond ~100k dim keys (>= ~10 bits/key for ~1% fp at k=4),
# switch to Spark's native runtime bloom (bloom_filter_agg/might_contain)
# or a broadcast positions relation — this operator's probe is for
# SELECTIVE dim sides, which is when a runtime filter pays anyway.
BLOOM_MAX_BITS = 1 << 20
_BLOOM_BITS_PER_KEY = 10


def derived_bloom_bits(n_keys: int, *, floor: int = BLOOM_BITS) -> int:
    """Bitset size for ~1% false positives at k=4: next power of two
    >= 10 bits/key, floored at the 8192 default and capped at
    BLOOM_MAX_BITS (past the cap fp rate degrades gracefully — never
    correctness, the exact join downstream removes false positives)."""
    bits = floor
    while bits < n_keys * _BLOOM_BITS_PER_KEY and bits < BLOOM_MAX_BITS:
        bits <<= 1
    return bits


def _positions(key: Column, *, bits: int, hashes: int) -> Column:
    """array of `hashes` bit positions for a key (xxhash64 seeded by
    hash index; pmod keeps positions in [0, bits))."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(bits)).cast("int")
            for i in range(hashes)
        ]
    )


def build_bloom_bits(
    keys: DataFrame,
    key_col: str,
    *,
    bits: int | None = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> tuple[list[int], int]:
    """Distributed position generation, bounded driver fold: returns
    (bitset as `bits/64` Python ints for a literal array<long>, bits).
    ``bits=None`` derives the size from the key count (one cheap count
    job) via derived_bloom_bits so the fp rate holds as the dim side
    grows, instead of silently saturating a fixed bitset."""
    if bits is None:
        bits = derived_bloom_bits(keys.count())
    pos_rows = (
        keys.select(
            F.explode(_positions(F.col(key_col), bits=bits, hashes=hashes)).alias(
                "__p"
            )
        )
        .distinct()
        .collect()
    )
    words = [0] * (bits // 64)
    for r in pos_rows:
        p = r["__p"]
        words[p // 64] |= 1 << (p % 64)
    # Python ints are unbounded; fold back into signed 64-bit for the
    # Spark LongType literal.
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words], bits


def bloom_might_contain(
    key_expr: str, words: list[int], *, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES
) -> Column:
    """Membership probe against a literal bitset: k element_at +
    shift-and-test ops, whole-stage-codegen friendly, no shuffle.
    `key_expr` is a SQL expression string (the probe needs column-typed
    shift amounts, which only the SQL form of shiftrightunsigned
    accepts). Hash spelling matches `_positions` exactly: xxhash64 of
    (key, INT literal i)."""
    arr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    tests = []
    for i in range(hashes):
        p = f"pmod(xxhash64({key_expr}, {i}), {bits})"
        tests.append(
            f"((shiftrightunsigned(element_at({arr}, "
            f"CAST({p} / 64 AS INT) + 1), CAST({p} % 64 AS INT)) & 1L) = 1L)"
        )
    return F.expr("(" + " AND ".join(tests) + ")")


def bloom_prefiltered_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    bits: int | None = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """fact LEFT SEMI JOIN dim, with a Bloom pre-filter dropping
    non-matching fact rows map-side before the join's exchange. The
    exact semi join removes Bloom false positives, so the result equals
    the plain semi join bit-for-bit. ``bits=None`` sizes the bitset to
    the dim-key count (derived_bloom_bits)."""
    words, bits = build_bloom_bits(dim_keys, dim_key, bits=bits, hashes=hashes)
    pre = fact.where(
        bloom_might_contain(fact_key, words, bits=bits, hashes=hashes)
    )
    return pre.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)), [fact_key], "left_semi"
    )
