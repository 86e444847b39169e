#!/usr/bin/env python
"""Self-generated scale-factor datasets for the sf1 scale-stress seal
(r9 verdict #1: the 100-TB design claims were argued from plan shape but
never measured past sf0.1).

The driver's generator is not available (and /root/testdata is
read-only), and DuckDB's tpch extension needs network, so this
regenerates the SAME ten-table layout from the measured sf0.1
distributions (schemas, key ranges, FK structure, value marginals,
planted near/exact duplicate rates, 30-day event window, L2-normalized
label-clustered embeddings). Deterministic: numpy PCG64 seed 42.
Everything correctness-critical is checked downstream anyway — the
DuckDB oracle gate runs on ANY sf dir, including these.

Scale anchors at sf=1 (10x the sf0.1 row counts; region/nation fixed):
customer 150k, supplier 10k, part 200k, orders 1.5M, lineitem ~6M,
events 1M (same 30-day window, 10x users), documents 50k,
embeddings 20k.

Usage: python scripts/gen_sf.py SF OUT_DIR   (e.g. 1 testdata_local/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.1"
REF_SF = 0.1

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
PADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "spry"]
PNOUN = ["ring", "bolt", "nut", "cog", "gear", "pin", "rod", "cap"]

US = np.int64(1_000_000)  # microseconds per second


def _ts_us(iso: str) -> np.int64:
    import datetime as dt

    d = dt.datetime.fromisoformat(iso)
    return np.int64(int(d.timestamp() * 1_000_000))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _tscol(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def generate(sf: float, out_dir: str) -> None:
    mult = sf / REF_SF
    rng = np.random.Generator(np.random.PCG64(42))
    os.makedirs(out_dir, exist_ok=True)

    # region / nation: fixed small dims — copy verbatim from sf0.1.
    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(REF_DIR, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
        print(f"  {t}: copied from sf0.1")

    n_cust = int(150_000 * mult / 10)
    n_supp = int(10_000 * mult / 10)
    n_part = int(200_000 * mult / 10)
    n_ord = int(1_500_000 * mult / 10)
    n_ev = int(1_000_000 * mult / 10)
    n_doc = int(50_000 * mult / 10)
    n_emb = int(20_000 * mult / 10)

    # customer
    ck = np.arange(n_cust, dtype=np.int64)
    _write(out_dir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{k:09d}" for k in ck]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.take(SEGMENTS, rng.integers(0, 5, n_cust))
        ),
    }))

    # supplier
    sk = np.arange(n_supp, dtype=np.int64)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{k:09d}" for k in sk]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part
    pk = np.arange(n_part, dtype=np.int64)
    adj = rng.integers(0, len(PADJ), n_part)
    noun = rng.integers(0, len(PNOUN), n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array(
            [f"{PADJ[a]} {PNOUN[b]}" for a, b in zip(adj, noun)]
        ),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]
        ),
        "p_type": pa.array(np.take(PTYPES, rng.integers(0, 6, n_part))),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": 900.0 + ((pk * 7) % 1000) / 10.0,
    }))

    # orders: midnight timestamps in [1995-01-01, 2001-08-01]
    ok = np.arange(n_ord, dtype=np.int64)
    d0, d1 = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    days_span = int((d1 - d0) // (86_400 * US))
    o_days = rng.integers(0, days_span + 1, n_ord).astype(np.int64)
    o_date = d0 + o_days * 86_400 * US
    _write(out_dir, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": pa.array(
            np.take(["O", "P", "F"], rng.integers(0, 3, n_ord))
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _tscol(o_date),
        "o_orderpriority": pa.array(
            np.take(PRIORITIES, rng.integers(0, 5, n_ord))
        ),
    }))

    # lineitem: Poisson(4) lines per order (zero allowed, like sf0.1),
    # linenumber cycling 1..7, shipdate = orderdate + U{1..95} days.
    lines = rng.poisson(4.0, n_ord)
    l_ok = np.repeat(ok, lines)
    n_li = len(l_ok)
    within = np.concatenate([np.arange(c) for c in lines]) if n_li else np.array([], dtype=np.int64)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    unit = np.round(rng.uniform(900, 2100, n_li), 2)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": (within % 7 + 1).astype(np.int32),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(
            np.take(["A", "N", "R"], rng.integers(0, 3, n_li))
        ),
        "l_linestatus": pa.array(
            np.take(["O", "F"], rng.integers(0, 2, n_li))
        ),
        "l_shipdate": _tscol(
            np.repeat(o_date, lines)
            + rng.integers(1, 96, n_li).astype(np.int64) * 86_400 * US
        ),
    }))

    # events: FIXED 30-day window (calendar-bounded grids stay bounded at
    # every sf — same convention as the driver data), 10x users at 10x sf.
    n_users = int(15_000 * mult / 10)
    e0, e1 = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    ets = np.sort(rng.integers(e0, e1, n_ev).astype(np.int64))
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _tscol(ets),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": pa.array(np.take(ETYPES, rng.integers(0, 5, n_ev))),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(
            [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    # documents: 30-word vocab salad, 10..100 words; ~5% near-dups (an
    # earlier doc's text + " dup"), ~0.16% exact dups — the sf0.1 rates.
    texts: list[str] = []
    n_words = rng.integers(10, 101, n_doc)
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.05:
            src = int(rng.integers(0, i))
            texts.append(texts[src] + " dup")
        elif i > 10 and r < 0.0516:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            toks = np.take(VOCAB, rng.integers(0, len(VOCAB), n_words[i]))
            texts.append(" ".join(toks))
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(np.take(LANGS, rng.choice(5, n_doc, p=LANG_W))),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 64-dim L2-normalized, clustered by label (centroid 0.6
    # + noise 0.4 before normalization) so IVF/LSH/kNN structure is real.
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    cents = rng.normal(0, 1, (10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = 0.6 * cents[labels] + 0.4 * rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs32 = vecs.astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            [v for v in vecs32.tolist()], type=pa.list_(pa.float32())
        ),
        "label": labels,
    }))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    print(f"generating sf={sf} into {out_dir}")
    generate(sf, out_dir)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
