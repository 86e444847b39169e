"""Driver-contract smoke: __spark_entry__ must expose entry/queries/
oracle_sql exactly as the harness consumes them."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle key is a query, and every query is oracle-checked
    # (the fake multimodal decoder is md5-deterministic, so even the
    # decode pipeline is SQL-expressible — zero rows-only queries).
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    df = mod.entry(spark)
    assert df.schema.fields and df.count() > 0
