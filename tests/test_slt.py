"""Run the SLT corpus through the Engine (reference test-strategy parity:
end-to-end golden files over the public API — SURVEY.md §5)."""

from __future__ import annotations

from pathlib import Path

import pytest

from fixtures import build_fixtures
from slt_runner import run_slt_file

from sql_engine_spark.engine import Engine

SLT_DIR = Path(__file__).parent / "slt"
SLT_FILES = sorted(SLT_DIR.glob("*.slt"))


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def slt_data(spark, tmp_path_factory):
    return build_fixtures(spark, tmp_path_factory.mktemp("slt_data"))


@pytest.mark.parametrize("slt_file", SLT_FILES, ids=[p.stem for p in SLT_FILES])
def test_slt(engine, slt_data, slt_file):
    run_slt_file(engine, slt_file, slt_data)
