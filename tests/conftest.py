from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line("markers", "streaming: streaming behavior tests")
    config.addinivalue_line(
        "markers",
        "realcodec: real (non-fake) image/audio decode kernels — run "
        "everywhere via the stdlib BMP/WAV fallbacks; where Pillow/"
        "soundfile are installed the same tests exercise those libraries "
        "instead (identical kernels by construction)",
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
