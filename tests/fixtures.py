"""Shared small fixtures for the SLT corpus (our own data, in the spirit
of the reference's animals/movies fixtures — FIXTURES.md — but distinct).

Written as single parquet files so both the Engine (quoted-path tables)
and the DuckDB golden-filler read the exact same bytes.
"""

from __future__ import annotations

from pathlib import Path

PETS_ROWS = [
    ("rex", "dog", "brown", "M", 1),
    ("fido", "dog", "black", "M", 3),
    ("tom", "cat", "white", "M", 5),
    ("lucy", "cat", "black", "F", 2),
    ("polly", "bird", "green", "F", 4),
    ("iggy", "iguana", "green", "M", 6),
    ("nina", "cat", "brown", "F", 7),
]
PETS_SCHEMA = "name string, kind string, color string, sex string, age int"

FILMS1_ROWS = [
    ("inception", 9, 8, 2010),
    ("heat", 8, 7, 1995),
    ("alien", 9, 9, 1979),
    ("clueless", 6, 7, 1995),
    ("arrival", 8, 9, 2016),
    ("gravity", 7, 6, 2013),
]
FILMS1_SCHEMA = "title string, r1 int, r2 int, year int"

FILMS2_ROWS = [
    ("solaris", None, 1972),
    ("stalker", 9, 1979),
    ("mirror", None, 1975),
    ("ran", 10, 1985),
    ("ikiru", 9, 1952),
]
FILMS2_SCHEMA = "title string, score int, year int"


def build_fixtures(spark, data_dir: str | Path) -> str:
    """Write pets/films1/films2 parquet (one file each) into data_dir."""
    data_dir = Path(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    for name, rows, schema in [
        ("pets", PETS_ROWS, PETS_SCHEMA),
        ("films1", FILMS1_ROWS, FILMS1_SCHEMA),
        ("films2", FILMS2_ROWS, FILMS2_SCHEMA),
    ]:
        target = data_dir / f"{name}.parquet"
        if target.exists():
            continue
        tmp = data_dir / f"__{name}_dir"
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        part.rename(target)
        for leftover in tmp.glob("*"):
            leftover.unlink()
        tmp.rmdir()
    return str(data_dir)
