from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="session")
def spark():
    from data_platform_copilot_spark.session import get_spark
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    from data_platform_copilot_spark.queries import register_oracle_udfs

    con = duckdb.connect()
    register_oracle_udfs(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize_rows(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive, float-rounded row normalization (mirrors the
    driver's compare and tools/check_correctness.py)."""
    df = df[sorted(df.columns)].copy()
    rows = []
    for rec in df.itertuples(index=False):
        row = []
        for v in rec:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{round(v, 6):.6f}")
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)
