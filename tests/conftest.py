"""Shared fixtures: one SparkSession per test run + the DuckDB oracle.

The oracle comparison mirrors the driver harness: run the Spark query
and the DuckDB SQL over the same parquet tables, then compare
row-count, schema (column names), and order-insensitive values.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from cdc_pipe_line_spark import get_spark

    s = get_spark(app_name="cdc-pipe-line-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.astype("string")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str, *, rtol: float = 0.0):
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"rowcount mismatch: spark={len(got)} oracle={len(want)}"
    if rtol:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=rtol)
    else:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
