"""Driver-gate rehearsal: run every QUERIES entry and its DuckDB oracle
side-by-side (row count + column names + values), the same comparison shape
the per-round CORRECTNESS check performs."""

from __future__ import annotations

import decimal
import os

import duckdb
import numpy as np
import pytest

from apollo_spark.queries import ORACLES, QUERIES

# Default gate corpus is sf0.001 (fast dev loop); set SPARK_GRAFT_GATE_SF to
# /root/testdata/sf0.01 to rehearse under the exact driver conditions.
SF = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df):
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.dropna().apply(lambda v: isinstance(v, decimal.Decimal)).any():
            df[c] = s.astype(float)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    from apollo_spark.ops.cache import release_caches

    frame = QUERIES[name](spark, SF)
    sdf = frame.toPandas()
    release_caches(frame)  # drop op-scoped persists between the 165 runs
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = duck.sql(ORACLES[name]).df()
    assert list(sdf.columns) == list(ddf.columns), f"{list(sdf.columns)} vs {list(ddf.columns)}"
    assert len(sdf) == len(ddf), f"rows {len(sdf)} vs {len(ddf)}"
    a, b = _canon(sdf), _canon(ddf)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            assert np.allclose(a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True), f"{name}.{c}"
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), f"{name}.{c}"
