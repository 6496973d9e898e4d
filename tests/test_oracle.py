"""Driver-gate rehearsal: run every queries() entry at sf0.01 and compare
against its oracle_sql() via DuckDB — row count, schema width, and
order-insensitive exact values (the driver's value-hash, reproduced here)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(result):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda x: tuple(np.asarray(x).tolist()))
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(bytes)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _compare(name, got: pd.DataFrame, want: pd.DataFrame):
    assert list(sorted(got.columns)) == list(sorted(want.columns)), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            np.testing.assert_array_equal(gv.astype(np.float64), wv.astype(np.float64), err_msg=f"{name}.{c}")
        else:
            eq = gv == wv
            assert np.asarray(eq).all(), f"{name}.{c}: first diff at {np.argmin(eq)}: {gv[np.argmin(eq)]} != {wv[np.argmin(eq)]}"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _entry_module():
    import importlib

    return importlib.import_module("__ray_entry__")


ALL = None


def _query_names():
    m = _entry_module()
    return sorted(m.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_against_oracle(ray_session, oracle_con, name):
    m = _entry_module()
    fn = m.queries()[name]
    got = _to_pandas(fn(SF))
    assert got is not None and len(got.columns) > 0
    sql = m.oracle_sql().get(name)
    if sql is None:
        assert len(got) >= 0  # rows-only check, like the driver
        return
    want = oracle_con.execute(sql).df()
    _compare(name, got, want)


def test_entry_smoke(ray_session):
    m = _entry_module()
    out = _to_pandas(m.entry())
    assert len(out) > 0
    assert set(out.columns) == {"doc_id", "tokens", "n_tok", "source"}
