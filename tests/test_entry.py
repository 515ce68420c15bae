"""Driver-contract smoke + DuckDB oracle parity at sf0.001 (the driver
itself re-runs this comparison at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf001}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "ac_1" in df.columns and "doc_id" in df.columns


def test_every_query_has_callable_and_runs(spark, sf001):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for k, fn in qs.items():
        df = fn(spark, sf001)
        assert df.count() >= 0, k


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_parity_sf0001(spark, sf001, duck, name):
    sdf = entrymod.queries()[name](spark, sf001).toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(ddf), f"{name}: rowcount {len(sdf)} vs {len(ddf)}"
    a, b = canon(sdf), canon(ddf)
    assert list(a.columns) == list(b.columns), name
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = pd.to_numeric(a[c]).to_numpy(dtype=float)
            bv = pd.to_numeric(b[c]).to_numpy(dtype=float)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            eq = av == bv
        assert np.asarray(eq).all(), (name, c, np.nonzero(~np.asarray(eq))[0][:5])
