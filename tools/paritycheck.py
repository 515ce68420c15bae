"""Driver-sim: run every queries() entry on Spark and its oracle_sql() on
DuckDB at a given SF dir, compare rowcount/columns/values. Usage:

    python tools/paritycheck.py [sf_dir] [query ...]
"""

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from tsf.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("paritycheck", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = entrymod.oracle_sql()
    fails = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            fails += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only {len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(ddf)}")
            fails += 1
            continue
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}")
            fails += 1
            continue
        bad = None
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = pd.to_numeric(a[c]).to_numpy(dtype=float)
                bv = pd.to_numeric(b[c]).to_numpy(dtype=float)
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            else:
                eq = av == bv
            if not np.asarray(eq).all():
                i = int(np.nonzero(~np.asarray(eq))[0][0])
                bad = (c, i, av[i] if i < len(av) else None,
                       bv[i] if i < len(bv) else None)
                break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]} duck={bad[3]}")
            fails += 1
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    spark.stop()
    return fails


if __name__ == "__main__":
    sys.exit(main())
