"""End-to-end drive of the driver contract (the /verify recipe, surface 2):
runs entry() on sf0.001 and every queries() entry vs its oracle_sql() DuckDB
replay at sf0.01, comparing row counts AND values (columns sorted by name,
rows sorted by all columns, NaN==NULL) — the same semantics as the driver's
order-insensitive value hash.

Usage: python tools/drive_contract.py [query ...]   (no args = all)

A full (no-args) run also writes ``BENCH/CORRECTNESS_SELF.json`` in the
driver's row format — self-reported full-contract evidence covering the
queries the driver's ~50-row per-round cap leaves out (spot-checkable by
re-running this script with any subset of names).
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e  # noqa: E402
from tsf.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), na_position="last") \
             .reset_index(drop=True)


def eq(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if len(a) != len(b) or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            ok = (x == y) | (pd.isna(x) & pd.isna(y))
        else:
            ok = (x == y) | (pd.isna(x) & pd.isna(y))
        if not ok.all():
            return False
    return True


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("drive", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    n = e.entry(spark).count()
    print(f"entry rows: {n}")
    assert n > 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    qs, os_ = e.queries(), e.oracle_sql()
    bad = []
    rows_out: dict[str, dict] = {}
    import time as _time
    for k, fn in qs.items():
        if only and k not in only:
            continue
        t0 = _time.time()
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as ex:
            print(f"{k}: SPARK ERROR {ex}")
            bad.append(k)
            rows_out[k] = {"rows_match": None, "schema_match": None,
                           "hash_match": None, "spark_rows": None,
                           "oracle_rows": None, "err": f"spark: {ex}"}
            continue
        t_s = _time.time() - t0
        if k not in os_:
            print(f"{k}: rows={len(sdf)} (rows-only) [{t_s:.1f}s]")
            rows_out[k] = {"rows_match": None, "schema_match": None,
                           "hash_match": None, "spark_rows": len(sdf),
                           "oracle_rows": None, "err": "no_oracle"}
            continue
        t0 = _time.time()
        ddf = con.execute(os_[k]).fetchdf()
        t_d = _time.time() - t0
        a, b = canon(sdf), canon(ddf)
        ok = eq(a, b)
        print(f"{k}: rows={len(sdf)}/{len(ddf)} "
              f"{'MATCH' if ok else '*** MISMATCH ***'} "
              f"[spark {t_s:.1f}s, duckdb {t_d:.1f}s]")
        rows_out[k] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": list(a.columns) == list(b.columns),
            "hash_match": ok, "spark_rows": len(sdf),
            "oracle_rows": len(ddf), "err": None}
        if not ok:
            bad.append(k)
            # show first divergent cells for debugging
            if len(a) == len(b) and list(a.columns) == list(b.columns):
                for c in a.columns:
                    x, y = a[c].to_numpy(), b[c].to_numpy()
                    neq = ~((x == y) | (pd.isna(x) & pd.isna(y)))
                    if neq.any():
                        i = int(np.argmax(neq))
                        print(f"    col {c} row {i}: spark={x[i]!r} "
                              f"oracle={y[i]!r}")
            else:
                print(f"    cols spark={list(a.columns)}")
                print(f"    cols oracle={list(b.columns)}")
    print("FAILED:" if bad else "ALL GREEN", bad if bad else "")
    if not only:  # full sweep: persist driver-format self-evidence
        import json
        out = Path(__file__).resolve().parent.parent / "BENCH" \
            / "CORRECTNESS_SELF.json"
        out.write_text(json.dumps(rows_out, indent=1) + "\n")
        print(f"wrote {out} ({len(rows_out)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
