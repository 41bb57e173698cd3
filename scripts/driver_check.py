"""Mimic the driver: run queries() vs oracle_sql() side-by-side and compare.

Usage (from the repo root): python scripts/driver_check.py [SF_DIR]
Compares row counts, column names and value hashes like the round driver
does (columns sorted by name, rows sorted, 6-decimal floats).
"""
import hashlib
import sys

from pathlib import Path

import duckdb
import pandas as pd
import ray

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")

import __ray_entry__ as m

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def vhash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        pd.util.hash_pandas_object(canon(df), index=False).values.tobytes()
    ).hexdigest()[:12]


con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    except Exception as e:
        print(f"view {t}: {e}")

qs = m.queries()
sqls = m.oracle_sql()
fails = []
for name, fn in qs.items():
    try:
        got = canon(to_pandas(fn(SF)))
    except Exception as e:
        print(f"{name}: RAY FAIL {type(e).__name__}: {e}")
        fails.append(name)
        continue
    if name not in sqls:
        print(f"{name}: rows-only, {len(got)} rows, cols={list(got.columns)}")
        continue
    try:
        want = canon(con.execute(sqls[name]).df())
    except Exception as e:
        print(f"{name}: SQL FAIL {type(e).__name__}: {e}")
        fails.append(name)
        continue
    rows_ok = len(got) == len(want)
    cols_ok = list(got.columns) == list(want.columns)
    h_ok = False
    if rows_ok and cols_ok:
        try:
            want2 = want.astype(got.dtypes.to_dict())
            h_ok = vhash(got) == vhash(want2)
        except Exception as e:
            print(f"{name}: cast fail {e}")
    status = "OK" if (rows_ok and cols_ok and h_ok) else "MISMATCH"
    if status != "OK":
        fails.append(name)
        print(f"{name}: {status} rows {len(got)}/{len(want)} cols {list(got.columns)} vs {list(want.columns)}")
        if rows_ok and cols_ok:
            g, w = canon(got), canon(want.astype(got.dtypes.to_dict()))
            neq = (g != w).any(axis=1)
            print(g[neq].head(3))
            print(w[neq].head(3))
    else:
        print(f"{name}: OK ({len(got)} rows)")

print("FAILS:", fails or "none")
ray.shutdown()
