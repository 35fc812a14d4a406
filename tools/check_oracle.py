#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of the
engine): run Verify's parquet dumps against the DuckDB oracle SQL and
compare values exactly (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(p) for p in sorted(pq)]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = np.array_equal(a.astype('float64'), b.astype('float64'), equal_nan=True)
            else:
                eq = list(map(str, a)) == list(map(str, b))
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            n_bad += 1
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                if a.dtype.kind == 'f':
                    idx = np.where(~((a == b) | (pd.isna(a) & pd.isna(b))))[0][:3]
                else:
                    idx = [i for i in range(len(a)) if str(a[i]) != str(b[i])][:3]
                for i in idx:
                    print(f"   [{c}] row {i}: spark={a[i]!r} duck={b[i]!r}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
