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

def connect(sf_dir: str):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

BAD_TYPES = ("HUGEINT", "UHUGEINT")

def lint(sf_dir: str, oracle_path: str) -> int:
    """Registry-wide final-projection dtype lint: DESCRIBE each oracle and
    fail on HUGEINT/UHUGEINT output columns (DuckDB promotes integer SUM to
    INT128, which the driver's dtype-sensitive hash can never match against
    Spark's BIGINT — the repo convention is CAST(SUM(...) AS BIGINT)).
    DESCRIBE does not execute the query, so this is cheap and exact.
    Usage: python3 tools/check_oracle.py --lint <sfDir> <oracle_sql.json>"""
    con = connect(sf_dir)
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}"); n_bad += 1; continue
        bad = [(c, t) for c, t, *_ in desc
               if any(b in str(t).upper() for b in BAD_TYPES)]
        if bad:
            n_bad += 1
            print(f"FAIL {name}: uncast wide-integer output {bad}"
                  " — wrap in CAST(... AS BIGINT)")
    print(f"== lint: {len(oracle)} oracles, {n_bad} with HUGEINT outputs")
    return 1 if n_bad else 0

def main(sf_dir: str, out_dir: str) -> int:
    con = connect(sf_dir)
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
            rel = con.sql(sql)
            duck_types = dict(zip(rel.columns, map(str, rel.types)))
            want = canon(rel.df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        wide = [(c, t) for c, t in duck_types.items()
                if any(b in t.upper() for b in BAD_TYPES)]
        if wide:
            print(f"FAIL {name}: oracle output has wide-integer {wide}"
                  " — driver hash cannot match; CAST(... AS BIGINT)")
            n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        # Driver parity: its hash canonicalization is dtype-sensitive (a
        # DuckDB HUGEINT/DECIMAL lands as float64/object in pandas and
        # hashes differently from Spark's int64 even when every value is
        # equal), so a dtype-kind mismatch must FAIL here too.
        norm = lambda k: 'i' if k in 'iu' else k
        bad_cols = []
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if norm(a.dtype.kind) != norm(b.dtype.kind):
                print(f"   [{c}] dtype spark={a.dtype} duck={b.dtype}"
                      f" (duck logical type: {duck_types.get(c, '?')})"
                      " — driver hash would mismatch; CAST the oracle")
                bad_cols.append(c); continue
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

USAGE = ("usage: check_oracle.py <sfDir> <verifyOutDir> [onlyQ1,Q2,...]\n"
         "       check_oracle.py --lint <sfDir> <oracle_sql.json>")

if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(USAGE, file=sys.stderr); sys.exit(2)
    if sys.argv[1] == "--lint":
        if len(sys.argv) < 4:
            print(USAGE, file=sys.stderr); sys.exit(2)
        sys.exit(lint(sys.argv[2], sys.argv[3]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
