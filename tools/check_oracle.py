#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the oracle_sql.json in DuckDB over the same sf dir, compare
row counts, column names, and values (columns sorted by name, rows sorted).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        else:
            def _s(v):
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    return None
                # array cells (ndarray/list) are unhashable for sort_values and
                # stringify differently per engine — canonicalize to a joined string
                if isinstance(v, (np.ndarray, list, tuple)):
                    return ",".join(str(x) for x in v)
                return str(v)
            df[c] = df[c].apply(_s)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        mine = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(mine)})"
            continue
        try:
            ref = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = normalize(mine), normalize(ref)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS_MISMATCH mine={list(a.columns)} ref={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH mine={len(a)} ref={len(b)}"
        else:
            eq = True
            for c in a.columns:
                av, bv = a[c], b[c]
                if pd.api.types.is_float_dtype(av):
                    ok = np.allclose(av.fillna(1e308), bv.fillna(1e308), rtol=0, atol=0)
                    if not ok:
                        # exact compare; report max diff
                        diff = np.nanmax(np.abs(av - bv))
                        results[name] = f"VALUE_MISMATCH col={c} maxdiff={diff}"
                        eq = False
                        break
                else:
                    if not av.equals(bv):
                        idx = (av != bv) & ~(av.isna() & bv.isna())
                        i = idx[idx].index[0] if idx.any() else None
                        results[name] = f"VALUE_MISMATCH col={c} first_at={i} mine={av[i] if i is not None else '?'} ref={bv[i] if i is not None else '?'}"
                        eq = False
                        break
            if eq:
                results[name] = f"OK({len(a)})"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL' if not v.startswith('ROWS_ONLY') else 'rows'}  {k}: {v}")
    print(f"\n{npass}/{len([r for r in results.values() if not r.startswith('ROWS_ONLY')])} oracle-checked pass, "
          f"{len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
