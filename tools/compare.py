#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>

Reads <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views
registered over <sfDir>/*.parquet, sorts columns by name, sorts rows,
and compares values exactly (hash-style).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable primitives
    def norm(v):
        if isinstance(v, (np.floating,)): return float(v)
        if isinstance(v, (np.integer,)): return int(v)
        if isinstance(v, (list, np.ndarray)): return tuple(norm(x) for x in v)
        if isinstance(v, dict): return tuple(sorted((k, norm(x)) for k, x in v.items()))
        if isinstance(v, pd.Timestamp): return v.isoformat()
        return v
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return pd.DataFrame(rows, columns=list(df.columns))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no output parquet"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"ROWS  {name}: {len(got)} rows ({status})"); n_rows_only += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}"); n_fail += 1; continue
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"FAIL  {name}: rows {len(gs)} != {len(es)}"); n_fail += 1; continue
        if gs.equals(es):
            # also check order-sensitive equality (stricter than driver)
            strict = g.reset_index(drop=True).equals(e.reset_index(drop=True))
            print(f"PASS  {name}: {len(gs)} rows" + ("" if strict else "  (order differs!)"))
            n_pass += 1
        else:
            neq = (gs != es) & ~(gs.isna() & es.isna())
            bad_cols = [c for c in gs.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"      {c}[{idx}]: got={gs[c][idx]!r} exp={es[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
