#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tooling only,
not part of the shipped Scala library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/ and each entry
in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with views over
<sfDir>/*.parquet, then compare row count, sorted-column-name schema, and
a value hash over rows sorted by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib
from decimal import Decimal

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None or v != v:  # None / NaN
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, Decimal):
        return str(v.normalize())
    return str(v)

def frame_hash(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = ["\x01".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode()); h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"; continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"; continue
        gcols, ecols = sorted(map(str.lower, got.columns)), sorted(map(str.lower, exp.columns))
        if gcols != ecols:
            results[name] = f"SCHEMA got={gcols} exp={ecols}"; continue
        got.columns = [c.lower() for c in got.columns]
        exp.columns = [c.lower() for c in exp.columns]
        gh, eh = frame_hash(got), frame_hash(exp)
        results[name] = "MATCH" if gh == eh else "HASH_MISMATCH"
        if gh != eh:
            # show first differing rows for debugging
            g = got.reindex(sorted(got.columns), axis=1).astype(str).sort_values(by=sorted(got.columns)).reset_index(drop=True)
            e = exp.reindex(sorted(exp.columns), axis=1).astype(str).sort_values(by=sorted(exp.columns)).reset_index(drop=True)
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  [{name}] row {i}\n    got={g.iloc[i].to_dict()}\n    exp={e.iloc[i].to_dict()}")
    ok = sum(1 for v in results.values() if v == "MATCH")
    for k, v in results.items():
        print(f"{'PASS' if v=='MATCH' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {ok}/{len([r for r in results.values() if not r.startswith('ROWS_ONLY')])} oracle-gated matched")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
