#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate: run graft.Verify
first (writes <out>/<query>.parquet + oracle_sql.json), then this script
compares each query result against its DuckDB oracle.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut>
"""
import sys, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # round floats to tolerate engine summation-order noise
    for c in df.columns:
        if df[c].dtype == 'float64' or df[c].dtype == 'float32':
            df[c] = df[c].astype('float64').round(6)
        elif str(df[c].dtype).startswith('int') or str(df[c].dtype).startswith('uint'):
            df[c] = df[c].astype('int64')
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle_sql = json.load(open(f'{out}/oracle_sql.json'))
    import glob, os
    results = {}
    for name in sorted(oracle_sql):
        try:
            got = pq.read_table(f'{out}/{name}').to_pandas()
        except Exception as e:
            results[name] = f'NO-RESULT ({e})'
            continue
        try:
            want = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            results[name] = f'ORACLE-ERROR ({e})'
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            results[name] = f'SCHEMA-MISMATCH spark={list(g.columns)} oracle={list(w.columns)}'
        elif len(g) != len(w):
            results[name] = f'ROWS-MISMATCH spark={len(g)} oracle={len(w)}'
        else:
            eq = g.equals(w)
            if not eq:
                # find first differing cell for debugging
                diff = (g != w) & ~(g.isna() & w.isna())
                loc = diff.any(axis=1)
                idx = loc[loc].index[:3].tolist()
                detail = []
                for i in idx:
                    for c in g.columns:
                        if diff.loc[i, c]:
                            detail.append(f'row{i}.{c}: {g.loc[i,c]!r} vs {w.loc[i,c]!r}')
                results[name] = 'VALUES-MISMATCH ' + '; '.join(detail[:4])
            else:
                results[name] = f'OK ({len(g)} rows)'
    # queries without oracle: rows-only info
    for d in sorted(glob.glob(f'{out}/q*')):
        name = os.path.basename(d)
        if name not in oracle_sql and not name.endswith('.json'):
            try:
                n = pq.read_table(d).num_rows
                results[name] = f'ROWS-ONLY ({n} rows)'
            except Exception as e:
                results[name] = f'NO-RESULT ({e})'
    ok = sum(1 for v in results.values() if v.startswith('OK'))
    for k, v in sorted(results.items()):
        mark = '+' if v.startswith(('OK', 'ROWS-ONLY')) else '!'
        print(f'{mark} {k}: {v}')
    print(f'\n{ok}/{len(oracle_sql)} oracle-checked queries OK')

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
