import duckdb, json, glob, os, sys
import pandas as pd
import numpy as np

import sys
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f'{d}/*.parquet')], ignore_index=True)
    if name not in oracle:
        results[name] = f'rows-only: {len(spark_df)} rows ' + ('OK' if len(spark_df)>0 else 'EMPTY!')
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f'ORACLE SQL ERROR: {e}'
        continue
    # normalize: sort columns by name, sort rows by all columns
    def norm(df):
        df = df[sorted(df.columns)]
        for c in df.columns:
            if str(df[c].dtype).startswith('datetime'):
                df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s, dck = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(dck.columns):
        results[name] = f'SCHEMA MISMATCH: spark={list(s.columns)} duck={list(dck.columns)}'
        continue
    if len(s) != len(dck):
        results[name] = f'ROWCOUNT MISMATCH: spark={len(s)} duck={len(dck)}'
        continue
    mismatch = []
    for c in s.columns:
        a, b = s[c].values, dck[c].values
        if np.issubdtype(s[c].dtype, np.floating):
            eq = np.all((a == b) | (pd.isna(a) & pd.isna(b)))
            if not eq:
                close = np.allclose(a.astype(float), b.astype(float), rtol=1e-12, equal_nan=True)
                mismatch.append(f'{c} (float exact={eq}, close={close})')
        else:
            eq = np.all((a == b) | (pd.isna(a) & pd.isna(b)))
            if not eq: mismatch.append(c)
    results[name] = 'MATCH' if not mismatch else f'VALUE MISMATCH: {mismatch}'

nmatch = sum(1 for v in results.values() if v == 'MATCH')
for k, v in results.items(): print(f'{k:26s} {v}')
print(f'\n{nmatch} exact matches / {len([k for k in results if k in oracle])} oracle queries / {len(results)} total')
