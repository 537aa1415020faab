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
try:
    rows_only = json.load(open(f'{out}/rows_only.json'))
except FileNotFoundError:
    rows_only = {}

# Pre-flight: type every oracle with LIMIT 0 and refuse surprise output
# types. DuckDB widens sum(BIGINT) and `//` chains to HUGEINT (int128);
# pandas/the driver's hasher coerce HUGEINT to float64 while Spark writes
# int64 — identical values, different hashed representation, silent
# driver-gate hash_match failures (r05: q_pagerank/q_ppr/q_weighted_pagerank/
# q_hits). Fail HERE, locally, instead.
BAD_TYPES = ('HUGEINT', 'UHUGEINT', 'UBIGINT', 'UINTEGER', 'USMALLINT',
             'UTINYINT')
preflight_bad = {}
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f'SELECT * FROM ({sql}) __pf LIMIT 0')
        bad = [f'{c}:{t}' for c, t in zip(rel.columns, map(str, rel.types))
               if any(str(t).upper().startswith(b) for b in BAD_TYPES)]
        if bad: preflight_bad[name] = bad
    except Exception:
        pass  # SQL errors surface in the main loop with full context
if preflight_bad:
    print('PREFLIGHT TYPE FAILURES (HUGEINT/unsigned output columns — the')
    print('driver hasher coerces these to float64 and hash_match fails):')
    for k, v in sorted(preflight_bad.items()):
        print(f'  {k}: {v}')

results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f'{d}/*.parquet')], ignore_index=True)
    if name not in oracle:
        tag = 'by design' if name in rows_only else 'UNEXPLAINED'
        results[name] = (f'rows-only ({tag}): {len(spark_df)} rows '
                         + ('OK' if len(spark_df)>0 else 'EMPTY!'))
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
    # Dtype parity: the driver hashes the pandas representation, so an
    # int64-vs-float64 (HUGEINT-widened) column hash-fails even when every
    # value is equal. Compare dtypes after the datetime normalization.
    dt_bad = [f'{c}: spark={s[c].dtype} duck={dck[c].dtype}'
              for c in s.columns if str(s[c].dtype) != str(dck[c].dtype)]
    if dt_bad:
        results[name] = f'DTYPE MISMATCH: {dt_bad}'
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
    if name in preflight_bad and results[name] == 'MATCH':
        results[name] = f'TYPE FAIL (values match, hashed repr differs): {preflight_bad[name]}'

nmatch = sum(1 for v in results.values() if v == 'MATCH')
for k, v in results.items(): print(f'{k:26s} {v}')
print(f'\n{nmatch} exact matches / {len([k for k in results if k in oracle])} oracle queries / {len(results)} total')
