"""LIMIT-0 type-check of every oracle SQL statement against DuckDB.

Usage:
  sbt "runMain graft.tools.DumpOracles /tmp/oracle_dump"
  python3 dev/preflight_types.py /root/testdata/sf0.01 /tmp/oracle_dump

Refuses HUGEINT / unsigned output columns: DuckDB widens sum(BIGINT) and
`//` chains to int128, which pandas (and the driver's hasher) coerce to
float64 while Spark writes int64 — identical values, different hashed
representation, silent driver-gate hash_match failures. Exit code 1 on any
finding so this can gate commits.
"""
import duckdb, json, sys

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/oracle_dump'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
BAD = ('HUGEINT', 'UHUGEINT', 'UBIGINT', 'UINTEGER', 'USMALLINT', 'UTINYINT')
bad, errs = {}, {}
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f'SELECT * FROM ({sql}) __pf LIMIT 0')
        hits = [f'{c}:{t}' for c, t in zip(rel.columns, map(str, rel.types))
                if any(str(t).upper().startswith(b) for b in BAD)]
        if hits: bad[name] = hits
    except Exception as e:
        errs[name] = str(e).split('\n')[0][:200]

for k, v in sorted(bad.items()):
    print(f'TYPE FAIL  {k}: {v}')
for k, v in sorted(errs.items()):
    print(f'SQL ERROR  {k}: {v}')
print(f'\n{len(oracle)} oracles, {len(bad)} type failures, {len(errs)} sql errors')
sys.exit(1 if (bad or errs) else 0)
