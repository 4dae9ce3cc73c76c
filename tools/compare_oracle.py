#!/usr/bin/env python3
# Replicates the driver correctness gate locally: run `sbt "runMain graft.Verify
# /root/testdata/sf0.01 /tmp/verify_out"` first, then `python3 tools/compare_oracle.py`
# (edit the path below if you used a different outDir). Compares every parquet dump
# against its DuckDB oracle SQL: sorted column names, row count, stringified values.
import duckdb, json, sys
import pandas as pd
sql = json.load(open('/tmp/verify_out/oracle_sql.json'))
D='/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    try: con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{D}/{t}.parquet')")
    except Exception: pass
fails=[]; ok=0
for name in sorted(sql):
    try:
        spark_df = pd.read_parquet(f'/tmp/verify_out/{name}')
    except Exception as e:
        fails.append((name, f'spark dump missing: {e}')); continue
    try:
        ora = con.execute(sql[name]).df()
    except Exception as e:
        fails.append((name, f'oracle error: {e}')); continue
    s = spark_df[sorted(spark_df.columns)]
    o = ora[sorted(ora.columns)]
    if list(s.columns) != list(o.columns):
        fails.append((name, f'schema: {list(s.columns)} vs {list(o.columns)}')); continue
    if len(s) != len(o):
        fails.append((name, f'rows: {len(s)} vs {len(o)}')); continue
    mismatch=None
    for c in s.columns:
        for i,(a,b) in enumerate(zip(s[c].tolist(), o[c].tolist())):
            if str(a)!=str(b):
                mismatch=f'col {c} row {i}: {a!r} vs {b!r}'; break
        if mismatch: break
    if mismatch: fails.append((name,mismatch))
    else: ok+=1
print(f'{ok} OK / {len(fails)} fail')
for n,m in fails: print(f'FAIL {n}: {m}')
