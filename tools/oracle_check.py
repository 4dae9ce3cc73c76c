#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
Compares each <out>/<name>/ parquet result with the oracle SQL run in DuckDB
over the same sf dir. Columns sorted by name, rows sorted, values normalized
(floats rounded, decimals -> float) before compare.
"""
import sys, json, math, glob, os
import duckdb

def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if isinstance(v, int):
        return float(v)
    # decimals, dates, timestamps -> str
    try:
        f = float(v)
        return round(f, 4)
    except (TypeError, ValueError):
        return str(v)

def norm_cell(v):
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return norm(v)

def table_of(rel):
    cols = [c.lower() for c in rel.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY   {name} (no parquet written)")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = table_of(spark_rel)
        if name not in oracle:
            print(f"SKIP    {name} rows={len(srows)} (no oracle; rows-only check: {'OK' if len(srows)>0 else 'ZERO ROWS'})")
            n_skip += 1
            continue
        try:
            ocols, orows = table_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"ORAERR  {name}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"SCHEMA  {name}: spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"ROWS    {name}: spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if srows != orows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"VALUES  {name}: {len(diffs)}/{len(srows)} rows differ; first: spark={srows[diffs[0]]} oracle={orows[diffs[0]]}")
            n_fail += 1
            continue
        n_pass += 1
        print(f"PASS    {name} rows={len(srows)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
