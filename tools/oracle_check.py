#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out [--lenient]
Compares each <out>/<name>/ parquet result with the oracle SQL run in DuckDB
over the same sf dir. Columns sorted by name, rows sorted before compare.

STRICT (default, mirrors the driver's hash gate): values keep their type —
int vs float are DISTINCT (Spark SUM(INT)=BIGINT vs DuckDB SUM(INT)=HUGEINT
->float64 is a FAILURE, exactly as the driver scores it), timestamps/dates/
strings are distinct classes, floats compared exactly (the catalog's
round(x+5e-9,4)-in-query convention exists precisely because the driver does
no rounding). Decimals map to float like the driver's pandas frame does.

--lenient restores the old coercing compare (int->float, round 4dp) for
triaging whether a strict failure is typing-only or a real value bug.
"""
import sys, json, math, glob, os, decimal, datetime
import duckdb

LENIENT = False

def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if LENIENT:
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 4)
        if isinstance(v, int):
            return float(v)
        try:
            return round(float(v), 4)
        except (TypeError, ValueError):
            return str(v)
    # strict: tag the type class so int/float/date/timestamp/str never collide
    if isinstance(v, float):
        return ("f", "NaN") if math.isnan(v) else ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        # the driver's pandas frame renders DECIMAL as float64
        return ("f", float(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat(sep=" "))
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v))
    return ("s", str(v))

def norm_cell(v):
    # numpy arrays/scalars from the pandas pathway -> python natives first
    if type(v).__module__.startswith("numpy"):
        v = v.tolist()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return norm(v)

def table_of(rel):
    # Fetch through pandas, NOT fetchall(): the driver's gate reads both
    # sides into pandas frames, where DuckDB HUGEINT (SUM over INT) lands
    # as float64 while a Spark BIGINT parquet column stays int64 — the
    # exact typing divergence the r11 driver flagged. fetchall() would
    # return HUGEINT as a python int and silently mask it.
    df = rel.df()
    cols = [c.lower() for c in df.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [df.iloc[:, i].tolist() for i in order]
    out = [tuple(norm_cell(col[r]) for col in data) for r in range(len(df))]
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out

def main():
    global LENIENT
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    LENIENT = "--lenient" in sys.argv
    sfdir, outdir = args[0], args[1]
    only = set(args[2].split(",")) if len(args) > 2 else None
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    if only:
        names = [n for n in names if n in only]
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
    mode = "lenient" if LENIENT else "strict"
    print(f"\n== [{mode}] {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
