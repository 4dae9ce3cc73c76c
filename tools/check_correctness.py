#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each query's parquet
dump (written by `sbt "runMain graft.Verify <sfDir> <outDir>"`), run the
corresponding oracle SQL in DuckDB over views of the same parquet tables,
and compare row count, column set, and values (columns sorted by name).

Usage: python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for value comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                             ignore_index=True) if glob.glob(f"{d}/*.parquet") else None
        if spark_df is None:
            results[name] = "NO_OUTPUT"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {str(e)[:200]}"
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if sorted(a.columns) != sorted(b.columns):
            results[name] = f"COLS_MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                          rtol=1e-9, atol=1e-9)
            results[name] = "MATCH"
        except AssertionError as e:
            results[name] = "VALUES_MISMATCH: " + str(e).split("\n")[0][:160]
    n_match = sum(1 for v in results.values() if v == "MATCH")
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "OK " if v == "MATCH" or v.startswith("ROWS_ONLY") else "FAIL"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_match} matched, {n_rows_only} rows-only, "
          f"{len(results) - n_match - n_rows_only} failed, {len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
