#!/usr/bin/env python3
"""Self-check harness: compare Verify output parquet against DuckDB oracle.

Mirrors the driver's correctness gate: for each query in oracle_sql.json,
run the SQL in DuckDB over the same sf dir's parquet tables, sort columns
by name and rows by value, and compare. Queries without oracle SQL get a
rows-only check (>0 rows).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted([os.path.basename(p) for p in glob.glob(out_dir + "/*")
                    if os.path.isdir(p)])
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" if len(got) > 0 else "EMPTY"
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g)} duck={len(w)}"
        else:
            eq = g.equals(w)
            if not eq:
                diff = (g != w) & ~(g.isna() & w.isna())
                ndiff = int(diff.any(axis=1).sum())
                bad_cols = [c for c in g.columns if diff[c].any()]
                # show one example
                i = diff.any(axis=1).idxmax()
                results[name] = (f"VALUE-MISMATCH {ndiff} rows, cols={bad_cols}, "
                                 f"e.g. row {i}: spark={g.loc[i].to_dict()} duck={w.loc[i].to_dict()}")
            else:
                results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for k in sorted(results):
        flag = "PASS" if (results[k] == "OK" or results[k].startswith("rows-only")) else "FAIL"
        print(f"{flag:4} {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    # queries declared but not dumped
    missing = set(oracle) - set(names)
    if missing:
        print("declared-but-missing:", sorted(missing))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
