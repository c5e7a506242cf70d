#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB with views named after
the parquet tables in <sfDir>, and compares: row count, column names,
sorted-row values (exact for non-floats, tolerant then exact-after-round for
floats). Exit 1 on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out}/{name}"
        if not os.path.isdir(spark_dir):
            failures.append((name, "spark output missing")); print(f"MISS  {name}"); continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            failures.append((name, f"error: {e}")); print(f"ERR   {name}: {e}"); continue
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"cols {list(got.columns)} vs {list(exp.columns)}"))
            print(f"FAIL  {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
        if len(got) != len(exp):
            failures.append((name, f"rows {len(got)} vs {len(exp)}"))
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}"); continue
        ok = True
        for c in got.columns:
            g, e = got[c], exp[c]
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
                ga = g.astype(float).to_numpy(); ea = e.astype(float).to_numpy()
                same = (np.isnan(ga) & np.isnan(ea)) | (ga == ea)
                if not same.all():
                    bad = int((~same).sum())
                    i = int(np.argmax(~same))
                    failures.append((name, f"col {c}: {bad} float diffs e.g. {ga[i]} vs {ea[i]}"))
                    print(f"FAIL  {name}: col {c}: {bad} diffs e.g. {ga[i]!r} vs {ea[i]!r}")
                    ok = False
            else:
                gs = g.astype(str).to_numpy(); es = e.astype(str).to_numpy()
                if not (gs == es).all():
                    bad = int((gs != es).sum())
                    i = int(np.argmax(gs != es))
                    failures.append((name, f"col {c}: {bad} diffs e.g. {gs[i]} vs {es[i]}"))
                    print(f"FAIL  {name}: col {c} ({g.dtype} vs {e.dtype}): {bad} diffs e.g. {gs[i]!r} vs {es[i]!r}")
                    ok = False
        if ok:
            print(f"OK    {name} ({len(got)} rows)")
    # denominator = what was actually compared (a subset run must not claim
    # the full set matched)
    total = len([n for n in oracle if not only or n in only])
    print(f"\n{total - len(failures)}/{total} matched" +
          ("" if not only else f" (subset of {len(oracle)})"))
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
