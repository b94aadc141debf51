#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
dumps, run each oracle_sql.json query in DuckDB over the same fixture dir,
and diff (schema, row count, column-sorted value hash). Dev tool only — the
shipped Scala library does not depend on this."""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for hashing: floats to 9dp repr, ints to int64
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols got={sorted(got.columns)} exp={sorted(exp.columns)}")
            fails += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}"); fails += 1; continue
        g, e = norm(got), norm(exp)
        if not g.equals(e):
            diff = (g != e) & ~(g.isna() & e.isna())
            bad_cols = [c for c in g.columns if diff[c].any()]
            idx = diff.any(axis=1)
            print(f"FAIL {name}: values differ in {bad_cols} "
                  f"({int(idx.sum())}/{len(g)} rows)")
            for c in bad_cols[:3]:
                i = diff[c].idxmax()
                print(f"  {c}[{i}]: got={g[c][i]!r} exp={e[c][i]!r}")
            fails += 1; continue
        print(f"PASS {name} ({len(got)} rows)")
    # queries with no oracle: rows-only check
    import os
    declared = set(oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in declared:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
            fails += 0 if n > 0 else 1
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
