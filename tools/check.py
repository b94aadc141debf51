#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
dumps, run each oracle_sql.json query in DuckDB over the same fixture dir,
and diff (schema, row count, column-sorted value hash). Dev tool only — the
shipped Scala library does not depend on this.

Scale mode (VERDICT r10 item 1): the full 463-query registry at sf1 is
bound by single-threaded DuckDB oracle time, so the compare now shards
across worker processes (--jobs) with per-connection PRAGMA threads
(--threads) and records per-query wall time; --json dumps the full result
table for the SCALE_r11 evidence file."""
import sys, json, glob, os, time, argparse
import duckdb
import pandas as pd
from concurrent.futures import ProcessPoolExecutor

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def float_decs(dfs) -> dict:
    """One quantization granularity per float column, derived from the
    max |value| across ALL frames being compared (12 significant digits,
    capped at 9 decimal places). Per-value magnitudes made the compare
    flaky when the two engines straddled a power of 10 (0.99...95 vs
    1.00...05 quantized at different decimal granularities); a shared
    per-column magnitude cannot disagree between the sides."""
    import numpy as np
    decs = {}
    for df in dfs:
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                x = df[c].to_numpy(dtype="float64")
                finite = np.abs(x[np.isfinite(x)])
                m = float(finite.max()) if finite.size else 0.0
                decs[c] = max(decs.get(c, 0.0), m)
    return {c: float(np.clip(11 - np.floor(np.log10(max(m, 1e-300))),
                             0, 9)) for c, m in decs.items()}

def norm(df: pd.DataFrame, decs: dict) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for hashing: floats quantize at the SHARED
    # per-column granularity from float_decs (a fixed 9-decimal-place
    # round demands absolute precision a double cannot carry at 1e9+
    # magnitudes — sf1 sums hit one-ulp order noise at the 16th digit);
    # ints to int64
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            import numpy as np
            x = s.to_numpy(dtype="float64")
            scale = 10.0 ** decs.get(c, 9.0)
            out[c] = pd.Series(np.round(x * scale) / scale,
                               index=s.index)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns), kind="mergesort").reset_index(drop=True)

_CON = None
_SF = None

def _init(sf_dir: str, threads: int, mem: str = ""):
    global _CON, _SF
    _SF = sf_dir
    _CON = duckdb.connect()
    _CON.sql(f"PRAGMA threads={threads}")
    if mem:
        # bound each worker so a parallel compare cannot OOM-kill the
        # pool (DuckDB spills to temp instead)
        _CON.sql(f"PRAGMA memory_limit='{mem}'")
        _CON.sql(f"PRAGMA temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        _CON.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def _spill_gb() -> float:
    d = f"/tmp/duckdb_spill_{os.getpid()}"
    if not os.path.isdir(d):
        return 0.0
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total / 1e9

def _check_one(task):
    """Returns {name, ok, msg, oracle_sec, total_sec, rows}."""
    name, sql, out_dir = task
    t0 = time.time()
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return {"name": name, "ok": False, "msg": "no spark output",
                "oracle_sec": 0.0, "total_sec": time.time() - t0, "rows": 0}
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        t1 = time.time()
        # delta, not cumulative: a pooled worker's spill dir carries
        # leftovers from earlier queries, so snapshot before and charge
        # only this query's growth (best-effort — spill DuckDB deletes
        # before the query returns is invisible to both snapshots)
        spill0 = _spill_gb()
        exp = _CON.sql(sql).df()
        oracle_sec = time.time() - t1
        spill_gb = max(0.0, _spill_gb() - spill0)
    except Exception as e:
        return {"name": name, "ok": False, "msg": str(e)[:500],
                "oracle_sec": 0.0, "total_sec": time.time() - t0, "rows": 0}
    res = {"name": name, "oracle_sec": round(oracle_sec, 3),
           "spill_gb": round(spill_gb, 2), "rows": int(len(got))}
    if sorted(got.columns) != sorted(exp.columns):
        res.update(ok=False, msg=f"cols got={sorted(got.columns)} "
                                 f"exp={sorted(exp.columns)}")
    elif len(got) != len(exp):
        res.update(ok=False, msg=f"rows got={len(got)} exp={len(exp)}")
    else:
        decs = float_decs([got, exp])
        g, e = norm(got, decs), norm(exp, decs)
        if not g.equals(e):
            diff = (g != e) & ~(g.isna() & e.isna())
            bad_cols = [c for c in g.columns if diff[c].any()]
            idx = diff.any(axis=1)
            detail = []
            for c in bad_cols[:3]:
                i = diff[c].idxmax()
                detail.append(f"{c}[{i}]: got={g[c][i]!r} exp={e[c][i]!r}")
            res.update(ok=False,
                       msg=f"values differ in {bad_cols} "
                           f"({int(idx.sum())}/{len(g)} rows); "
                           + "; ".join(detail))
        else:
            res.update(ok=True, msg="")
    res["total_sec"] = round(time.time() - t0, 3)
    return res

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("out_dir", nargs="?", default="/tmp/verify_out")
    ap.add_argument("--jobs", type=int, default=1,
                    help="worker processes for the oracle compare")
    ap.add_argument("--threads", type=int, default=1,
                    help="PRAGMA threads per DuckDB connection")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to check")
    ap.add_argument("--exclude", default=None,
                    help="comma-separated query names to skip (e.g. the "
                         "documented all-pairs oracle forms at sf1)")
    ap.add_argument("--json", default=None,
                    help="write the full result table to this path")
    ap.add_argument("--mem", default="",
                    help="DuckDB memory_limit per worker (e.g. 10GB)")
    ap.add_argument("--max-oracle-sec", type=float, default=120.0,
                    help="per-query oracle wall ceiling — an oracle-side "
                         "quadratic regression should fail LOUDLY, not by "
                         "OOM or judge patience; 0 disables")
    ap.add_argument("--max-spill-gb", type=float, default=30.0,
                    help="per-query DuckDB spill-dir ceiling in GB, "
                         "measured as the spill-dir GROWTH across the "
                         "query (best-effort: spill deleted mid-query "
                         "is under-counted; only observable when --mem "
                         "sets a spill dir); 0 disables")
    ap.add_argument("--budget-exempt", default=None,
                    help="comma-separated query names allowed to exceed "
                         "the oracle budget (the documented all-pairs "
                         "oracle forms)")
    a = ap.parse_args()

    oracle = json.load(open(f"{a.out_dir}/oracle_sql.json"))
    if a.only:
        keep = set(a.only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    if a.exclude:
        drop = set(a.exclude.split(","))
        oracle = {k: v for k, v in oracle.items() if k not in drop}
    tasks = [(n, s, a.out_dir) for n, s in sorted(oracle.items())]
    t0 = time.time()
    if a.jobs <= 1:
        _init(a.sf_dir, a.threads, a.mem)
        results = [_check_one(t) for t in tasks]
    else:
        with ProcessPoolExecutor(max_workers=a.jobs, initializer=_init,
                                 initargs=(a.sf_dir, a.threads, a.mem)) as pool:
            results = list(pool.map(_check_one, tasks, chunksize=1))
    fails = 0
    exempt = set((a.budget_exempt or "").split(",")) - {""}
    for r in sorted(results, key=lambda r: r["name"]):
        # oracle budget: a correct-but-runaway oracle is an evidence bug
        # (60 GB / 300 s DuckDB wedges nearly OOM-killed the r11 skew
        # run) — flag it as loudly as a value mismatch
        over = []
        if a.max_oracle_sec and r["oracle_sec"] > a.max_oracle_sec:
            over.append(f"oracle {r['oracle_sec']:.1f}s > "
                        f"{a.max_oracle_sec:.0f}s ceiling")
        if a.max_spill_gb and r.get("spill_gb", 0) > a.max_spill_gb:
            over.append(f"spill {r['spill_gb']:.1f}GB > "
                        f"{a.max_spill_gb:.0f}GB ceiling")
        if over and r["name"] in exempt:
            print(f"PASS {r['name']} (BUDGET-EXEMPT: {'; '.join(over)})"
                  if r["ok"] else f"FAIL {r['name']}: {r['msg']}")
            fails += 0 if r["ok"] else 1
            continue
        if over:
            r["budget_exceeded"] = True
            print(f"BUDGET {r['name']}: {'; '.join(over)}"
                  + ("" if r["ok"] else f"; AND FAIL: {r['msg']}"))
            fails += 1
        elif r["ok"]:
            print(f"PASS {r['name']} ({r['rows']} rows, "
                  f"{r['oracle_sec']:.1f}s oracle)")
        else:
            print(f"FAIL {r['name']}: {r['msg']}")
            fails += 1
    # queries with no oracle: rows-only check
    declared = set(oracle)
    rows_only = []
    if not a.only:
        for d in sorted(glob.glob(f"{a.out_dir}/*/")):
            name = os.path.basename(d.rstrip("/"))
            if name not in declared:
                files = glob.glob(f"{d}/*.parquet")
                n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
                print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
                rows_only.append({"name": name, "ok": n > 0, "rows": n})
                fails += 0 if n > 0 else 1
    wall = round(time.time() - t0, 1)
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
          f"({len(results)} compared, wall {wall}s, "
          f"jobs={a.jobs} threads={a.threads})")
    if a.json:
        json.dump({"sf_dir": a.sf_dir, "jobs": a.jobs,
                   "threads": a.threads, "wall_sec": wall,
                   "n_compared": len(results), "n_failures": fails,
                   "results": sorted(results, key=lambda r: r["name"]),
                   "rows_only": rows_only},
                  open(a.json, "w"), indent=1)
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main())
