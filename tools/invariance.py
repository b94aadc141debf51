#!/usr/bin/env python3
"""Partition-invariance compare: diff two graft.Verify dumps produced from
the SAME fixture under DIFFERENT execution shapes (shuffle partition
count, AQE on/off, input-split size). A 1000-executor cluster is exactly
"a different partition count", so any query whose values move with the
execution shape is a real distributed-correctness bug (partition-order-
dependent float sums, non-total terminal sorts under limit, id-assignment
leaks), not a style nit.

Reuses check.py's normalization (column-name sort, shared-magnitude float
quantization, total row sort) so "equal" here means exactly what the
driver's DuckDB gate means by it. Dev tool only.

Usage: invariance.py BASELINE_DIR VARIANT_DIR [--json out.json]
"""
import sys, json, glob, os, time, argparse
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import float_decs, norm


def load(out_dir: str, name: str):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_dir")
    ap.add_argument("var_dir")
    ap.add_argument("--json", default=None)
    a = ap.parse_args()

    for d in (a.base_dir, a.var_dir):
        f = f"{d}/failures.json"
        fails = json.load(open(f)) if os.path.exists(f) else {}
        if fails:
            print(f"FAIL {d} has Verify-side failures: {sorted(fails)}")
            return 1

    names = sorted(os.path.basename(p.rstrip("/"))
                   for p in glob.glob(f"{a.base_dir}/*/"))
    var_names = {os.path.basename(p.rstrip("/"))
                 for p in glob.glob(f"{a.var_dir}/*/")}
    if set(names) != var_names:
        print(f"FAIL dump sets differ: only-base="
              f"{sorted(set(names) - var_names)} "
              f"only-variant={sorted(var_names - set(names))}")
        return 1

    t0, bad, results = time.time(), 0, []
    for name in names:
        got_b, got_v = load(a.base_dir, name), load(a.var_dir, name)
        r = {"name": name, "rows": int(len(got_b))}
        if sorted(got_b.columns) != sorted(got_v.columns):
            r.update(ok=False, msg=f"cols base={sorted(got_b.columns)} "
                                   f"variant={sorted(got_v.columns)}")
        elif len(got_b) != len(got_v):
            r.update(ok=False,
                     msg=f"rows base={len(got_b)} variant={len(got_v)}")
        else:
            decs = float_decs([got_b, got_v])
            nb, nv = norm(got_b, decs), norm(got_v, decs)
            if nb.equals(nv):
                r.update(ok=True, msg="")
            else:
                diff = (nb != nv) & ~(nb.isna() & nv.isna())
                bad_cols = [c for c in nb.columns if diff[c].any()]
                i = diff.any(axis=1).idxmax()
                c = bad_cols[0]
                r.update(ok=False,
                         msg=f"values differ in {bad_cols} "
                             f"({int(diff.any(axis=1).sum())}/{len(nb)} "
                             f"rows); {c}[{i}]: base={nb[c][i]!r} "
                             f"variant={nv[c][i]!r}")
        results.append(r)
        if not r["ok"]:
            bad += 1
            print(f"DIFF {name}: {r['msg']}")
    wall = round(time.time() - t0, 1)
    print(f"\n{'INVARIANT' if bad == 0 else f'{bad} DIVERGENT'} "
          f"({len(names)} queries, wall {wall}s)")
    if a.json:
        json.dump({"base": a.base_dir, "variant": a.var_dir,
                   "n_queries": len(names), "n_divergent": bad,
                   "wall_sec": wall, "results": results},
                  open(a.json, "w"), indent=1)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
