#!/usr/bin/env python3
"""Min-of-N bench floors for the skew-resilience campaign (VERDICT r10
item 2): run graft.Bench on the SAME query subset over the uniform sf0.1
fixture and its zipf-skewed twin (scale/sf0.1zipf — identical row counts,
20% of events on one user_id, 20% of lineitem on one part+supplier), and
emit the skew-cost table: a query whose skewed floor exceeds 3x its
uniform floor needs a salted/capped sibling or a fix. Dev tool only.

Usage: python3 tools/skew_bench.py [reps] [queries_file]
  queries_file: one comma-separated line (default /tmp/skew_subset.txt)
"""
import json, os, subprocess, sys

REPO = "/root/repo"
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")


def run_bench(sf_dir, queries, reps, cpus, mem):
    times = {q: [] for q in queries}
    rows = {}
    for rep in range(reps):
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=cpus,
                   SPARK_DRIVER_MEM=mem)
        cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(queries)]
        if os.path.exists(DETAIL):
            os.remove(DETAIL)
        r = subprocess.run(cmd, cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(f"[skew_bench] ERROR: rep {rep} sbt exited "
                  f"{r.returncode}; skipping rep\n{r.stdout[-2000:]}\n"
                  f"{r.stderr[-2000:]}", file=sys.stderr)
            continue
        if not os.path.exists(DETAIL):
            print(f"[skew_bench] ERROR: rep {rep} produced no {DETAIL}; "
                  "skipping rep", file=sys.stderr)
            continue
        d = json.load(open(DETAIL))
        errs = d.get("failed", [])
        if errs:
            print(f"[skew_bench] rep {rep} FAILED queries: {errs}",
                  file=sys.stderr)
        for q in queries:
            # whole-second floors land as JSON integers — accept both
            # (bool is an int subclass, exclude it)
            if q in d and isinstance(d[q], (int, float)) \
                    and not isinstance(d[q], bool):
                times[q].append(float(d[q]))
        # output-row telemetry (Bench "rows" since r13): deterministic,
        # so a cross-rep mismatch is reported, last rep wins
        for q, c in d.get("rows", {}).items():
            if q in rows and rows[q] != c:
                print(f"[skew_bench] ERROR: {q} output rows moved "
                      f"across reps ({rows[q]} != {c})", file=sys.stderr)
            rows[q] = c
        print(f"[skew_bench] {sf_dir} rep {rep}: "
              f"total={d.get('total_sec')} errors={d.get('errors')}")
    return times, rows


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    qfile = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_subset.txt"
    queries = open(qfile).read().strip().split(",")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    saved = None
    if os.path.exists(DETAIL):
        saved = open(DETAIL).read()
    try:
        out, rows = {}, {}
        for label, sf in [("uniform", "/root/testdata/sf0.1"),
                          ("zipf", os.path.join(REPO, "scale/sf0.1zipf"))]:
            out[label], rows[label] = run_bench(sf, queries, reps, cpus,
                                               mem)
    finally:
        if saved is not None:
            open(DETAIL, "w").write(saved)
    floors = {label: {q: (min(ts) if ts else None) for q, ts in d.items()}
              for label, d in out.items()}
    result = {"reps": reps, "cpus": cpus, "raw": out, "floors": floors,
              "rows": rows}
    json.dump(result, open("/tmp/skew_bench.json", "w"), indent=1)
    # out-u/out-z/outx: OUTPUT rows per arm — a pair enumerator whose
    # zipf floor moves because the hot domain genuinely emits more pairs
    # reads directly off the outx column
    print(f"\n{'query':34s} {'uniform':>8s} {'zipf':>8s} {'ratio':>7s} "
          f"{'out-u':>10s} {'out-z':>10s} {'outx':>7s}")
    flagged = []
    for q in sorted(queries):
        a, b = floors["uniform"].get(q), floors["zipf"].get(q)
        if a is None or b is None:
            print(f"{q:34s} MISSING")
            flagged.append(q)
            continue
        ratio = b / a if a > 0 else float("inf")
        ra, rb = rows["uniform"].get(q), rows["zipf"].get(q)
        outx = (f"{rb / max(ra, 1):7.2f}"
                if ra is not None and rb is not None else "      ?")
        flag = " <-- SKEW-SENSITIVE" if ratio > 3.0 else ""
        if flag:
            flagged.append(q)
        print(f"{q:34s} {a:8.3f} {b:8.3f} {ratio:7.2f} "
              f"{ra if ra is not None else '?':>10} "
              f"{rb if rb is not None else '?':>10} {outx}{flag}")
    print(f"\nflagged: {flagged}")


if __name__ == "__main__":
    main()
