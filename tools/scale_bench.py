#!/usr/bin/env python3
"""Min-of-N bench floors for the sf1 scale proof (VERDICT r9 item 1).

Runs graft.Bench on the same query subset at two fixture scales, N cold-JVM
reps each, collects per-query minima, and emits a per-row cost-growth table:
a query whose (sf1 time / sf1 rows) exceeds 2x its (sf0.1 time / sf0.1 rows)
is flagged for plan investigation. Dev tool only — the shipped library does
not depend on this."""
import json, os, shutil, subprocess, sys, tempfile

REPO = "/root/repo"
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")

def run_bench(sf_dir: str, queries: list[str], reps: int, cpus: str, mem: str):
    """Returns ({query: [t1..tN]}, {query: output_rows}). Each rep is a
    fresh JVM (sbt runMain); output rows are deterministic, so the last
    successful rep's counts win (and a cross-rep mismatch is an error)."""
    times: dict[str, list[float]] = {q: [] for q in queries}
    rows: dict[str, int] = {}
    saved = None
    if os.path.exists(DETAIL):
        saved = DETAIL + ".orig"
        shutil.copy(DETAIL, saved)
    try:
        for rep in range(reps):
            env = dict(os.environ,
                       SPARK_GRAFT_SF_DIR=sf_dir,
                       SPARK_GRAFT_CPUS=cpus,
                       SPARK_DRIVER_MEM=mem)
            # [] = full registry (Bench's no-arg mode)
            cmd = ["sbt", "-batch",
                   ("runMain graft.Bench " + " ".join(queries)).strip()]
            # A crashed rep must not silently re-read a stale DETAIL file
            # (the prior rep's, or the committed repo copy) — that would
            # corrupt the min-of-N floors. Delete first, check exit code,
            # skip the rep loudly on any failure.
            if os.path.exists(DETAIL):
                os.remove(DETAIL)
            r = subprocess.run(cmd, cwd=REPO, env=env,
                               capture_output=True, text=True, timeout=10800)
            if r.returncode != 0:
                print(f"[scale_bench] ERROR: rep {rep} sbt exited "
                      f"{r.returncode}; skipping rep\n{r.stdout[-2000:]}\n"
                      f"{r.stderr[-2000:]}", file=sys.stderr)
                continue
            if not os.path.exists(DETAIL):
                print(f"[scale_bench] ERROR: rep {rep} produced no "
                      f"{DETAIL}; skipping rep", file=sys.stderr)
                continue
            d = json.load(open(DETAIL))
            errs = d.get("failed", [])
            if errs:
                print(f"[scale_bench] rep {rep} FAILED queries: {errs}",
                      file=sys.stderr)
            if not queries:
                # full-registry mode: harvest the query list from the
                # first successful rep's detail keys
                meta = {"total_sec", "errors", "failed", "sf", "rows"}
                for q in d:
                    if q not in meta and q not in times:
                        times[q] = []
            for q in (queries or [q for q in times]):
                # whole-second floors land as JSON integers — accept
                # both (bool is an int subclass, exclude it)
                if q in d and isinstance(d[q], (int, float)) \
                        and not isinstance(d[q], bool):
                    times[q].append(float(d[q]))
            # output-row telemetry (Bench "rows" since r13): counts are
            # deterministic — flag a cross-rep mismatch loudly
            for q, c in d.get("rows", {}).items():
                if q in rows and rows[q] != c:
                    print(f"[scale_bench] ERROR: {q} output rows moved "
                          f"across reps ({rows[q]} != {c}) — "
                          "nondeterministic query?", file=sys.stderr)
                rows[q] = c
            print(f"[scale_bench] {sf_dir} rep {rep}: "
                  f"total={d.get('total_sec')} errors={d.get('errors')}")
    finally:
        if saved:
            shutil.move(saved, DETAIL)
    return times, rows

def main():
    # /tmp/sf1_subset.txt: comma-separated names, or the literal ALL
    # (or a missing file) for the full registry (VERDICT r11 item 3)
    try:
        raw = open("/tmp/sf1_subset.txt").read().strip()
    except FileNotFoundError:
        raw = "ALL"
    queries = [] if raw == "ALL" else raw.split(",")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    out, rows = {}, {}
    for label, sf in [("sf0.1", "/root/testdata/sf0.1"),
                      ("sf1", os.path.join(REPO, "scale/sf1"))]:
        out[label], rows[label] = run_bench(sf, queries, reps, cpus, mem)
    floors = {label: {q: (min(ts) if ts else None)
                      for q, ts in d.items()}
              for label, d in out.items()}
    result = {"reps": reps, "cpus": cpus,
              "raw": out, "floors": floors, "rows": rows}
    json.dump(result, open("/tmp/scale_bench.json", "w"), indent=1)
    # growth table: input rows scale 10x for every scaled table, so
    # per-(input-)row cost growth == time growth / 10. The out0.1/out1/
    # outx columns carry OUTPUT rows so an output-bound form (a pair
    # enumerator whose result mass grows superlinearly) reads directly
    # as "time grew because output grew" instead of being re-adjudicated
    # in prose each round.
    print(f"\n{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} "
          f"{'perrow':>7s} {'out0.1':>10s} {'out1':>11s} {'outx':>7s}")
    flagged = []
    names = sorted(queries) if queries else \
        sorted(set(floors["sf0.1"]) | set(floors["sf1"]))
    for q in names:
        a, b = floors["sf0.1"].get(q), floors["sf1"].get(q)
        if a is None or b is None:
            print(f"{q:34s} MISSING"); flagged.append(q); continue
        ratio = b / a if a > 0 else float("inf")
        perrow = ratio / 10.0
        ra, rb = rows["sf0.1"].get(q), rows["sf1"].get(q)
        outx = (f"{rb / max(ra, 1):7.2f}"
                if ra is not None and rb is not None else "      ?")
        flag = " <-- INVESTIGATE" if perrow > 2.0 else ""
        if flag:
            flagged.append(q)
        print(f"{q:34s} {a:8.3f} {b:8.3f} {ratio:7.2f} {perrow:7.2f} "
              f"{ra if ra is not None else '?':>10} "
              f"{rb if rb is not None else '?':>11} {outx}{flag}")
    print(f"\nflagged: {flagged}")

if __name__ == "__main__":
    main()
