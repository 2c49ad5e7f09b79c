"""Interleaved A/B benchmark harness (VERDICT r6 task #8): compare the
working tree against a git ref, query by query, the way BENCH.md's
hand-run A/Bs were done — same-window interleaving (A, B, A, B, ...),
one fresh Spark session per cell, best/median-of-N reporting, and the
single-thread memcpy bandwidth recorded per cell as the shared-host
load control.

Usage:
    python scripts/ab_bench.py --ref HEAD~1 \
        --queries q12_pip_skew,q19_zonal_stats [--rounds 3] [--reps 1]

Pseudo-queries ``index_build`` and ``layout`` run bench.py's
index_build_bench / layout_bench instead of a workload query.  The ref
side runs from a temporary ``git worktree`` checkout (removed on exit),
so both sides execute their OWN bench.py/operator code against the same
$SPARK_GRAFT_SF_DIR data.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_RUNNER = r'''
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import bench

names = sys.argv[1].split(",")
reps = int(sys.argv[2])
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
memcpy = bench._memcpy_gbps()
spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
wl = bench.workload_map()
for n in names:
    if n in wl:
        wl[n](spark, "/root/testdata/sf0.001").count()  # warm-up
out = {"__memcpy_gbps": memcpy}
for n in names:
    walls, rows = [], None
    for _ in range(reps):
        t0 = time.time()
        if n == "index_build":
            rows = bench.index_build_bench(spark, sf)
        elif n == "layout":
            rows = bench.layout_bench(spark, sf)
        else:
            rows = wl[n](spark, sf).count()
        walls.append(round(time.time() - t0, 3))
    out[n] = {"walls": walls, "rows": rows}
print("ABRESULT " + json.dumps(out))
spark.stop()
'''


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _run_cell(tree: str, queries: str, reps: int) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_RUNNER)
        runner = f.name
    try:
        proc = subprocess.run(
            [sys.executable, runner, queries, str(reps)],
            cwd=tree, capture_output=True, text=True, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise RuntimeError(
            f"runner produced no result in {tree}:\n{proc.stdout[-2000:]}"
            f"\n{proc.stderr[-2000:]}"
        )
    finally:
        os.unlink(runner)


def main():
    args = sys.argv[1:]
    ref, queries, rounds, reps = None, None, 3, 1
    for i, a in enumerate(args):
        if a == "--ref":
            ref = args[i + 1]
        elif a == "--queries":
            queries = args[i + 1]
        elif a == "--rounds":
            rounds = int(args[i + 1])
        elif a == "--reps":
            reps = int(args[i + 1])
    if not ref or not queries:
        print(__doc__)
        sys.exit(2)
    wt = tempfile.mkdtemp(prefix="ab_bench_ref_")
    subprocess.run(
        ["git", "worktree", "add", "--force", "--detach", wt, ref],
        cwd=REPO, check=True, capture_output=True,
    )
    names = queries.split(",")
    cells: dict[str, list[dict]] = {"ref": [], "cur": []}
    try:
        for r in range(rounds):
            for label, tree in (("ref", wt), ("cur", REPO)):
                res = _run_cell(tree, queries, reps)
                cells[label].append(res)
                print(
                    f"round {r} {label:3s} memcpy={res['__memcpy_gbps']} "
                    + " ".join(f"{n}={res[n]['walls']}" for n in names),
                    flush=True,
                )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )
    # BENCH.md-style table
    print(f"\n| query | {ref} walls (s) | worktree walls (s) | "
          "median ratio (ref/cur) |")
    print("|---|---|---|---|")
    summary = {}
    for n in names:
        ra = sorted(w for c in cells["ref"] for w in c[n]["walls"])
        cu = sorted(w for c in cells["cur"] for w in c[n]["walls"])
        ratio = round(_median(ra) / _median(cu), 2) if _median(cu) else None
        summary[n] = {"ref": ra, "cur": cu, "ref_over_cur": ratio}
        print(f"| {n} | {ra} | {cu} | {ratio} |")
    print(json.dumps({
        "ref": ref, "rounds": rounds, "reps": reps, "queries": summary,
        "memcpy_ref": [c["__memcpy_gbps"] for c in cells["ref"]],
        "memcpy_cur": [c["__memcpy_gbps"] for c in cells["cur"]],
    }))


if __name__ == "__main__":
    main()
