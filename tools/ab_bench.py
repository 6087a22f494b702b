"""Interleaved A/B bench: alternate full bench.py runs between two checkouts
(r5 end-state vs current) to decide whether the r6 driver-run regressions in
the small-query cluster are code-caused or machine noise (VERDICT r6 item 1).

Each side runs in its own fresh subprocess (fresh JVM, fresh session state),
A and B alternating so slow machine drift hits both sides equally. Writes one
JSON line per run to the results file; summarize with --summarize.

Setup (the worktrees are not kept around): ``git worktree add .ab/<nameA>
<baseline-commit> && git worktree add .ab/<nameB> <candidate-commit>``;
remove them with ``git worktree remove --force`` when done. Round-7
conclusions from this harness are in PLANS.md note 15.

Usage (r8+: sides are arguments, no code edit needed):

    python tools/ab_bench.py [N] --sides nameA=/path/a nameB=/path/b
    python tools/ab_bench.py --summarize

Defaults keep the r7 investigation's r5/r7 paths for reproducibility.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time

SIDES = {
    "r5": "/root/repo/.ab/r5",
    "r7": "/root/repo/.ab/r7",
}
RESULTS = "/root/repo/tools/ab_bench_results.jsonl"
CLUSTER = [
    "memory_exists", "memory_delete", "memory_upsert", "doc_add",
    "memory_report", "tpch_q1", "memories_live_count", "memory_touch",
]


def run_once(side: str, cwd: str) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, capture_output=True, text=True, timeout=1800
    )
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith('{"metric"')), None
    )
    rec = {"side": side, "wall": round(time.time() - t0, 1), "rc": proc.returncode}
    if line:
        payload = json.loads(line)
        rec["total"] = payload["value"]
        rec["queries"] = payload["queries"]
    else:
        rec["stderr_tail"] = proc.stderr[-2000:]
    return rec


def summarize() -> None:
    runs = [json.loads(l) for l in open(RESULTS)]
    by_side: dict[str, list[dict]] = {}
    for r in runs:
        if "queries" in r:
            by_side.setdefault(r["side"], []).append(r)
    import statistics

    print(f"{'query':24s}" + "".join(f"  {s}(min/med)      " for s in by_side))
    for q in CLUSTER + ["__total__"]:
        row = f"{q:24s}"
        for s, rs in by_side.items():
            vals = [r["total"] if q == "__total__" else r["queries"].get(q) for r in rs]
            vals = [v for v in vals if v is not None]
            row += f"  {min(vals):6.3f}/{statistics.median(vals):6.3f}  "
        print(row)
    for s, rs in by_side.items():
        print(f"{s}: {len(rs)} runs, totals={[r['total'] for r in rs]}")


def main() -> None:
    global SIDES
    if "--summarize" in sys.argv:
        summarize()
        return
    args = sys.argv[1:]
    if "--sides" in args:
        i = args.index("--sides")
        pairs = args[i + 1 :]
        args = args[:i]
        SIDES = dict(p.split("=", 1) for p in pairs)
    n = int(args[0]) if args else 5
    with open(RESULTS, "a") as out:
        for i in range(n):
            for side, cwd in SIDES.items():
                rec = run_once(side, cwd)
                rec["pass"] = i
                out.write(json.dumps(rec) + "\n")
                out.flush()
                print(f"pass {i} {side}: total={rec.get('total')} rc={rec['rc']}", flush=True)


if __name__ == "__main__":
    main()
