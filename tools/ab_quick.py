"""Targeted same-methodology timing for a few queries: fresh session,
tpch_q6 warm-up, min over N passes per query, one JSON line out.

Usage: python tools/ab_quick.py q1,q2,... [passes]
Used interleaved from two checkouts (git worktree) so machine drift hits
both sides equally — the decision protocol from tools/ab_bench.py at
single-query cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mcp_synaptic_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-quick")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["tpch_q6"](spark, sf_dir).collect()
    out = {}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).collect()
            dt = round(time.perf_counter() - t0, 3)
            out[n] = min(out.get(n, dt), dt)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
