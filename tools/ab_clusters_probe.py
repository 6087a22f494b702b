"""One-shot probe for the dedup_clusters sf0.1 noise watch (r12 item 8):
times the dedup_clusters / dedup_clusters_twostar / dedup_apply_clusters
queries once (min of 2 passes, like bench.py) in THIS process. The
interleaved driver alternates fresh subprocesses with PYTHONPATH at the
r11 checkout (.ab/r11) vs /root/repo.

Usage: PYTHONPATH=<checkout> python tools/ab_clusters_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.environ["PYTHONPATH"].split(os.pathsep)[0])

import __spark_entry__ as entrymod  # noqa: E402
from mcp_synaptic_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("ab-clusters-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = ["dedup_clusters", "dedup_clusters_twostar", "dedup_apply_clusters"]
    qs["dedup_exact"](spark, SF_DIR).collect()  # JVM/footer warmup
    out = {}
    for _ in range(2):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 3)
            out[n] = min(out.get(n, dt), dt)
    print(json.dumps({"timings": out}), flush=True)


if __name__ == "__main__":
    main()
