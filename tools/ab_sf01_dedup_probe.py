"""One-shot probe: times the sf0.1 dedup pair-generator queries (min of 2
in-process passes, bench.py-style) for the r12 sf0.1 attribution A/B.

Usage: PYTHONPATH=<checkout> python tools/ab_sf01_dedup_probe.py
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
    spark = get_spark("ab-sf01-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [
        "dedup_minhash", "dedup_ngram_jaccard", "dedup_simhash",
        "dedup_embedding", "dedup_embedding_lsh",
    ]
    qs["dedup_exact"](spark, SF_DIR).collect()  # warmup
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
