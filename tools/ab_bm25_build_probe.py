"""Interleaved A/B probe for the r15 bm25_index_write pass-count change:
times a full index build (overwrite=True) over the sf0.1 documents table,
min over N passes, one JSON line out.

Usage: python tools/ab_bm25_build_probe.py [passes]
Run interleaved from two checkouts (git worktree) so machine drift hits
both sides equally — the tools/ab_quick.py decision protocol applied to a
write-path arm that bench.py deliberately excludes from the timed region.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mcp_synaptic_spark.operators.bm25_index import bm25_index_write
from mcp_synaptic_spark.session import get_spark


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bm25-build")
    spark.sparkContext.setLogLevel("ERROR")
    docs = entrymod._t(spark, sf_dir, "documents")
    docs.count()  # warm the scan / footer cache
    path = "/tmp/ab_bm25_idx"
    best = None
    for _ in range(passes):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        bm25_index_write(docs, path, overwrite=True)
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"bm25_index_build_sf0.1": best}))


if __name__ == "__main__":
    main()
