"""Interleaved re-measurement probe for the bm25 100x watch item (VERDICT
r12 next-round #8): bm25_search_10x and bm25_index_build moved up 1.4-1.8x
r11->r12 on BIT-UNCHANGED code (retrieval.py / bm25_index.py untouched since
r10), in a session whose box regime notes 113/115/121 document as degrading
through the day. This probe brackets the variance band the note-57 way —
N back-to-back interleaved runs of the exact scale_bench arms in ONE
process against the already-built scale scratch corpus — so the swing is
attributable to regime (wide band on identical code) or to a real
regression (tight band pinned high).

Usage: python tools/ab_bm25_probe.py [iters=3]   (after a scale_bench run
has left /tmp/spark_graft_scale10/documents on disk)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_synaptic_spark.session import get_spark  # noqa: E402

CORPUS = "/tmp/spark_graft_scale10/documents"
SCRATCH = "/tmp/spark_graft_ab_bm25"


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-bm25-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)
    from mcp_synaptic_spark.operators.bm25_index import bm25_index_write
    from mcp_synaptic_spark.operators.retrieval import bm25_search

    runs = []
    for i in range(iters):
        out = {}
        t0 = time.perf_counter()
        bm25_search(docs, "dup hash join vector", k=1).collect()
        out["bm25_search"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(SCRATCH, ignore_errors=True)
        t0 = time.perf_counter()
        bm25_index_write(docs, SCRATCH, overwrite=True)
        out["bm25_index_build"] = round(time.perf_counter() - t0, 3)
        runs.append(out)
        print(json.dumps({"iter": i, **out}), flush=True)
    band = {
        k: (min(r[k] for r in runs), max(r[k] for r in runs))
        for k in runs[0]
    }
    print(json.dumps({"band": band, "n": iters}), flush=True)


if __name__ == "__main__":
    main()
