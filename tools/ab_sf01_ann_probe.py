"""Interleaved old-vs-new A/B at sf0.1 for the r13-touched ANN/quality
queries (note-57 protocol): the r13 BENCH_LOCAL capture moved the whole
board up 15-40% INCLUDING bit-unchanged files (editdist, batch_topk,
bm25_search_indexed), which reads as the documented degrading-box regime —
but the touched families carry new gate probes whose dup-free-corpus tax
must be measured, not assumed. Runs the named queries once per invocation
against THIS checkout's entry module; the wrapper alternates checkouts
(A=current, B=r12) so both arms sample the same machine minutes.

Usage: python tools/ab_sf01_ann_probe.py <label>   (cwd = the checkout)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry  # noqa: E402
from mcp_synaptic_spark.session import get_spark  # noqa: E402

QUERIES = [
    # r13-touched
    "quality_admit", "dedup_embedding", "dedup_embedding_lsh",
    "ann_lsh_topk", "ann_ivf_topk", "ann_mllib_lsh", "dedup_minhash",
    # bit-unchanged controls (regime markers)
    "dedup_editdist", "batch_topk", "bm25_search_indexed",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "arm"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"ab-ann-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # warm-up + ETL indexes outside the timed region (bench.py discipline)
    qs["memory_stats"](spark, sf_dir).collect()
    entry._ivf_index(spark, sf_dir)
    entry._mllib_lsh_index(spark, sf_dir)
    entry._bm25_index(spark, sf_dir)
    out = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"arm": label, "checkout": HERE, "timings": out}), flush=True)


if __name__ == "__main__":
    main()
