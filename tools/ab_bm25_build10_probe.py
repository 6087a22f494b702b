"""ab_bm25_build_probe at 10x volume: unions the sf0.1 documents table with
itself 10 times under shifted ids (the scale_bench replication idiom) so the
build's corpus-scan cost dominates the fixed job overhead that drowns the
sf0.1 signal on a noisy box. Same interleaved-worktree protocol.

Usage: python tools/ab_bm25_build10_probe.py [passes]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from mcp_synaptic_spark.operators.bm25_index import bm25_index_write
from mcp_synaptic_spark.session import get_spark


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bm25-build10")
    spark.sparkContext.setLogLevel("ERROR")
    base = entrymod._t(spark, sf_dir, "documents")
    n = base.count()
    rep = 10
    docs = base
    for k in range(1, rep):
        docs = docs.unionByName(
            base.withColumn("doc_id", (F.col("doc_id") + F.lit(k * n)).cast("long"))
        )
    docs = docs.localCheckpoint(eager=True)  # pin the input outside the timed region
    path = "/tmp/ab_bm25_idx10"
    best = None
    for _ in range(passes):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        bm25_index_write(docs, path, overwrite=True)
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"bm25_index_build_10x": best}))


if __name__ == "__main__":
    main()
