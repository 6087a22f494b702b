"""One-shot probe for the admit_index_build artifact move (r12 item 2).

Times dedup_index_write(docs, path) on the rep=N replicated corpus either
COLD (standalone — the build's true cost) or WARM (immediately after a
minhash_lsh_pairs pass, reproducing scale_bench's tier order, where Spark's
cache manager may substitute a still-cached plan fragment into the build).

The interleaved A/B driver alternates fresh subprocesses with PYTHONPATH at
the pre-collapse checkout (.ab/precollapse, 67197ee) vs /root/repo: if the
old side is fast only WARM and both sides tie COLD, the r9/r10 artifact
numbers were flattered by accidental cache sharing, not faster code.

Usage: PYTHONPATH=<checkout> python tools/ab_admit_probe.py [rep] [cold|warm]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from mcp_synaptic_spark.session import get_spark
from mcp_synaptic_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_ab_fanout"


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    mode = sys.argv[2] if len(sys.argv) > 2 else "cold"
    spark = get_spark("ab-admit-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = f"{SCRATCH}/documents_{rep}"
    if not os.path.exists(docs_path):
        reps = spark.range(rep).select(F.col("id").alias("rep"))
        (
            load_table(spark, SF_DIR, "documents")
            .crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                "text",
                "lang",
                "source",
            )
            .write.mode("overwrite")
            .parquet(docs_path)
        )
    docs = spark.read.parquet(docs_path)

    from mcp_synaptic_spark.operators.dedup import dedup_index_write, minhash_lsh_pairs

    out: dict[str, float] = {}
    if mode == "warm":
        t0 = time.perf_counter()
        minhash_lsh_pairs(docs, threshold=0.5, max_bucket=200).count()
        out["minhash_warmup"] = round(time.perf_counter() - t0, 3)
    idx = f"{SCRATCH}/ab_admit_idx"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    dedup_index_write(docs, idx)
    out["admit_index_build"] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"rep": rep, "mode": mode, "timings": out}), flush=True)


if __name__ == "__main__":
    main()
