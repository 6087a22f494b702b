"""One-shot probe for the cc_cluster 100x move (r12): times the exact
scale_bench cc tier — connected_components over minhash edges and
dedup_corpus — once in THIS process against the scale scratch corpus.

Usage: PYTHONPATH=<checkout> python tools/ab_cc_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.environ["PYTHONPATH"].split(os.pathsep)[0])

from mcp_synaptic_spark.session import get_spark  # noqa: E402

CORPUS = "/tmp/spark_graft_scale10/documents"


def main() -> None:
    spark = get_spark("ab-cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)
    from mcp_synaptic_spark.operators.clustering import connected_components, dedup_corpus
    from mcp_synaptic_spark.operators.dedup import minhash_lsh_pairs

    out = {}
    t0 = time.perf_counter()
    comp = connected_components(minhash_lsh_pairs(docs, threshold=0.5, max_bucket=200))
    n = comp.count()
    out["cc_cluster"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    kept = dedup_corpus(docs, minhash_lsh_pairs(docs, threshold=0.5, max_bucket=200)).count()
    out["cc_dedup_corpus"] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"timings": out, "components": n, "kept": kept}), flush=True)


if __name__ == "__main__":
    main()
