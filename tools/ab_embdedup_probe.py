"""One-shot probe for the r12 embedding-family pre-collapse: times the
scale_bench embedding near-dup tiers against the scale scratch corpus.

Usage: PYTHONPATH=<checkout> python tools/ab_embdedup_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.environ["PYTHONPATH"].split(os.pathsep)[0])

from mcp_synaptic_spark.session import get_spark  # noqa: E402

CORPUS = "/tmp/spark_graft_scale10/embeddings"


def main() -> None:
    spark = get_spark("ab-embdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(CORPUS)
    from mcp_synaptic_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    out, counts = {}, {}

    def timed(name, fn):
        t0 = time.perf_counter()
        counts[name] = fn()
        out[name] = round(time.perf_counter() - t0, 3)

    timed("lsh_auto", lambda: embedding_near_dup_pairs_lsh(emb, threshold=0.9, dim=64).count())
    timed("lsh_capped", lambda: embedding_near_dup_pairs_lsh(emb, threshold=0.9, dim=64, max_bucket=100).count())
    timed("auto_route", lambda: embedding_near_dup_pairs(emb, threshold=0.9, dim=64).count())
    print(json.dumps({"timings": out, "counts": counts}), flush=True)


if __name__ == "__main__":
    main()
