"""Component breakdown of the bm25_search_indexed probe at sf0.1 (r16 #4).

Times, per call: (a) the bm25_index_write staleness guard (fingerprint scan),
(b) bm25_index_load (driver-side parquet reads / partition discovery),
(c) the probe collect itself, and (d) brute bm25_search for reference.
Ratios matter, not absolutes (box may be contended).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from mcp_synaptic_spark.session import get_spark
from mcp_synaptic_spark.operators import retrieval as RT
from mcp_synaptic_spark.operators.bm25_index import (
    bm25_index_write,
    bm25_index_load,
    bm25_search_indexed,
)

SF = "/root/testdata/sf0.1"


def t(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label::<40} min {best:.3f}s over {n}")
    return best


def main():
    spark = get_spark("ab-bm25-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    docs = entrymod._t(spark, SF, "documents")
    docs.count()  # warm
    path = entrymod._bm25_index(spark, SF)  # ensure built

    q = " ".join(entrymod._BM25_TERMS)

    t("guard: bm25_index_write (no-op path)", lambda: bm25_index_write(docs, path))
    t("load: bm25_index_load", lambda: bm25_index_load(spark, path))
    t(
        "probe only (pre-loaded index)",
        lambda: bm25_search_indexed(
            spark, path, q, k=10, k1=entrymod._BM25_K1, b=entrymod._BM25_B
        ).collect(),
    )
    t(
        "full declared query (guard+load+probe)",
        lambda: entrymod._q_bm25_search_indexed(spark, SF).collect(),
    )
    t(
        "brute bm25_search",
        lambda: RT.bm25_search(
            docs, q, k=10, k1=entrymod._BM25_K1, b=entrymod._BM25_B
        ).collect(),
    )


if __name__ == "__main__":
    main()
