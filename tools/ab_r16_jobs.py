"""Deterministic A/B evidence: Spark JOB COUNT per query (statusTracker,
regime-immune). Bench-identical setup, then each query runs once inside its
own job group; prints one JSON line {query: n_jobs}.

Usage: python tools/ab_r16_jobs.py q1,q2,...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mcp_synaptic_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r16-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    qs["tpch_q6"](spark, sf_dir).collect()
    n_warm = 2 * sc.defaultParallelism
    spark.range(0, n_warm, 1, n_warm).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    entrymod._ivf_index(spark, sf_dir)
    entrymod._ivf_append_index(spark, sf_dir)
    entrymod._mllib_lsh_index(spark, sf_dir)
    entrymod._bm25_index(spark, sf_dir)
    out = {}
    for i, n in enumerate(names):
        # warm pass first (memos, first-call builds), then the counted pass
        qs[n](spark, sf_dir).collect()
        g = f"count-{i}-{n}"
        sc.setJobGroup(g, n)
        qs[n](spark, sf_dir).collect()
        out[n] = len(sc.statusTracker().getJobIdsForGroup(g))
        sc.setLocalProperty("spark.jobGroup.id", None)
    print(json.dumps({"side": os.path.dirname(os.path.abspath(__file__)), **out}))


if __name__ == "__main__":
    main()
