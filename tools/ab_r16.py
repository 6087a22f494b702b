"""Interleaved A/B timer for r16: fresh session, bench-identical setup
(JVM warm-up, Arrow worker pre-warm, index prebuild outside the timed
region), then min over N passes per query. One JSON line out.

Usage: python tools/ab_r16.py q1,q2,... [passes]
Run alternately from the pristine worktree (/tmp/r16_before, cache roots
localized) and /root/repo so machine drift hits both arms equally — the
ab_quick/ab_bench decision protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mcp_synaptic_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["tpch_q6"](spark, sf_dir).collect()
    n_warm = 2 * spark.sparkContext.defaultParallelism
    spark.range(0, n_warm, 1, n_warm).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    entrymod._ivf_index(spark, sf_dir)
    entrymod._ivf_append_index(spark, sf_dir)
    entrymod._mllib_lsh_index(spark, sf_dir)
    entrymod._bm25_index(spark, sf_dir)
    out = {}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).collect()
            dt = round(time.perf_counter() - t0, 3)
            out[n] = min(out.get(n, dt), dt)
    print(json.dumps({"side": os.path.dirname(os.path.abspath(__file__)), **out}))


if __name__ == "__main__":
    main()
