"""A/B probe for the two unexplained 100x movers (VERDICT r14 next-round #3).

r14's 100x artifact moved `ivf_index_build_auto` 49.3 -> 86.6 s (+76%) and
`decontaminate_semantic_lsh_10x` 12.6 -> 34.1 s (+171%) while their 10x twins
stayed flat — the regime signature — but neither arm had the bit-identical-
code replay the txn band got (note 136). This probe supplies it, note-57
protocol: each invocation is a FRESH process that runs ONE arm once over a
PRE-BUILT rep=100 corpus and prints a JSON timing line; the shell loop below
interleaves the arms across iterations so a session-wide regime shift hits
both arms equally. If the interleaved replays reproduce both the low and the
high committed values on today's code, the r14 delta is regime, not code
(both arms' operator files are bit-unchanged since their green grades per
the evidence ledger — the only r15 similarity.py edits are the id-dtype
guard, the BRP merge, and the per-write overwrite option, none on these
paths' plans, which `explain` confirms identical).

Usage:
    python tools/ab_r15_movers.py prep            # build the rep=100 corpus once
    python tools/ab_r15_movers.py ivf_build       # one timed KMeans index build
    python tools/ab_r15_movers.py decon_lsh       # one timed LSH decontamination
    for i in 1 2 3; do
        python tools/ab_r15_movers.py ivf_build
        python tools/ab_r15_movers.py decon_lsh
    done
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_synaptic_spark.session import get_spark  # noqa: E402
from mcp_synaptic_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_ab_r15"
REP = 100


def prep(spark) -> None:
    """Materialize the exact scale_bench rep=100 embeddings table once; every
    timed run then reads the same realistically-partitioned parquet."""
    reps = spark.range(REP).select(F.col("id").alias("rep"))
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(F.broadcast(reps))
        .select((F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"), "embedding")
    )
    emb.write.mode("overwrite").parquet(f"{SCRATCH}/embeddings")


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "prep"
    spark = get_spark("ab-r15-movers")
    spark.sparkContext.setLogLevel("ERROR")
    if arm == "prep":
        prep(spark)
        print(json.dumps({"arm": "prep", "rows": spark.read.parquet(f"{SCRATCH}/embeddings").count()}))
        return

    emb = spark.read.parquet(f"{SCRATCH}/embeddings")
    if arm == "ivf_build":
        from mcp_synaptic_spark.operators.similarity import ivf_index_write

        path = f"{SCRATCH}/ivf_index_{os.getpid()}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        ivf_index_write(emb, path, n_cells=None, id_col="vec_id")
        dt = round(time.perf_counter() - t0, 3)
        shutil.rmtree(path, ignore_errors=True)
        print(json.dumps({"arm": "ivf_build", "sec": dt}))
    elif arm == "decon_lsh":
        from mcp_synaptic_spark.operators.pipeline import semantic_decontaminate

        tr_emb = emb.where(F.col("vec_id") % 97 != 0)
        ev_emb = emb.where(F.col("vec_id") % 97 == 0)
        t0 = time.perf_counter()
        n = semantic_decontaminate(tr_emb, ev_emb, threshold=0.9, candidates="lsh").count()
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({"arm": "decon_lsh", "sec": dt, "flagged": n}))
    else:
        raise SystemExit(f"unknown arm {arm!r}")


if __name__ == "__main__":
    main()
