"""Interleaved re-measurement probe for the txn_ckpt_1m swing (VERDICT r13
What's-wrong #2): the arm recorded 70.0/88.6/91.2/111.0/116.6/217.3 s across
the r13 session's 100x recordings on BIT-UNCHANGED state/txn.py — the widest
band in the project. The txn path is the one component doing per-commit
local-FS fsync/link syscalls, so it deserved its own note-57 bracket rather
than riding the general regime attribution.

This probe runs the EXACT scale_bench txn_ckpt_1m shape N times back-to-back
in ONE process, with a per-phase breakdown (create / 4 upserts / clean+vacuum
/ merged read-count) plus a pure-syscall microbench of the publish path
(fsync+link of a commit-sized JSON, xN), so the band attributes to a phase:

- wide band concentrated in `create`/`read` (the two parquet-volume phases)
  with a stable syscall microbench → noisy-neighbor I/O regime, no code fix;
- a stable total pinned high, or a syscall microbench in the hundreds of ms
  → the fsync/link path is real cost → batch commits per checkpoint
  interval (the judge's contingency).

Usage: python tools/ab_txn_probe.py [iters=4] [rep=10]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mcp_synaptic_spark.session import get_spark
from mcp_synaptic_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_ab_txn"


def syscall_microbench(n: int = 200) -> dict:
    """fsync+link publish of a commit-sized JSON, xN — the pure syscall cost
    the per-commit path pays, isolated from all Spark work."""
    root = os.path.join(SCRATCH, "syscall")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    payload = json.dumps({"v": 1, "dirs": ["d" * 64] * 8, "stats": {"n": 1_000_000}})
    t0 = time.perf_counter()
    for i in range(n):
        tmp = os.path.join(root, f".tmp{i}")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.link(tmp, os.path.join(root, f"{i:020d}.json"))
    total = time.perf_counter() - t0
    return {"n": n, "total_s": round(total, 3), "per_publish_ms": round(total / n * 1e3, 3)}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ab-txn-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from mcp_synaptic_spark.sources.memories import memories_from_events
    from mcp_synaptic_spark.state.txn import TxnTable

    # same corpus construction as scale_bench's memory tier, written out so
    # every iteration reads a realistically-partitioned table
    mem = memories_from_events(load_table(spark, SF_DIR, "events"))
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    big_mem = (
        mem.crossJoin(F.broadcast(reps))
        .withColumn("key", F.concat_ws("-", F.col("key"), F.col("rep")))
        .drop("rep")
    )
    big_mem.write.mode("overwrite").parquet(f"{SCRATCH}/memories")
    big_mem = spark.read.parquet(f"{SCRATCH}/memories")
    n_mem = big_mem.count()
    print(json.dumps({"n_mem": n_mem, "rep": rep, "syscall": syscall_microbench()}), flush=True)

    runs = []
    for i in range(iters):
        txn_root = f"{SCRATCH}/txn_ckpt"
        shutil.rmtree(txn_root, ignore_errors=True)
        out = {}
        t0 = time.perf_counter()
        t = TxnTable.create(spark, txn_root, big_mem, checkpoint_interval=2)
        out["create"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        for j in range(4):
            tj = time.perf_counter()
            t.upsert(big_mem.limit(1000).withColumn("metadata", F.lit(f"u{j}")))
            out[f"upsert_{j}"] = round(time.perf_counter() - tj, 3)
        out["upserts4"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        cleaned = t.clean_log()
        t.vacuum(keep_from_version=t.version())
        out["clean_vacuum"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_after = t.read().count()
        out["read_count"] = round(time.perf_counter() - t0, 3)
        # upserts4 is already the sum of upsert_0..3 — exclude the per-phase
        # keys so total isn't double-counted (review r14)
        out["total"] = round(
            out["create"] + out["upserts4"] + out["clean_vacuum"] + out["read_count"], 3
        )
        out["state_ok"] = bool(n_after == n_mem and t.version() == 4 and len(cleaned) >= 3)
        runs.append(out)
        print(json.dumps({"iter": i, **out}), flush=True)

    keys = (
        "create", "upsert_0", "upsert_1", "upsert_2", "upsert_3",
        "upserts4", "clean_vacuum", "read_count", "total",
    )
    summary = {
        k: {
            "min": min(r[k] for r in runs),
            "max": max(r[k] for r in runs),
            "band": round(max(r[k] for r in runs) / max(min(r[k] for r in runs), 1e-9), 2),
        }
        for k in keys
    }
    print(json.dumps({"summary": summary, "all_state_ok": all(r["state_ok"] for r in runs)}))
    spark.stop()


if __name__ == "__main__":
    main()
