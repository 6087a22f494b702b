"""Design-point validation of the sampled IVF coarse-quantizer fit (VERDICT
r13 next-round #2 / PLANS notes 130-131): the r13 feature is DORMANT at the
100x artifact tier by design (200k corpus rows < the max(256·k, 1M) floor),
so this one-off probe builds a corpus ABOVE the floor — ~2.4M DISTINCT
vectors (the committed 2k sf0.1 embeddings, each under 1200 deterministic
per-rep perturbations, so the collapse cannot shrink the fit input) plus
1000 planted exact replicas — and brackets full-fit vs sampled-fit the
note-57 way: alternating arms in ONE process, N rounds each.

Per arm and round it records:
- fit+assign wall time (`_ivf_build_reps` through the assigned count);
- cells_built == the requested k;
- replica-recall: every planted replica shares its rep row (identical
  vectors land identically under ANY centroids — by collapse construction,
  asserted);
- SemDeDup ground-truth parity: a 4k-row audit slice (2k distinct vectors +
  one exact twin each) assigned under THIS arm's centroids and fed to
  semantic_dedup at threshold 0.999 must remove exactly one member per twin
  pair — the centroid-independent ground truth, holding under both fits.

Expected shape (note 131's corrected expectation): the sampled arm trains
on ~1M of 2.4M rows, so the fit-dominated build line drops ~2x here and
proportionally more at 1B-vector ratios; k is held at an explicit 128 to
keep the full arm affordable in one session (auto k≈1549 would put the
FULL fit at ~30 min — exactly the cost the sampled fit exists to avoid).

Usage: python tools/ab_ivf_fit_probe.py [rounds=2] [rep=1200] [k=128]
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
SCRATCH = "/tmp/spark_graft_ab_ivffit"


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    spark = get_spark("ab-ivf-fit-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from mcp_synaptic_spark.operators import similarity as S

    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    # per-rep deterministic perturbation on every element — all rep copies
    # are DISTINCT vectors, so the rep-collapse cannot shrink the fit input
    # and the fit truly sees ~2.4M rows
    perturbed = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> cast(x + sin(rep * (i + 1)) * 0.01 as float))"
            ).alias("embedding"),
        )
    )
    replicas = perturbed.where(F.col("vec_id") % 10_000_000 < 500).limit(1000).select(
        (F.col("vec_id") + 990_000_000_000).alias("vec_id"), "embedding"
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    perturbed.unionByName(replicas).write.parquet(f"{SCRATCH}/corpus")
    corpus = spark.read.parquet(f"{SCRATCH}/corpus")
    n = corpus.count()
    n_replicas = replicas.count()
    print(json.dumps({"n_corpus": n, "n_planted_replicas": n_replicas, "k": k}), flush=True)

    # audit slice for the SemDeDup centroid-independence ground truth:
    # 2k distinct vectors + one exact twin each under a higher id
    audit = base.select("vec_id", "embedding").unionByName(
        base.select((F.col("vec_id") + 500_000).alias("vec_id"), "embedding")
    )

    floor_orig = S._IVF_FIT_SAMPLE_FLOOR
    results = []
    for rnd in range(rounds):
        for arm in ("full", "sampled"):
            S._IVF_FIT_SAMPLE_FLOOR = 10**15 if arm == "full" else floor_orig
            t0 = time.perf_counter()
            assigned, cents = S._ivf_build_reps(corpus, n_cells=k, id_col="vec_id")
            n_reps = assigned.count()
            t_build = round(time.perf_counter() - t0, 3)

            # replica recall = every planted replica's CELL equals its
            # source vector's cell. At 0.04% duplication the collapse gate
            # correctly skips (below COLLAPSE_MIN_DUP_FRAC), so replicas sit
            # in singleton rep rows — co-assignment must be checked by cell
            # equality (model.transform is a pure function of the vector),
            # not by rep-row membership.
            exploded = assigned.select(F.explode("ids").alias("vid"), "cell")
            rep_rows = exploded.where(F.col("vid") >= 990_000_000_000).select(
                (F.col("vid") - 990_000_000_000).alias("vid"),
                F.col("cell").alias("rcell"),
            )
            n_rep_rows = rep_rows.count()
            n_mismatch = (
                rep_rows.join(exploded, "vid").where(F.col("cell") != F.col("rcell")).count()
            )
            replica_recall_ok = bool(n_rep_rows == n_replicas and n_mismatch == 0)

            aud_assigned = S._argmin_cell(
                audit.select("vec_id", F.col("embedding").alias("v")), cents, "v"
            ).select(F.col("vec_id"), F.col("v").alias("embedding"), "cell")
            sem = S.semantic_dedup(aud_assigned, cents, threshold=0.999, id_col="vec_id")
            n_removed = sem.where("removed").count()
            semdedup_ok = bool(n_removed == 2000)

            row = {
                "round": rnd,
                "arm": arm,
                "build_s": t_build,
                "n_reps": n_reps,
                "cells_built": len(cents),
                "replica_recall_ok": replica_recall_ok,
                "semdedup_removed": n_removed,
                "semdedup_ok": semdedup_ok,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    S._IVF_FIT_SAMPLE_FLOOR = floor_orig

    by_arm = {
        arm: [r["build_s"] for r in results if r["arm"] == arm]
        for arm in ("full", "sampled")
    }
    print(
        json.dumps(
            {
                "summary": {
                    "full_min_s": min(by_arm["full"]),
                    "sampled_min_s": min(by_arm["sampled"]),
                    "speedup_min_over_min": round(
                        min(by_arm["full"]) / max(min(by_arm["sampled"]), 1e-9), 2
                    ),
                    "all_checks_ok": all(
                        r["replica_recall_ok"] and r["semdedup_ok"] and r["cells_built"] == k
                        for r in results
                    ),
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
