"""One-shot probe for the note-105 fan-out A/B (r12 item 1).

Builds (or reuses) the rep=N replicated corpus in the scale_bench scratch
dir, then times ngram_decontaminate / corpus_summary / tfidf_terms once in
THIS process. The interleaved A/B driver alternates fresh subprocesses with
PYTHONPATH pointing at the old (.ab/r11) vs new (/root/repo) checkout.

Usage: PYTHONPATH=<checkout> python tools/ab_fanout_probe.py [rep]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from mcp_synaptic_spark.session import get_spark
from mcp_synaptic_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_ab_fanout"


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("ab-fanout-probe")
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

    from mcp_synaptic_spark.operators.pipeline import ngram_decontaminate
    from mcp_synaptic_spark.operators.stats import corpus_summary
    from mcp_synaptic_spark.operators.terms import tfidf_terms

    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 3)
        return r

    timed(
        "decontaminate",
        lambda: ngram_decontaminate(
            docs.where(F.col("doc_id") % 10_000_000 % 97 != 0),
            docs.where(F.col("doc_id") % 10_000_000 % 97 == 0),
            n=4,
        ).count(),
    )
    timed("corpus_summary", lambda: corpus_summary(docs).collect())
    timed("tfidf_terms", lambda: tfidf_terms(docs, group_col="lang").count())
    print(json.dumps({"rep": rep, "timings": out}), flush=True)


if __name__ == "__main__":
    main()
