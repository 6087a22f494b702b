"""Small shared helpers for physical-shape control."""

from __future__ import annotations

import os
import threading
import urllib.parse

from pyspark.sql import DataFrame

#: Inputs smaller than this are "cheap to reshuffle": repartitioning them to
#: core count costs a trivial shuffle and buys full-CPU parallelism for
#: CPU-bound stages. Inputs at or above it already split into enough scan
#: partitions (spark.sql.files.maxPartitionBytes), so we leave them alone —
#: at cluster scale this helper is a no-op and never adds a shuffle.
_SMALL_INPUT_BYTES = 256 << 20

# Memoized decision per (appId, input file set) so repeated operator calls
# over the same table do zero filesystem work.
_PAR_DECISION: dict[tuple, bool] = {}


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition to core count when the input is small.

    CPU-bound stages (shingling, seeded hashing, pairwise arithmetic,
    Arrow-batched Python transforms) must not inherit single-file parallelism
    from a small parquet read. The decision is size-based, computed from the
    scan's input files (analysis-only — no job, no physical planning, unlike a
    ``df.rdd.getNumPartitions()`` probe, which plans the query just to throw
    the plan away):

    - local input files totalling < 256 MB → ``repartition(cores)``; the
      shuffle is trivially cheap at that size and the Python/CPU stage gets
      every core.
    - anything bigger, non-local (object store), or file-less → returned
      untouched; at production scale input splits >> cores already.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    if not files:
        # No scan underneath (literal/derived data) — tiny by construction.
        return df.repartition(par)
    key = (spark.sparkContext.applicationId, files)
    small = _PAR_DECISION.get(key)
    if small is None:
        total = 0
        small = True
        for f in files:
            if not f.startswith("file:"):
                small = False  # non-local storage ⇒ assume cluster-scale input
                break
            # inputFiles() returns percent-encoded URIs (spaces → %20);
            # unquote before stat or such paths would read as "large" forever
            path = urllib.parse.unquote(f[len("file:") :])
            try:
                total += os.path.getsize(path)
            except OSError:
                small = False
                break
            if total >= _SMALL_INPUT_BYTES:
                small = False
                break
        _PAR_DECISION[key] = small
    return df.repartition(par) if small else df


# ---------------------------------------------------------------------------
# scoped caches: operators that .cache() intermediates register them here so
# the NEXT operator invocation releases them — bounding executor storage to
# one operator's working set in a long-lived session (a leaked cache per call
# would accumulate forever on a resident cluster).
# ---------------------------------------------------------------------------

_SCOPED: list[DataFrame] = []
_SCOPED_LOCK = threading.Lock()


def release_scoped_caches() -> None:
    """Unpersist every cache registered by a previous operator call.

    Lock-guarded: concurrent operator calls must not pop each other's list
    mid-mutation. Unpersisting a frame another thread still computes on is
    safe for correctness (Spark recomputes lineage) but defeats the cache —
    callers running operators concurrently should serialize them or accept
    the recompute.
    """
    with _SCOPED_LOCK:
        drained, _SCOPED[:] = _SCOPED[:], []
    for df in drained:
        try:
            df.unpersist()
        except Exception:
            pass


def scoped_cache(df: DataFrame) -> DataFrame:
    """cache() a frame and register it for release by the next operator."""
    df = df.cache()
    with _SCOPED_LOCK:
        _SCOPED.append(df)
    return df
