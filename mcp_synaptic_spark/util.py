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


#: Bytes of input per task for LIGHT Python/Arrow transforms (per-row
#: hashing, fake decoders): per-task overhead (Arrow stream setup + Python
#: worker round-trip) exceeds the work below this, so fanning a 600 KB scan
#: to 32 tasks ran SLOWER at 32 cores than 8 (driver r15 core-ratios:
#: embed_texts 0.31, multimodal_features 0.22). Heavy CPU stages (pairwise
#: arithmetic, seeded vector hashing) keep the unconditional core fan-out —
#: their cost scales with rows², not bytes.
_LIGHT_TASK_BYTES = int(os.environ.get("SPARK_GRAFT_LIGHT_TASK_BYTES", str(256 << 10)))


def ensure_parallelism(df: DataFrame, *, per_task_bytes: int | None = None) -> DataFrame:
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

    ``per_task_bytes`` (r16, guide §2): for LIGHT per-row transforms, cap
    fan-out at ``ceil(bytes / per_task_bytes)`` tasks instead of always
    using every core — scale-adaptive (grows with input until core-capped),
    so the sf-tier bench and the cluster see the same rule.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    if not files:
        # No scan underneath (literal/derived data) — tiny by construction.
        return df.repartition(par if per_task_bytes is None else 1)
    key = (spark.sparkContext.applicationId, files)
    sized = _PAR_DECISION.get(key)
    if sized is None:
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
        sized = (small, total)
        _PAR_DECISION[key] = sized
    small, total = sized
    if not small:
        return df
    if per_task_bytes is not None:
        return df.repartition(max(1, min(par, -(-total // per_task_bytes))))
    return df.repartition(par)


#: Minimum bytes of (estimated) data per output file before a write fans out
#: to another task — guide §6: files in the 128MB-1GB band read well; one
#: file per compute task turns a 2 MB index into 500 × 4 KB files that every
#: probe re-opens (measured r16: the sf0.1 IVF append index was 2.3 MB in
#: 503 files). Env-tunable for cluster profiles.
_MIN_FILE_BYTES = int(os.environ.get("SPARK_GRAFT_MIN_FILE_BYTES", str(16 << 20)))


def sized_for_write(df: DataFrame, *, by: str | None = None) -> DataFrame:
    """Repartition a frame about to be WRITTEN so output file count follows
    data size, not compute-task count (guide §6).

    The compute stages above keep their core-count fan-out (this adds a
    shuffle of exactly the bytes being written); the write stage gets
    ``clamp(bytes / _MIN_FILE_BYTES, 1, cores)`` tasks, estimated from the
    frame's local input files (the ensure_parallelism probe — no job). A
    non-local or file-less input returns the frame untouched: at cluster
    scale the writer's own layout governs.

    ``by``: a partitionBy column — rows are hash-repartitioned on it so each
    partition directory receives files from one task per write instead of
    one file per task that holds the value.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    if not files:
        # no size signal (checkpointed/derived frame) — leave the layout
        # alone rather than guess; callers size BEFORE a checkpoint
        return df
    total = 0
    for f in files:
        if not f.startswith("file:"):
            return df
        try:
            total += os.path.getsize(urllib.parse.unquote(f[len("file:"):]))
        except OSError:
            return df
    n = max(1, min(cores, -(-total // _MIN_FILE_BYTES)))
    return df.repartition(n, by) if by else df.repartition(n)


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
