"""Small shared helpers for physical-shape control."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to core count when the input has fewer partitions.

    CPU-bound stages (shingling, seeded hashing, pairwise arithmetic,
    Arrow-batched Python transforms) must not inherit single-file parallelism
    from a small parquet read. At production scale input splits >> cores, so
    this is a no-op — no extra shuffle.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
