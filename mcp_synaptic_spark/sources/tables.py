"""Parquet table loaders over the driver's testdata layout.

Plain ``spark.read.parquet`` — the vectorized parquet reader plus Catalyst
give us column pruning and predicate/filter pushdown for free, so point
lookups (reference memory/storage/sqlite.py:110-126) become pruned scans
rather than index probes. At cluster scale the same loaders work over a
partitioned table root; nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime session conf this engine's reads/plans depend on. Set idempotently on
# every load so the engine works under ANY caller-provided SparkSession (the
# driver's correctness gate builds a vanilla one), not only session.py's
# factory. Both keys are runtime-settable.
_REQUIRED_CONF = (
    # events.parquet stores TIMESTAMP(NANOS); without this flag a vanilla
    # session dies with PARQUET_TYPE_ILLEGAL. With it, ts arrives as a LONG of
    # nanos and we convert below.
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    # reference stores tz-aware UTC timestamps (models/base.py:33-40); pinning
    # makes epoch math host-timezone-independent.
    ("spark.sql.session.timeZone", "UTC"),
)


def ensure_session_conf(spark: SparkSession) -> None:
    """Pin the runtime conf the engine's reads depend on.

    SIDE EFFECT (public API contract — applies to load_table/load_tables/
    register_views too): this mutates the *caller's* session globally —
    ``spark.sql.session.timeZone`` becomes UTC and nano-precision parquet
    timestamps arrive as longs for every read on the session, not just ours.
    Required so the engine behaves identically under any caller-provided
    session (the driver's correctness gate builds a vanilla one); callers
    sharing a session with other timestamp-sensitive work should isolate with
    ``spark.newSession()``.

    Re-checked on every load (two cheap conf.get round-trips, ~µs next to a
    parquet read): a memoized skip keyed on the session object is unsafe —
    id() reuse after GC, and a caller mutating conf between loads would never
    be re-pinned.
    """
    for key, want in _REQUIRED_CONF:
        try:
            current = spark.conf.get(key, None)
        except Exception:
            current = None
        if current != want:
            spark.conf.set(key, want)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (see ensure_session_conf for the session-conf
    side effect this triggers on first use of a session)."""
    ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts precision depends on the testdata generation: TIMESTAMP(NANOS)
        # arrives as a LONG of nanos under nanosAsLong (integer `div` to µs,
        # matching DuckDB's ns→µs truncation — a double can't hold 1.7e18
        # exactly); TIMESTAMP(MICROS) without tz arrives as TIMESTAMP_NTZ and
        # is cast to the session-UTC instant type the engine uses throughout.
        dt = dict(df.dtypes)["ts"]
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif dt != "timestamp":
            # an unexpected dtype means a malformed testdata generation; a
            # blind cast would turn unparseable values into silent NULLs
            raise TypeError(
                f"events.ts has unsupported dtype {dt!r} (expected bigint "
                "nanos, timestamp_ntz, or timestamp) — regenerated testdata?"
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
