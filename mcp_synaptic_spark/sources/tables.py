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


# --- interchange formats (JSONL / CSV) -------------------------------------
#
# Training-data pipelines exchange JSONL constantly and CSV occasionally;
# parquet stays the engine-native format (columnar pruning + pushdown), these
# are the ingest/export seams. Two honesty rules:
# - readers REQUIRE an explicit schema: inference is lossy (timestamps come
#   back as strings, longs as doubles) and silently wrong at scale;
# - the CSV writer REFUSES array/map/struct columns unless asked to stringify
#   them (CSV has no list type; a silent toString would not round-trip).


#: Spark's default JSON/CSV timestampFormat is millisecond-precision, which
#: silently truncates the micros parquet timestamps carry — pin a µs format
#: on BOTH directions so instants round-trip exactly.
_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Export as JSON-lines. Timestamps serialize as ISO-8601 with offset at
    MICROsecond precision (session UTC — see ensure_session_conf), so a
    schema-bearing read_jsonl round-trips the exact instant;
    arrays/maps/structs nest natively."""
    ensure_session_conf(df.sparkSession)
    df.write.mode(mode).option("timestampFormat", _TS_FORMAT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSON-lines under an EXPLICIT schema (DDL string or StructType).

    FAILFAST: a row that doesn't parse under the schema raises instead of
    becoming a silent NULL — at 100 TB a permissive reader turns data bugs
    into statistical noise you can't find."""
    ensure_session_conf(spark)
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FORMAT)
        .json(path)
    )


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite", stringify_complex: bool = False) -> None:
    """Export as headered CSV. Complex columns (array/map/struct) are
    rejected unless stringify_complex=True wraps them in to_json — explicit,
    because the JSON-in-CSV cell needs from_json on the way back in."""
    complex_cols = [
        f.name for f in df.schema.fields if f.dataType.typeName() in ("array", "map", "struct")
    ]
    if complex_cols and not stringify_complex:
        raise ValueError(
            f"CSV cannot hold complex columns {complex_cols}; pass "
            "stringify_complex=True to serialize them as JSON strings "
            "(read back with from_json), or use write_jsonl"
        )
    ensure_session_conf(df.sparkSession)
    out = df
    for c in complex_cols:
        out = out.withColumn(c, F.to_json(F.col(c)))
    out.write.mode(mode).option("header", "true").option("timestampFormat", _TS_FORMAT).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read headered CSV under an EXPLICIT schema, FAILFAST like read_jsonl.
    Columns stringified by write_csv(stringify_complex=True) arrive as JSON
    strings — apply from_json with the original element type to restore."""
    ensure_session_conf(spark)
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FORMAT)
        .csv(path)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- bucketed tables (co-partitioned joins) ---------------------------------
#
# The doc <-> embedding join (J2, reference rag/database/documents.py:66-111)
# runs on every get/search/update; on plain parquet each execution shuffles
# both sides on id. Writing the two tables BUCKETED on the join key lets the
# planner prove co-partitioning and drop the exchange entirely: the join is
# SortMergeJoin over matching bucket files with ZERO shuffle — the decisive
# layout optimization at 100 TB, where the corpus-side shuffle is the whole
# cost. Same idea as Hive/Spark bucketing everywhere: pay one layout write,
# amortize over every subsequent keyed join.


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    *,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed+sorted external table on `bucket_col`.

    Bucket metadata lives in the session catalog (saveAsTable is required —
    plain .parquet(path) cannot record bucketing); `path` makes the table
    external so the data outlives the catalog entry. Both sides of a
    co-partitioned join must use the SAME n_buckets.
    """
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table BY NAME (spark.table) — reading the path with
    spark.read.parquet would silently drop the bucket metadata and the
    exchange-free join with it."""
    return spark.table(table_name)
