"""Deterministic `memories` table derived from the driver's `events` parquet.

The driver's testdata has no memories table, so the memory-engine operators
(SURVEY.md §2.9 Q1–Q8) are exercised over a memories state derived 1:1 from
`events` by pure deterministic expressions. The SAME derivation exists twice
on purpose: once as a Spark DataFrame transform (used by `queries()`), once as
an ANSI-SQL CTE for the DuckDB oracle — independent expressions of identical
semantics, which is exactly what the correctness gate compares.

Mapping (all deterministic in event_id / ts / event_type / props):
  key               'mem-' || event_id
  data              props (JSON payload)
  memory_type       click→ephemeral, view→short_term, purchase→long_term,
                    signup→permanent, error→short_term
  expiration_policy permanent→never, ephemeral→sliding, else→absolute
  created_at        ts;  updated_at = ts
  last_accessed_at  ts + (event_id % 7200) seconds
  ttl_seconds       NULL when event_id % 10 = 0 (exercises the NULL branch of
                    X9), else type default (X11) + (event_id % 5) * 60
                    (permanent stays 0)
  access_count      event_id % 50
  expires_at        X9 expiry-by-policy over the above
                    (reference models/memory.py:104-120)

NOW_TS is a fixed evaluation instant (events span 2024-01-01..30; Jan 15
splits live/expired) so every expiry predicate is reproducible across engines
and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ttl import expiry_for_policy

NOW_TS = "2024-01-15 00:00:00"


def now_col():
    return F.to_timestamp(F.lit(NOW_TS))


def memories_from_events(events: DataFrame) -> DataFrame:
    """Spark side of the derivation (see module docstring for the spec)."""
    typed = events.select(
        F.concat(F.lit("id-"), F.col("event_id").cast("string")).alias("id"),
        F.concat(F.lit("mem-"), F.col("event_id").cast("string")).alias("key"),
        F.col("props").alias("data"),
        F.when(F.col("event_type") == "click", "ephemeral")
        .when(F.col("event_type") == "view", "short_term")
        .when(F.col("event_type") == "purchase", "long_term")
        .when(F.col("event_type") == "signup", "permanent")
        .otherwise("short_term")
        .alias("memory_type"),
        F.col("ts").alias("created_at"),
        F.col("ts").alias("updated_at"),
        F.timestamp_add("SECOND", (F.col("event_id") % 7200).cast("long"), F.col("ts")).alias("last_accessed_at"),
        (F.col("event_id") % 50).cast("int").alias("access_count"),
        F.col("event_id"),
    )
    typed = typed.withColumn(
        "expiration_policy",
        F.when(F.col("memory_type") == "permanent", "never")
        .when(F.col("memory_type") == "ephemeral", "sliding")
        .otherwise("absolute"),
    )
    default_ttl = (
        F.when(F.col("memory_type") == "ephemeral", 300)
        .when(F.col("memory_type") == "short_term", 3600)
        .when(F.col("memory_type") == "long_term", 604800)
        .otherwise(0)
    )
    typed = typed.withColumn(
        "ttl_seconds",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("int"))
        .when(F.col("memory_type") == "permanent", F.lit(0))
        .otherwise((default_ttl + (F.col("event_id") % 5) * 60).cast("int")),
    )
    typed = typed.withColumn(
        "expires_at",
        expiry_for_policy(
            F.col("expiration_policy"), F.col("ttl_seconds"), F.col("created_at"), F.col("last_accessed_at")
        ),
    )
    # two-entry tag map with a varying 'bucket' value so tag-equality filters
    # (F4) are selective, not all-pass
    tags = F.create_map(
        F.lit("src"), F.lit("events"), F.lit("bucket"), (F.col("event_id") % 3).cast("string")
    )
    return typed.withColumn("tags", tags).drop("event_id").withColumn(
        "metadata", F.lit(None).cast("string")
    )


# DuckDB oracle twin of memories_from_events() — keep semantics in lockstep
# with the Spark derivation above and with X9 (models/memory.py:104-120).
MEMORIES_CTE_SQL = f"""
memories_derived AS (
  WITH typed AS (
    SELECT
      'mem-' || event_id AS key,
      props AS data,
      CASE event_type
        WHEN 'click' THEN 'ephemeral'
        WHEN 'view' THEN 'short_term'
        WHEN 'purchase' THEN 'long_term'
        WHEN 'signup' THEN 'permanent'
        ELSE 'short_term' END AS memory_type,
      ts AS created_at,
      ts AS updated_at,
      ts + (event_id % 7200) * INTERVAL '1 second' AS last_accessed_at,
      CAST(event_id % 50 AS INT) AS access_count,
      event_id
    FROM events
  ), pol AS (
    SELECT *,
      CASE WHEN memory_type = 'permanent' THEN 'never'
           WHEN memory_type = 'ephemeral' THEN 'sliding'
           ELSE 'absolute' END AS expiration_policy,
      CASE WHEN event_id % 10 = 0 THEN NULL
           WHEN memory_type = 'permanent' THEN 0
           ELSE (CASE memory_type
                   WHEN 'ephemeral' THEN 300
                   WHEN 'short_term' THEN 3600
                   WHEN 'long_term' THEN 604800
                   ELSE 0 END) + (event_id % 5) * 60
      END AS ttl_seconds
    FROM typed
  )
  SELECT key, data, memory_type, expiration_policy, created_at, updated_at,
         last_accessed_at, ttl_seconds, access_count,
         CAST(event_id % 3 AS VARCHAR) AS tag_bucket,
    CASE WHEN expiration_policy = 'never' THEN NULL
         WHEN ttl_seconds IS NULL OR ttl_seconds <= 0 THEN NULL
         WHEN expiration_policy = 'sliding'
           THEN last_accessed_at + ttl_seconds * INTERVAL '1 second'
         ELSE created_at + ttl_seconds * INTERVAL '1 second'
    END AS expires_at
  FROM pol
)
"""

NOW_SQL = f"TIMESTAMP '{NOW_TS}'"
