"""TTL algebra as pure column expressions (SURVEY.md §2.8 X1–X11).

These reproduce the reference's expiry semantics exactly:
- X9 expiry-by-policy (reference models/memory.py:104-120):
    policy NEVER → NULL; ttl IS NULL or ≤ 0 → NULL;
    SLIDING → last_accessed_at + ttl; ABSOLUTE → created_at + ttl.
- X3 is_expired (reference utils/date_utils.py:81-92): NULL → false,
  else now ≥ expires_at.
- X11 default TTL by type (reference memory/manager/operations.py:154-163).
- X1 parse_ttl (reference utils/date_utils.py:13-40): "90"→90, "1h"→3600,
  units s/m/h/d/w — implemented as a pure SQL expression (no UDF).

Every function is a column expression → whole-stage codegen, fully
pushdown-friendly, and usable identically in batch and streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import DEFAULT_TTL_BY_TYPE

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def parse_ttl(ttl_str: Column) -> Column:
    """X1 — '90'→90; '1h'→3600; units s/m/h/d/w; NULL on malformed input.

    Pure expression: regexp split into (number, unit), map unit→multiplier.
    (The reference raises on malformed input; in a relational setting the
    analogue is NULL + an optional quarantine filter.)
    """
    s = F.trim(F.lower(ttl_str))
    num = F.regexp_extract(s, r"^(\d+)\s*([smhdw]?)$", 1)
    unit = F.regexp_extract(s, r"^(\d+)\s*([smhdw]?)$", 2)
    mult = F.coalesce(
        F.element_at(
            F.create_map(*[x for k, v in _UNIT_SECONDS.items() for x in (F.lit(k), F.lit(v))]),
            unit,
        ),
        F.lit(1),
    )
    return F.when(num != "", (num.cast("long") * mult).cast("long")).otherwise(F.lit(None).cast("long"))


def calculate_expiry(base: Column, ttl_seconds: Column) -> Column:
    """X2 — base + ttl seconds (reference utils/date_utils.py:43-51)."""
    return F.timestamp_add("SECOND", ttl_seconds.cast("long"), base)


def is_expired(expires_at: Column, now: Column) -> Column:
    """X3 — NULL expires_at ⇒ never expires (reference date_utils.py:81-92)."""
    return F.when(expires_at.isNull(), F.lit(False)).otherwise(now >= expires_at)


def not_expired_predicate(expires_at: Column, now: Column) -> Column:
    """F3 — the live-rows filter (reference memory/storage/sqlite.py:162-164)."""
    return expires_at.isNull() | (expires_at > now)


def time_until_expiry(expires_at: Column, now: Column) -> Column:
    """X4 — greatest(0, expires_at − now) in seconds; NULL → NULL
    (reference date_utils.py:95-107)."""
    delta = F.unix_timestamp(expires_at) - F.unix_timestamp(now)
    return F.when(expires_at.isNull(), F.lit(None).cast("long")).otherwise(F.greatest(F.lit(0), delta))


def default_ttl_for_type(memory_type: Column) -> Column:
    """X11 — ephemeral 300 / short_term 3600 / long_term 604800 / permanent 0
    (reference memory/manager/operations.py:154-163)."""
    mapping = F.create_map(*[x for k, v in DEFAULT_TTL_BY_TYPE.items() for x in (F.lit(k), F.lit(v))])
    return F.element_at(mapping, memory_type)


def effective_ttl(ttl_seconds: Column, memory_type: Column) -> Column:
    """ttl defaulting: explicit value wins, else the type default (X11)."""
    return F.coalesce(ttl_seconds, default_ttl_for_type(memory_type))


def expiry_for_policy(
    policy: Column,
    ttl_seconds: Column,
    created_at: Column,
    last_accessed_at: Column,
) -> Column:
    """X9 — the core TTL algebra (reference models/memory.py:104-120).

    NEVER → NULL; ttl NULL/≤0 → NULL; SLIDING → last_accessed + ttl;
    ABSOLUTE (and anything else) → created_at + ttl.
    """
    return (
        F.when(policy == "never", F.lit(None).cast("timestamp"))
        .when(ttl_seconds.isNull() | (ttl_seconds <= 0), F.lit(None).cast("timestamp"))
        .when(policy == "sliding", calculate_expiry(last_accessed_at, ttl_seconds))
        .otherwise(calculate_expiry(created_at, ttl_seconds))
    )


#: X7 format-fallback list (reference utils/date_utils.py:128-156: ISO-8601
#: first, then common date/datetime layouts). Order matters — first match wins.
TS_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy",
)


def parse_timestamp_multi(ts_str: Column) -> Column:
    """X7 — multi-format timestamp parse: try each format in TS_FORMATS order,
    NULL if none matches (the reference raises; relational analogue is NULL).

    try_to_timestamp is a pure expression, so the whole fallback chain stays
    inside whole-stage codegen — no UDF.
    """
    return F.coalesce(*[F.try_to_timestamp(ts_str, F.lit(fmt)) for fmt in TS_FORMATS])


def age_in_seconds(created_at: Column, now: Column) -> Column:
    """X8 — now − created_at in seconds (reference date_utils.py:159-167)."""
    return F.unix_timestamp(now) - F.unix_timestamp(created_at)


def is_recent(created_at: Column, now: Column, threshold_seconds: int = 3600) -> Column:
    """X8 — age ≤ threshold (reference date_utils.py:170-175)."""
    return age_in_seconds(created_at, now) <= threshold_seconds


def format_duration(seconds: Column) -> Column:
    """X5 — '2d 3h' / '5m 30s' human format (reference date_utils.py:54-78).

    Emits the two most significant non-zero units, matching the reference.
    """
    s = seconds.cast("long")
    d = (s / 86400).cast("long")
    h = ((s % 86400) / 3600).cast("long")
    m = ((s % 3600) / 60).cast("long")
    sec = s % 60
    return (
        F.when(s < 60, F.concat(sec.cast("string"), F.lit("s")))
        .when(
            s < 3600,
            F.when(sec > 0, F.concat(m.cast("string"), F.lit("m "), sec.cast("string"), F.lit("s"))).otherwise(
                F.concat(m.cast("string"), F.lit("m"))
            ),
        )
        .when(
            s < 86400,
            F.when(m > 0, F.concat(h.cast("string"), F.lit("h "), m.cast("string"), F.lit("m"))).otherwise(
                F.concat(h.cast("string"), F.lit("h"))
            ),
        )
        .otherwise(
            F.when(h > 0, F.concat(d.cast("string"), F.lit("d "), h.cast("string"), F.lit("h"))).otherwise(
                F.concat(d.cast("string"), F.lit("d"))
            )
        )
    )
