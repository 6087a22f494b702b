"""TTL algebra unit tests — semantics mirror the reference's model tests
(reference tests/unit/models/test_memory.py: expiry per policy, defaults,
is_expired edge cases; utils/date_utils parse/format)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mcp_synaptic_spark.functions import ttl as T

NOW = "2024-01-15 00:00:00"


def _one(spark, expr, **cols):
    row = spark.createDataFrame([cols or {"x": 1}]).select(expr.alias("r")).first()
    return row.r


def test_parse_ttl_semantics(spark):
    df = spark.createDataFrame(
        [("90",), ("1h",), ("30m",), ("2d",), ("1w",), ("15s",), ("bogus",), ("",), ("-5",)],
        ["s"],
    )
    out = {r.s: r.parsed for r in df.select("s", T.parse_ttl(F.col("s")).alias("parsed")).collect()}
    # reference utils/date_utils.py:13-40: bare number = seconds; s/m/h/d/w units
    assert out["90"] == 90
    assert out["1h"] == 3600
    assert out["30m"] == 1800
    assert out["2d"] == 172800
    assert out["1w"] == 604800
    assert out["15s"] == 15
    assert out["bogus"] is None  # reference raises; relational analogue: NULL
    assert out[""] is None
    assert out["-5"] is None


def test_expiry_for_policy(spark):
    # reference models/memory.py:104-120
    rows = [
        ("never", 100, "2024-01-01 00:00:00", "2024-01-02 00:00:00", None),
        ("absolute", 3600, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-01 01:00:00"),
        ("sliding", 3600, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
        ("absolute", 0, "2024-01-01 00:00:00", "2024-01-02 00:00:00", None),  # ttl 0 ⇒ permanent
        ("absolute", None, "2024-01-01 00:00:00", "2024-01-02 00:00:00", None),
    ]
    df = spark.createDataFrame(
        [(p, t, c, a) for p, t, c, a, _ in rows],
        "policy string, ttl int, created string, accessed string",
    )
    out = df.select(
        T.expiry_for_policy(
            F.col("policy"), F.col("ttl"), F.to_timestamp("created"), F.to_timestamp("accessed")
        ).alias("e")
    ).collect()
    for (_, _, _, _, want), got in zip(rows, out):
        if want is None:
            assert got.e is None
        else:
            assert got.e == datetime.fromisoformat(want)


def test_is_expired_and_not_expired(spark):
    now = F.to_timestamp(F.lit(NOW))
    df = spark.createDataFrame(
        [("2024-01-14 23:59:59",), ("2024-01-15 00:00:00",), ("2024-01-16 00:00:00",), (None,)],
        "exp string",
    ).select(F.to_timestamp("exp").alias("exp"))
    out = df.select(
        T.is_expired(F.col("exp"), now).alias("expired"),
        T.not_expired_predicate(F.col("exp"), now).alias("live"),
    ).collect()
    # past → expired; exactly-now → expired (now >= expires_at); future → live; NULL → never expires
    assert [r.expired for r in out] == [True, True, False, False]
    assert [r.live for r in out] == [False, False, True, True]


def test_default_ttl_and_effective(spark):
    df = spark.createDataFrame(
        [("ephemeral", None), ("short_term", None), ("long_term", None), ("permanent", None), ("short_term", 42)],
        "mt string, ttl int",
    )
    out = df.select(T.effective_ttl(F.col("ttl"), F.col("mt")).alias("t")).collect()
    assert [r.t for r in out] == [300, 3600, 604800, 0, 42]


def test_time_until_expiry(spark):
    now = F.to_timestamp(F.lit(NOW))
    df = spark.createDataFrame([("2024-01-15 00:10:00",), ("2024-01-14 00:00:00",), (None,)], "e string")
    out = df.select(T.time_until_expiry(F.to_timestamp("e"), now).alias("s")).collect()
    assert out[0].s == 600
    assert out[1].s == 0  # clamped at 0, never negative
    assert out[2].s is None


def test_format_duration(spark):
    df = spark.createDataFrame([(45,), (90,), (300,), (3660,), (90000,), (190000,)], "s long")
    out = [r.f for r in df.select(T.format_duration(F.col("s")).alias("f")).collect()]
    assert out == ["45s", "1m 30s", "5m", "1h 1m", "1d 1h", "2d 4h"]
