"""Windowed streaming aggregates over an event stream (SURVEY.md §2.10).

The reference has no stream processor — its temporal surface is a 300 s
asyncio cleanup loop and SSE change events. This module supplies the
Structured Streaming expression of that surface plus the standard windowed
aggregates a telemetry/event pipeline needs: tumbling / sliding / session
windows with watermarked late-data handling.

All builders take a *streaming* DataFrame (spark.readStream...) but work
identically on batch frames (Spark's unified API) — the batch twins are what
the DuckDB oracle checks; the streaming tests assert stream≡batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window count + sum(value) per event_type.

    Watermark bounds state: late rows beyond `watermark` are dropped and the
    window state is evicted — mandatory for unbounded streams.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), *[F.col(c) for c in group_cols])
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w").getField("start").alias("window_start"), *group_cols, "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (overlapping windows)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w").getField("start").alias("window_start"),
            F.col("w").getField("end").alias("window_end"),
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of inactivity.

    Spark's native session_window keeps this fully stateful-streaming capable;
    the batch twin is the classic gaps-and-islands SQL the oracle runs.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col(key_col),
            F.col("w").getField("start").alias("session_start"),
            F.col("w").getField("end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
