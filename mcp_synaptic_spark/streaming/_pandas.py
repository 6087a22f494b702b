"""Shared pandas/Arrow shims for the stateful streaming operators."""

from __future__ import annotations

import pandas as pd

DAY_US = 86_400_000_000

#: zone ids whose wall clock IS UTC year-round (fixed zero offset)
_UTC_ZONES = frozenset(
    {
        "UTC", "Etc/UTC", "GMT", "Etc/GMT", "GMT0", "Etc/GMT0", "Etc/GMT+0",
        "Etc/GMT-0", "Z", "+00:00", "UCT", "Etc/UCT", "Universal",
        "Etc/Universal", "Zulu", "Etc/Zulu", "Greenwich", "Etc/Greenwich",
    }
)


def series_to_micros(s: pd.Series) -> pd.Series:
    """Timestamp series → int64 epoch microseconds.

    Normalize to ns BEFORE the int cast: pandas 2.x may hand the Arrow
    batch over as datetime64[us], and a bare astype("int64") on that dtype
    would be off by 1000× (the r9 funnel-twin bug class — fix it here,
    once, for every stateful twin)."""
    return pd.to_datetime(s).astype("datetime64[ns]").astype("int64") // 1000


def require_utc_session(df) -> None:
    """Refuse to build a stateful twin on a non-UTC session (r10 review).

    applyInPandasWithState hands event timestamps to pandas CONVERTED to
    the session timezone and tz-naive, while ``getCurrentWatermarkMs`` is
    true UTC epoch — under any non-UTC session the two clocks skew by the
    zone offset, so day/bucket close tests fire early and on-time events
    are silently dropped or mis-folded (a permanent undercount, not an
    error). The engine's own session factory pins
    spark.sql.session.timeZone=UTC; a caller-built session must do the
    same, and this guard turns the silent skew into a loud constructor
    error. (The JVM-side-epoch refactor that would lift the restriction is
    tracked for a later round.)"""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_ZONES:
        raise ValueError(
            f"stateful streaming twins require spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): pandas-side event times arrive in the session "
            f"zone while the watermark clock is UTC epoch — the skew would "
            f"silently mis-close windows"
        )


def accumulate_days(pdfs, buf: set[int], col: str = "t") -> None:
    """Fold each micro-batch's timestamps into ``buf`` as epoch DAYS —
    the shared open-day-buffer prolog of the day-grained stateful twins."""
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        buf.update(int(d) for d in (series_to_micros(pdf[col]) // DAY_US))


def drain_closed_days(buf: set[int], wm_us: int) -> list[int]:
    """Remove and return (ascending) every buffered day whose END is at or
    below the watermark — the buffer-below-watermark fold shared by the
    day-grained stateful twins. Days still open to arrivals stay in
    ``buf``."""
    closed = [d for d in sorted(buf) if (d + 1) * DAY_US <= wm_us]
    for d in closed:
        buf.discard(d)
    return closed
