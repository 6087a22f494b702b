"""Shared pandas/Arrow shims for the stateful streaming operators.

Clock model (r11, the note-95 follow-through): ``applyInPandasWithState``
hands event timestamps to pandas CONVERTED to the session timezone and
tz-naive — the conversion is performed by the PYTHON-side Arrow serializer
(pandas ``tz_convert`` over the IANA database), so local day/bucket
MEMBERSHIP computed from those naive values is already on Python tz rules.
The watermark (``getCurrentWatermarkMs``) is true UTC epoch. The bridge
between the two clocks is :func:`boundary_close_us`: the UTC instant at
which a LOCAL wall-clock boundary is irrevocably past, computed from the
same Python tz database — DST-exact, including the fall-back hour where a
local boundary maps to two instants (the max is the close).

The residual assumption is Python↔JVM tzdata agreement: Spark's
``withWatermark`` row-drop uses JVM zone rules while fold/close use Python
rules. Both ship the IANA database; on a single host or homogeneous
cluster they agree bit-exactly for modern dates, and a skewed pair could
only shift a day/bucket close by the disagreement at one DST transition.
Batch/stream equality additionally requires both to run under the SAME
session timezone — calendar days are inherently tz-dependent.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

import pandas as pd

DAY_US = 86_400_000_000
_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)
_US = _dt.timedelta(microseconds=1)

#: zone ids whose wall clock IS UTC year-round (fixed zero offset)
_UTC_ZONES = frozenset(
    {
        "UTC", "Etc/UTC", "GMT", "Etc/GMT", "GMT0", "Etc/GMT0", "Etc/GMT+0",
        "Etc/GMT-0", "Z", "+00:00", "UCT", "Etc/UCT", "Universal",
        "Etc/Universal", "Zulu", "Etc/Zulu", "Greenwich", "Etc/Greenwich",
    }
)

_OFFSET_RE = _re.compile(r"(?:GMT|UTC)?([+-])(\d{1,2}):(\d{2})(?::(\d{2}))?")


def tzinfo_of(tz: str) -> _dt.tzinfo:
    """Resolve a Spark session timeZone string to a Python tzinfo.

    Accepts IANA region ids (zoneinfo), fixed-offset forms (``+05:30``,
    ``GMT+8:00``), and the UTC aliases. Raises a loud ValueError for
    anything unresolvable — a stateful twin must never guess a zone."""
    if tz in _UTC_ZONES:
        return _dt.timezone.utc
    m = _OFFSET_RE.fullmatch(tz)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        delta = _dt.timedelta(
            hours=int(m.group(2)), minutes=int(m.group(3)), seconds=int(m.group(4) or 0)
        )
        return _dt.timezone(sign * delta)
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(tz)
    except Exception as exc:  # noqa: BLE001 - re-raise with the contract
        raise ValueError(
            f"stateful streaming twins cannot resolve session timezone {tz!r} "
            f"to Python tz rules; set spark.sql.session.timeZone to an IANA "
            f"zone id or a fixed offset"
        ) from exc


def session_tz(df) -> _dt.tzinfo:
    """The tzinfo the session's pandas-side naive timestamps are rendered
    in — capture at CONSTRUCTION so the closure clock matches the zone the
    plan was built under."""
    return tzinfo_of(df.sparkSession.conf.get("spark.sql.session.timeZone"))


def session_tz_name(df) -> str:
    """The raw conf string `session_tz` resolves — captured alongside the
    tzinfo so the executing stream can be checked against it (tz_guard)."""
    return df.sparkSession.conf.get("spark.sql.session.timeZone")


def guard_tz_chunks(pdfs, expected: str, col: str = "_tz"):
    """Yield micro-batch chunks after asserting the EXECUTING query's
    session timezone still matches the one the twin was constructed under
    (ADVICE r11): the fold clock (day_close_us etc.) is baked into the
    closure at construction, but the Arrow serializer renders timestamps
    under the conf in effect when the query STARTS — a
    spark.sql.session.timeZone change in between would silently skew every
    day close. The twins attach ``F.current_timezone()`` to their input
    (folded at micro-batch planning under the query's own conf snapshot,
    not the construction-time conf), so a mismatch surfaces here as a loud
    query failure on the first non-empty batch instead of wrong rows."""
    for pdf in pdfs:
        if len(pdf):
            got = str(pdf[col].iat[0])
            if got != expected:
                raise RuntimeError(
                    f"session timezone changed between stateful-twin "
                    f"construction ({expected!r}) and stream execution "
                    f"({got!r}); rebuild the twin under the executing "
                    f"session's spark.sql.session.timeZone"
                )
        yield pdf


def boundary_close_us(local_us: int, tz: _dt.tzinfo) -> int:
    """True-UTC epoch µs at which the local wall boundary ``local_us`` is
    irrevocably past: the max over PEP-495 folds of the boundary's instant.

    Fall-back (ambiguous boundary): the later mapping — rows from the
    repeated hour can arrive until the SECOND pass. Spring-forward gap
    (nonexistent boundary): both folds project into valid instants; the
    max is at or after the true supremum, so closing there is safe (a
    day/bucket may close at its exact end or a DST-hour later, never
    early). Fixed-offset zones reduce to one subtraction; UTC to identity.
    """
    if tz is _dt.timezone.utc:
        return local_us
    naive = _EPOCH_NAIVE + _dt.timedelta(microseconds=local_us)
    return max(
        local_us - naive.replace(tzinfo=tz, fold=fold).utcoffset() // _US
        for fold in (0, 1)
    )


def day_close_us(day: int, tz: _dt.tzinfo) -> int:
    """UTC close instant of local epoch day ``day`` (its next midnight)."""
    return boundary_close_us((day + 1) * DAY_US, tz)


def latest_closed_day(wm_us: int, tz: _dt.tzinfo) -> int:
    """Largest local epoch day whose close is at or below the watermark —
    the report-day frontier for the day-grained twins. Offsets are bounded
    by ±14 h, so the correction loops run at most twice."""
    d = wm_us // DAY_US + 1
    while day_close_us(d, tz) <= wm_us:
        d += 1
    while day_close_us(d, tz) > wm_us:
        d -= 1
    return d


def series_to_micros(s: pd.Series) -> pd.Series:
    """Timestamp series → int64 epoch microseconds OF THE SESSION-LOCAL
    WALL CLOCK (the serializer hands the twins session-local naive values,
    so ``// DAY_US`` of this is the local calendar day).

    Normalize to ns BEFORE the int cast: pandas 2.x may hand the Arrow
    batch over as datetime64[us], and a bare astype("int64") on that dtype
    would be off by 1000× (the r9 funnel-twin bug class — fix it here,
    once, for every stateful twin)."""
    return pd.to_datetime(s).astype("datetime64[ns]").astype("int64") // 1000


def accumulate_days(pdfs, buf: set[int], col: str = "t") -> None:
    """Fold each micro-batch's timestamps into ``buf`` as LOCAL epoch DAYS
    — the shared open-day-buffer prolog of the day-grained stateful twins."""
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        buf.update(int(d) for d in (series_to_micros(pdf[col]) // DAY_US))


def drain_closed_days(buf: set[int], wm_us: int, tz: _dt.tzinfo) -> list[int]:
    """Remove and return (ascending) every buffered local day whose UTC
    close is at or below the watermark — the buffer-below-watermark fold
    shared by the day-grained stateful twins. Local midnights are 23-25 h
    apart, so close order == day order and days still fold in event-time
    order (the cohort-min finality argument survives DST). Days still open
    to arrivals stay in ``buf``."""
    closed = [d for d in sorted(buf) if day_close_us(d, tz) <= wm_us]
    for d in closed:
        buf.discard(d)
    return closed
