"""Streaming twin of operators/retention.cohort_retention (beyond-reference
§2.10 tier): append-mode cohort/offset contributions.

The batch triangle is order-insensitive EXCEPT for the cohort day (the
per-user min): a late-but-in-watermark earlier day would shift the cohort
and invalidate every previously-emitted offset for that user.  The
buffer-below-watermark discipline makes the min final instead: a user's
days fold only once the WHOLE day is below the watermark (day end ≤ wm),
in event-time order, and Spark's late-row drop guarantees nothing older
can still arrive — so the FIRST day a user ever folds is provably their
minimum, and each (user, cohort_day, day_offset) row is emitted exactly
once, final on emission.  Downstream, the live triangle is just

    SELECT cohort_day, day_offset, count(*) FROM updates GROUP BY 1, 2

— an ordinary streaming aggregation over this operator's append output.
Streaming DAU falls out of the same rows for free (each is one distinct
(user, active-day) pair, final on emission):

    SELECT date_add(cohort_day, day_offset) AS day, count(*) AS dau
    FROM updates GROUP BY 1

State per user: the folded cohort day + the set of already-emitted offsets
(calendar-bounded, the batch operator's own skew envelope) + the buffer of
still-open days inside the lateness window.  Per-micro-batch days pre-fold
in Arrow, so state writes are O(days), not O(events).  An event-time
timeout armed at the earliest open day's end flushes quiet users.

Timezone model (r11, replaces the r10 UTC-only guard): days are
SESSION-LOCAL calendar days — the serializer hands pandas session-local
wall times, matching the batch twin's to_date — and a day closes when the
true-UTC instant of its next LOCAL midnight passes the watermark
(_pandas.day_close_us, DST-exact via the same Python tz database the
serializer converts with; see _pandas' module docstring for the
Python↔JVM tzdata-agreement assumption).  Local midnights are 23-25 h
apart, so days still fold in event-time order and every finality argument
below survives non-UTC sessions — pinned by the NYC spring-forward /
fall-back stream==batch tests.  stream==batch holds per session tz; the
two sides must run under the same zone.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ._pandas import (
    DAY_US as _DAY_US,
    accumulate_days,
    day_close_us,
    drain_closed_days,
    guard_tz_chunks,
    latest_closed_day,
    session_tz,
    session_tz_name,
)

OUTPUT_SCHEMA = T.StructType(
    [
        # NULL user keys are FILTERED before the groupBy (matching the batch
        # twin: cohort_retention._activity drops them — ADVICE r9), so the
        # nullability here is only schema conservatism, never a live group.
        T.StructField("key", T.StringType(), True),
        T.StructField("cohort_day", T.DateType(), False),
        T.StructField("day_offset", T.IntegerType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cohort", T.LongType(), True),          # epoch day
        T.StructField("emitted", T.ArrayType(T.IntegerType(), False), True),
        T.StructField("buf", T.ArrayType(T.LongType(), False), True),
    ]
)

AU_OUTPUT_SCHEMA = T.StructType(
    [
        # NULL user keys are filtered (matching the batch twin's _activity)
        T.StructField("key", T.StringType(), True),
        T.StructField("day", T.DateType(), False),
        T.StructField("is_active_day", T.BooleanType(), False),
    ]
)

AU_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_rday", T.LongType(), True),       # epoch day
        T.StructField("folded", T.ArrayType(T.LongType(), False), True),
        T.StructField("buf", T.ArrayType(T.LongType(), False), True),
    ]
)


def retention_updates_stream(
    events_stream: DataFrame,
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(key, cohort_day, day_offset) append rows — one per (user, active
    day), final on emission; day granularity. Days are SESSION-LOCAL
    calendar days (matching the batch twin's to_date under the session
    zone); a day folds once its OWN local midnight's UTC instant passes
    the watermark (_pandas.day_close_us — DST-exact, so the fold stays
    event-time-ordered and the cohort-min argument survives non-UTC
    sessions)."""
    tz_name = session_tz_name(events_stream)
    tz = session_tz(events_stream)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cohort, emitted_raw, buf_raw = state.get
            cohort = None if cohort is None or pd.isna(cohort) else int(cohort)
            emitted = set(int(e) for e in emitted_raw)
            buf = set(int(b) for b in buf_raw)
        else:
            cohort, emitted, buf = None, set(), set()
        accumulate_days(guard_tz_chunks(pdfs, tz_name), buf)

        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        for d in drain_closed_days(buf, wm_us, tz):
            if cohort is None:
                cohort = d  # provably the min: older rows can no longer arrive
            off = d - cohort
            if off not in emitted:
                emitted.add(off)
                out.append((key[0], pd.Timestamp(cohort * _DAY_US, unit="us").date(), off))

        state.update((cohort, sorted(emitted), sorted(buf)))
        if buf:
            state.setTimeoutTimestamp(
                max(day_close_us(min(buf), tz) // 1000,
                    state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=["key", "cohort_day", "day_offset"])

    ev = (
        events_stream.withWatermark(ts_col, watermark_delay)
        .where(F.col(ts_col).isNotNull() & F.col(by).isNotNull())
        .select(
            F.col(by).cast("string").alias("key"),
            F.col(ts_col).alias("t"),
            # evaluated under the QUERY's conf snapshot at micro-batch
            # planning — guard_tz_chunks compares it to tz_name (ADVICE r11)
            F.current_timezone().alias("_tz"),
        )
    )
    return ev.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def active_users_updates_stream(
    events_stream: DataFrame,
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of operators/retention.rolling_active_users
    (VERDICT r9 next-round #4): append rows (key, day, is_active_day) —
    one per (user, report day) where the user was active within the
    trailing ``window_days``-day window ending at ``day``; is_active_day
    marks the user's OWN activity days.  Each row is emitted exactly once,
    final on emission, so the live (day, dau, rolling_au) view is an
    ordinary streaming aggregation over this output:

        SELECT day,
               count_if(is_active_day)  AS dau,
               count(*)                 AS rolling_au
        FROM updates GROUP BY day HAVING dau > 0

    (the HAVING is the batch twin's observed-day clamp).

    Finality argument: a report day r is emitted only once r itself has
    closed (day end ≤ watermark) — by then every activity day d ≤ r has
    folded (days fold in event-time order under the buffer-below-watermark
    discipline and Spark drops sub-watermark arrivals), so both "was u
    active in (r-w, r]" and "was u active ON r" are provably final.  This
    is the same emission discipline as retention_updates_stream, which is
    why DAU also falls out of THAT operator's rows for free (commit note,
    r9); this twin additionally carries the rolling-window membership the
    batch operator reports.

    State per user: the last emitted report day, the folded activity days
    still inside the trailing window (≤ window_days of them after
    pruning), and the open-day buffer inside the lateness window — all
    calendar-bounded, never event-bounded; per-micro-batch days pre-fold
    in Arrow so state writes are O(days).  A user whose window has fully
    drained and whose buffer is empty has their state REMOVED (a returning
    user re-seeds safely: new folds sit above the old watermark, so new
    report days are strictly later than anything already emitted).  An
    event-time timeout armed at the next pending day boundary flushes
    quiet users."""
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    w = window_days

    tz_name = session_tz_name(events_stream)
    tz = session_tz(events_stream)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_raw, folded_raw, buf_raw = state.get
            last = None if last_raw is None or pd.isna(last_raw) else int(last_raw)
            folded = set(int(x) for x in folded_raw)
            buf = set(int(x) for x in buf_raw)
        else:
            last, folded, buf = None, set(), set()
        accumulate_days(guard_tz_chunks(pdfs, tz_name), buf)

        wm_us = state.getCurrentWatermarkMs() * 1000
        # newest closed report day (r closed iff day_close_us(r) ≤ wm —
        # the same DST-exact clock the fold below uses)
        closed_frontier = latest_closed_day(wm_us, tz)
        folded.update(drain_closed_days(buf, wm_us, tz))

        out = []
        if folded:
            start = min(folded) if last is None else last + 1
            horizon = max(folded) + w - 1  # last report day this fold set touches
            fs = sorted(folded)
            lo, n = 0, len(fs)
            # two-pointer sweep (ADVICE r10): lo tracks the first folded day
            # inside the trailing window (r-w, r]; each fold index advances
            # past lo at most once across the whole sweep, so a backfill
            # replay that jumps the watermark by D days costs O(D + |folded|),
            # not O(D · |folded|)
            for r in range(start, min(closed_frontier, horizon) + 1):
                while lo < n and fs[lo] <= r - w:
                    lo += 1
                if lo < n and fs[lo] <= r:
                    out.append(
                        (key[0], pd.Timestamp(r * _DAY_US, unit="us").date(), r in folded)
                    )
            # closed days beyond the horizon hold no contribution — jump the
            # frontier to the newest closed day (future folds close strictly
            # later, so their report days are strictly later; no emission is
            # lost)
            if closed_frontier > (last if last is not None else start - 1):
                last = closed_frontier
            if last is not None:
                # the next report day is last+1; it needs d > last+1-w
                folded = {d for d in folded if d > last + 1 - w}

        if not folded and not buf:
            state.remove()
        else:
            state.update((last, sorted(folded), sorted(buf)))
            pending = []
            if buf:
                pending.append(day_close_us(min(buf), tz) // 1000)
            if folded:
                # folded non-empty ⟹ last was set when its days closed, and
                # the prune keeps only d > last+1-w ⟹ max(folded)+w-1 > last:
                # the next report day (last+1) always has a pending
                # contribution — arm its day-end (r10 review: the previous
                # extra guards here were provably always-true/unreachable)
                pending.append(day_close_us(last + 1, tz) // 1000)
            if pending:
                state.setTimeoutTimestamp(
                    max(min(pending), state.getCurrentWatermarkMs() + 1)
                )
        if out:
            yield pd.DataFrame(out, columns=["key", "day", "is_active_day"])

    ev = (
        events_stream.withWatermark(ts_col, watermark_delay)
        .where(F.col(ts_col).isNotNull() & F.col(by).isNotNull())
        .select(
            F.col(by).cast("string").alias("key"),
            F.col(ts_col).alias("t"),
            F.current_timezone().alias("_tz"),  # see retention twin note
        )
    )
    return ev.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=AU_OUTPUT_SCHEMA,
        stateStructType=AU_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
