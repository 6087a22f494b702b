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
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ._pandas import series_to_micros

_DAY_US = 86_400_000_000

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


def retention_updates_stream(
    events_stream: DataFrame,
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(key, cohort_day, day_offset) append rows — one per (user, active
    day), final on emission; day granularity."""

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
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            buf.update(int(d) for d in (series_to_micros(pdf["t"]) // _DAY_US))

        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        for d in sorted(buf):
            if (d + 1) * _DAY_US > wm_us:
                break  # this day (and all later ones) still open to arrivals
            buf.discard(d)
            if cohort is None:
                cohort = d  # provably the min: older rows can no longer arrive
            off = d - cohort
            if off not in emitted:
                emitted.add(off)
                out.append((key[0], pd.Timestamp(cohort * _DAY_US, unit="us").date(), off))

        state.update((cohort, sorted(emitted), sorted(buf)))
        if buf:
            state.setTimeoutTimestamp(
                max((min(buf) + 1) * (_DAY_US // 1000),
                    state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=["key", "cohort_day", "day_offset"])

    ev = (
        events_stream.withWatermark(ts_col, watermark_delay)
        .where(F.col(ts_col).isNotNull() & F.col(by).isNotNull())
        .select(F.col(by).cast("string").alias("key"), F.col(ts_col).alias("t"))
    )
    return ev.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
