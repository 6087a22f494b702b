"""Streaming twin of operators/temporal.rate_anomalies (beyond-reference
§2.10 tier): prequential event-rate anomaly detection.

The batch operator z-scores every bucket against the WHOLE history —
including buckets that come after it.  A stream cannot know the future, so
the streaming form is the standard prequential variant: each completed
bucket is scored against the moments of the buckets COMPLETED BEFORE it,
then folded into the moments.  First two buckets of a type are unscored
(z NULL) — a sample stddev needs two prior points.

Exactness discipline (same as streaming/funnel.py): per-type state holds
the running moments (c, s1, s2) plus a BUFFER of per-bucket partial counts
still inside the watermark delay; only buckets whose END is at or below
the current watermark are finalized — in event-time order — because
Spark's late-row drop guarantees nothing older can still arrive.  An
event-time timeout armed at the earliest buffered bucket's end flushes
quiet types when the watermark passes.  Bounded out-of-order arrival
(within the delay) therefore yields bit-identical output to an ordered
replay — pinned by the late-reorder test.

Scale: state per type = 3 longs + the buckets inside the lateness window
(bounded by delay/bucket, never by history); the only shuffle is the
groupBy(type) any per-type aggregation needs.  Bucket partial counts are
pre-aggregated per micro-batch by the Arrow fold, so state writes are
O(buckets), not O(events).

Timezone model (r11): buckets are OFFSET-PRESERVING truncations of the
event instant — u − (local mod bucket), where local is the serializer's
session-local wall clock and u the JVM-computed unix_micros — which is
exactly the batch operator's date_trunc grid (java.time truncatedTo keeps
the instant's zone offset, so a fall-back hour's two passes are two
distinct bucket instants rendering the same wall time; pinned by the NYC
test).  Every row of bucket b has u < b + bucket, so closure and timeouts
are pure UTC arithmetic against the watermark under ANY session zone.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ._pandas import series_to_micros

OUTPUT_SCHEMA = T.StructType(
    [
        # nullable: a NULL type is a legitimate group (batch twin keeps it)
        T.StructField("event_type", T.StringType(), True),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("mean_prior", T.DoubleType(), True),
        T.StructField("z_score", T.DoubleType(), True),
        T.StructField("is_anomaly", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("c", T.LongType(), False),
        T.StructField("s1", T.LongType(), False),
        T.StructField("s2", T.LongType(), False),
        T.StructField("buf_b", T.ArrayType(T.LongType(), False), True),
        T.StructField("buf_n", T.ArrayType(T.LongType(), False), True),
    ]
)


def rate_anomalies_stream(
    events_stream: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_seconds: int = 3600,
    z_threshold: float = 3.0,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(event_type, bucket_start, n_events, mean_prior, z_score,
    is_anomaly) append rows, one per FINALIZED bucket, scored against the
    moments of that type's previously finalized buckets."""
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    b_us = bucket_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            c, s1, s2, buf_b, buf_n = state.get
            buf = dict(zip((int(b) for b in buf_b), (int(n) for n in buf_n)))
        else:
            c, s1, s2 = 0, 0, 0
            buf = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # OFFSET-PRESERVING truncation, the batch date_trunc semantics
            # (java.time truncatedTo keeps the instant's zone offset): the
            # bucket instant is u - (local mod b). The repeated fall-back
            # hour therefore stays TWO buckets (distinct instants rendering
            # the same wall time), exactly like the batch grid — pinned by
            # the NYC fall-back test. l is the serializer's session-local
            # wall clock, u the JVM unix_micros true epoch.
            l_us = series_to_micros(pdf["t"])
            u_us = pdf["tu"]
            for b, n in (u_us - (l_us % b_us)).value_counts().items():
                b = int(b)
                buf[b] = buf.get(b, 0) + int(n)

        wm_us = state.getCurrentWatermarkMs() * 1000
        out_rows = []
        for b in sorted(buf):
            # every row of bucket b has u = b + (local mod b_us) < b + b_us,
            # so the close test is pure UTC arithmetic — no tz rules needed
            if b + b_us > wm_us:
                continue  # bucket still open to late arrivals
            n = buf.pop(b)
            if c >= 2:
                mean = s1 / c
                var = (s2 - s1 * s1 / c) / (c - 1)
                z = (n - mean) / math.sqrt(var) if var > 0 else None
            else:
                mean = s1 / c if c else None
                z = None
            out_rows.append(
                (
                    key[0],
                    # tz-aware UTC: the exact bucket instant under any
                    # session zone (naive output would be re-localized)
                    pd.Timestamp(b, unit="us", tz="UTC"),
                    n,
                    round(mean, 6) if mean is not None else None,
                    round(z, 6) if z is not None else None,
                    bool(z is not None and abs(z) >= z_threshold),
                )
            )
            c, s1, s2 = c + 1, s1 + n, s2 + n * n

        state.update((c, s1, s2, list(buf), [buf[b] for b in buf]))
        if buf:
            # flush guarantee: fire when the watermark passes the earliest
            # still-open bucket's end (strictly ahead of current watermark)
            state.setTimeoutTimestamp(
                max(min(buf) // 1000 + bucket_seconds * 1000,
                    state.getCurrentWatermarkMs() + 1)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "event_type", "bucket_start", "n_events",
                    "mean_prior", "z_score", "is_anomaly",
                ],
            )

    ev = (
        events_stream.withWatermark(ts_col, watermark_delay)
        .where(F.col(ts_col).isNotNull())
        .select(
            F.col(type_col).cast("string").alias("key"),
            # t carries the watermark metadata and the session-local wall
            # clock; tu the true UTC epoch µs — their difference is the
            # per-row zone offset the truncation needs (r11 tz-general)
            F.col(ts_col).alias("t"),
            F.unix_micros(F.col(ts_col)).alias("tu"),
        )
    )
    return ev.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
