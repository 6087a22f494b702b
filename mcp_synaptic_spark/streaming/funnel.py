"""Streaming twin of operators/funnel.funnel (beyond-reference §2.10 tier).

Exact event-time funnel over an events stream.  The batch operator's chain
fold is order-sensitive, so the streaming form cannot just fold events as
they arrive (a late-but-in-watermark step-1 event would be mis-ordered
behind an already-folded step-2 event).  access_log.replay_access_stream
documents that gap and defers it to "a watermark-delayed sort upstream";
this operator implements exactly that discipline inside the state:

- new events land in a per-user BUFFER held in state (µs + step arrays);
- only events strictly below the current watermark are folded — in event-
  time order — into the reached-timestamps chain (same semantics as
  operators/funnel.py: earliest qualifying completion, inclusive horizon);
- an EVENT-TIME TIMEOUT is armed at the earliest still-buffered event, so
  the group is re-invoked and flushed when the watermark passes it even if
  the user never sends another event.  The watermark itself advances with
  step-typed traffic from ANY user (non-step types are pruned at the scan,
  below the watermark node — see the inline note).

Spark drops input rows older than the watermark before they reach a
stateful operator, which is what makes fold-below-watermark exact: nothing
can arrive behind the fold point, so the folded prefix of each user's
timeline is final.  Bounded out-of-order arrival (within the watermark
delay) therefore yields bit-identical chains to the batch operator.

Scale: state per user is k chain slots plus the buffer of events inside
the watermark delay — bounded by per-user activity within the lateness
window, never by history; the only shuffle is the groupBy(user) the
operator needs anyway, and the RocksDB state store carries the key count.

Timezone model (r11, replaces the r10 UTC-only guard): the fold runs on
the JVM-computed unix_micros column — true UTC epoch, the same clock as
the watermark — so ordering, horizon arithmetic, and the fold point are
exact under ANY session timezone, including the fall-back hour where the
session-local wall clock's order inverts against instant order (pinned by
the NYC test).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.funnel import _horizon_seconds

OUTPUT_SCHEMA = T.StructType(
    [
        # NULL user keys are FILTERED before the groupBy (matching the
        # batch twin's user_chain_times guard — ADVICE r9), so the
        # nullability here is only schema conservatism, never a live group.
        T.StructField("key", T.StringType(), True),
        T.StructField("steps_reached", T.IntegerType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("reached", T.ArrayType(T.LongType(), True), True),
        T.StructField("buf_t", T.ArrayType(T.LongType(), False), True),
        T.StructField("buf_s", T.ArrayType(T.IntegerType(), False), True),
    ]
)


def funnel_updates_stream(
    events_stream: DataFrame,
    *,
    steps: Sequence[str],
    by: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    horizon: str | int = "1d",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(key, steps_reached) update rows per user per invocation;
    steps_reached is monotone non-decreasing, so the latest row per key is
    the user's current funnel depth and a per-step user count is
    ``count(steps_reached >= j)`` over the latest rows."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    k = len(steps)
    h_us = _horizon_seconds(horizon) * 1_000_000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            reached_raw, buf_t, buf_s = state.get
            reached = [None if pd.isna(v) else int(v) for v in reached_raw]
            pending = list(zip((int(t) for t in buf_t), (int(s) for s in buf_s)))
        else:
            reached = [None] * k
            pending = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # tu is JVM-computed unix_micros: TRUE UTC epoch, the same clock
            # as the watermark — exact under any session tz, and instant
            # ordering (the fold order the batch operator's sort uses)
            # survives the fall-back hour where local wall order inverts
            pending.extend(zip((int(t) for t in pdf["tu"]), (int(s) for s in pdf["s"])))

        wm_us = state.getCurrentWatermarkMs() * 1000
        pending.sort()
        hold = []
        for t, s in pending:
            if t >= wm_us:
                hold.append((t, s))
                continue
            # the batch fold, one event at a time: slot s fires iff unset
            # and (first step, or previous slot reached within the horizon)
            if reached[s] is None and (
                s == 0
                or (
                    reached[s - 1] is not None
                    and reached[s - 1] <= t <= reached[s - 1] + h_us
                )
            ):
                reached[s] = t

        state.update((reached, [t for t, _ in hold], [s for _, s in hold]))
        if hold:
            # flush guarantee: re-invoke this group once the watermark passes
            # the earliest buffered event (must be strictly ahead of the
            # current watermark or Spark rejects the timestamp)
            state.setTimeoutTimestamp(
                max(hold[0][0] // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        depth = 0
        for r in reached:
            if r is None:
                break
            depth += 1
        yield pd.DataFrame({"key": [key[0]], "steps_reached": [depth]})

    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )[F.col(event_col)]
    # Watermark contract: event time advances with STEP-TYPED traffic only.
    # Catalyst splits and pushes the step filter below the watermark node
    # (and into the source scan — a scale win: non-step rows are pruned at
    # the parquet scan and never shuffle), so EventTimeWatermarkExec's
    # stats see the filtered stream. That is the standard watermark
    # contract for filtered stateful pipelines; attempts to smuggle
    # non-step rows past the filter for watermark purposes are defeated by
    # predicate pushdown (verified against the parquet file source), so we
    # document the contract instead of fighting the optimizer.
    ev = (
        events_stream.withWatermark(ts_col, watermark_delay)
        .where(
            F.col(event_col).isin(list(steps))
            & F.col(ts_col).isNotNull()
            # NULL user keys dropped, matching the batch twin (ADVICE r9:
            # a NULL pseudo-user's mixed events could jointly complete a
            # chain neither form should count)
            & F.col(by).isNotNull()
        )
        .select(
            F.col(by).cast("string").alias("key"),
            # t carries the watermark metadata; tu is the JVM-computed true
            # UTC epoch µs the fold actually uses (r11 tz-general fix: the
            # serializer renders t session-local, which skews against the
            # UTC watermark under any non-UTC zone)
            F.col(ts_col).alias("t"),
            F.unix_micros(F.col(ts_col)).alias("tu"),
            step_idx.alias("s"),
        )
    )
    return ev.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
