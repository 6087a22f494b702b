"""Event funnel analysis (beyond-reference tier).

The reference's event surface is a raw SSE feed (reference
``mcp_synaptic/sse/`` — emit-only, no analytics); the engine already
derives windowed/sessionized aggregates from the events table
(streaming/windows.py).  This adds the other staple of event analytics:
the **ordered conversion funnel** — how many users performed step 1,
then step 2 within a horizon of their step-1 time, then step 3 within a
horizon of that, and so on.

Semantics (the standard "earliest qualifying completion" chain):

    t_1(u) = min ts of a step-1 event by u
    t_j(u) = min ts of a step-j event by u with
             t_{j-1} <= ts <= t_{j-1} + horizon

A user counts for step j iff t_j exists.  Boundary times are inclusive;
a later step may share the exact timestamp of the previous one.

Physical shape — ONE shuffle, no joins: filter to the step types
(pushable to the scan), hash-shuffle on the user key, per-user
sort_array + a single ``aggregate`` fold over (ts, step) pairs that
carries the k reached-timestamps as the accumulator, then a global
count per slot.  The naive relational form is k-1 self-joins of the
events table (the oracle twin runs exactly that); at 100 TB the fold
form moves each event across the wire once and keeps all chain logic in
whole-stage-codegen higher-order functions.  Skew bound: one user's
step-typed events must fit a collected array — bounded by per-user
activity, never corpus size (the same envelope as any sessionization).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ttl import _UNIT_SECONDS


def _horizon_seconds(horizon: str | int) -> int:
    """'90'/'15m'/'1h'/'1d' -> whole seconds (same unit table as
    functions/ttl.py:parse_ttl, parsed driver-side)."""
    if isinstance(horizon, int):
        return horizon
    m = re.fullmatch(r"\s*(\d+)\s*([smhdw]?)\s*", horizon.lower())
    if not m:
        raise ValueError(f"unparseable horizon {horizon!r}")
    return int(m.group(1)) * _UNIT_SECONDS.get(m.group(2), 1)


def user_chain_times(
    events: DataFrame,
    *,
    steps: Sequence[str],
    by: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    horizon: str | int = "1d",
) -> DataFrame:
    """Per-user chain state: (u, r) where r[j] is the user's earliest
    qualifying step-j+1 timestamp (NULL once the chain breaks) — the
    shared fold behind `funnel` (counts) and `conversion_lags`
    (per-user latency)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    k = len(steps)
    h_s = _horizon_seconds(horizon)
    # the chain works entirely in the column's own timestamp domain
    # (TIMESTAMP or TIMESTAMP_NTZ): comparisons and day-time-interval
    # addition are exact and timezone-free — no epoch cast that would tie
    # results to the session timezone (the zone-map lesson, ADVICE r8).
    itv = F.make_dt_interval(F.lit(h_s // 86400), F.lit(0), F.lit(0), F.lit(h_s % 86400))

    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )[F.col(event_col)]
    # NULL user keys are dropped (as retention._activity does): without the
    # guard every anonymous event collapses into one pseudo-user whose mixed
    # events can jointly complete a chain — and the relational form (the
    # oracle's k-1 self-JOINs USING the user key) drops NULLs after step 1
    # anyway, so keeping them would diverge the two forms (ADVICE r9).
    ev = (
        events.where(
            F.col(event_col).isin(list(steps))
            & F.col(ts_col).isNotNull()
            & F.col(by).isNotNull()
        )
        .select(
            F.col(by).alias("u"),
            F.col(ts_col).alias("t"),
            step_idx.alias("s"),
        )
    )
    ts_type = ev.schema["t"].dataType
    # sort key (t, s): at equal timestamps the earlier step folds first, so
    # an equal-time later step still satisfies ts >= t_{j-1} (inclusive
    # boundary, matching the relational form).
    per_user = ev.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("t", "s"))).alias("evs")
    )

    init = F.array(*[F.lit(None).cast(ts_type) for _ in range(k)])

    def _fold(acc, e):
        def _slot(v, j):
            prev = F.get(acc, j - 1)  # null-safe 0-based get; j==0 unused
            return F.coalesce(
                v,
                F.when((e["s"] == j) & (j == F.lit(0)), e["t"]).when(
                    (e["s"] == j)
                    & (j > F.lit(0))
                    & prev.isNotNull()
                    & (e["t"] >= prev)
                    & (e["t"] <= prev + itv),
                    e["t"],
                ),
            )

        return F.transform(acc, _slot)

    return per_user.select(F.col("u"), F.aggregate("evs", init, _fold).alias("r"))


def funnel(
    events: DataFrame,
    *,
    steps: Sequence[str],
    by: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    horizon: str | int = "1d",
) -> DataFrame:
    """Per-step funnel counts: (step, step_name, n_users, frac_of_first),
    one row per step in order, frac_of_first = n_users / step-1 users
    rounded to 6 (NULL when step 1 is empty)."""
    k = len(steps)
    reached = user_chain_times(
        events, steps=steps, by=by, ts_col=ts_col, event_col=event_col,
        horizon=horizon,
    ).select("r")
    counts = reached.agg(
        *[F.count(F.get("r", j)).alias(f"c{j}") for j in range(k)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(j + 1).alias("step"),
                F.lit(steps[j]).alias("step_name"),
                F.col(f"c{j}").alias("n_users"),
                F.round(
                    F.col(f"c{j}") / F.when(F.col("c0") > 0, F.col("c0")), 6
                ).alias("frac_of_first"),
            )
            for j in range(k)
        ]
    )
    return counts.select(F.explode(rows).alias("x")).select("x.*")


def conversion_lags(
    events: DataFrame,
    *,
    steps: Sequence[str],
    by: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    horizon: str | int = "1d",
) -> DataFrame:
    """Per completing user, the latency of each chain hop and end-to-end:
    (user, lag_us_1 .. lag_us_{k-1}, lag_us_total), microsecond longs —
    the time-to-convert distribution behind every funnel chart.  Only
    users who reach the FINAL step appear.  Same single user-keyed shuffle
    as `funnel` (the shared fold); lags are timestamp differences in
    microseconds, so they are timezone-free and integer-exact."""
    k = len(steps)
    if k < 2:
        raise ValueError("conversion lags need at least 2 steps")
    chain = user_chain_times(
        events, steps=steps, by=by, ts_col=ts_col, event_col=event_col,
        horizon=horizon,
    )
    t = [F.unix_micros(F.get("r", j)) for j in range(k)]
    return chain.where(F.get("r", k - 1).isNotNull()).select(
        F.col("u").alias(by),
        *[(t[j + 1] - t[j]).alias(f"lag_us_{j + 1}") for j in range(k - 1)],
        (t[k - 1] - t[0]).alias("lag_us_total"),
    )
