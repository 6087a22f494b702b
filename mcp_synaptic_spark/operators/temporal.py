"""Temporal joins: as-of join and range join (beyond-reference tier).

The reference has no time-series operators (its closest notion is the TTL
sweep, operators/memory.py). These are the two standard event-pipeline
joins a training-data / analytics engine needs — e.g. attributing each
conversion event to the last preceding interaction, or aggregating the
interactions inside a trailing window — and neither exists as a Spark
built-in (SPARK-22947 never merged; vendors ship them as extensions).

Both are implemented shuffle-minimal:

- ``asof_join`` is the union-and-window form: tag the two inputs, union,
  ONE hash shuffle on the key, one in-partition sort, then a running
  ``last(..., ignorenulls=True)`` carries the most recent right-side row
  forward onto every left row. No join node at all — O(n log n) per key
  vs the O(n·m) a naive inequality join plans as, and at 100 TB the only
  data movement is the single exchange both inputs would need for ANY
  keyed join. Skewed keys behave like any keyed window (salt upstream if
  one user owns the partition).
- ``range_join_agg`` buckets time into window-sized bins so the
  inequality join becomes a (key, bucket) EQUI-join: each right row is
  exploded into the 2 buckets it can serve, candidates are pruned to the
  exact half-open interval by a compiled filter, and the per-left
  aggregate gets map-side partial combine. Candidate fan-out is bounded
  by events-per-(key, window), never by corpus size — the standard
  distributed range-join decomposition (cf. bucketed interval joins in
  Flink SQL / interval joins in KSQL).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEFT_TAG = "_asof_is_left"
_TIE = "_asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str | Sequence[str] = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = ("value",),
    right_tiebreak: str | None = None,
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: every left row gets the most recent right row
    with the same key and ``right.ts <= left.ts`` (``<`` when ``strict``),
    LEFT-join semantics (unmatched left rows keep nulls).

    Ties at equal right timestamps are broken toward the LARGEST
    ``right_tiebreak`` (deterministic; pass the right side's unique id).
    Matched right columns come back as ``{prefix}{col}`` plus
    ``{prefix}ts``.

    Physical shape: unionByName -> Exchange hashpartitioning(by) -> sort
    (ts, side, tiebreak) -> running window. One shuffle, no join operator,
    nothing quadratic anywhere in the plan.
    """
    keys = [by] if isinstance(by, str) else list(by)
    carry = [c for c in right_cols if c != right_ts]
    tie = F.col(right_tiebreak) if right_tiebreak else F.lit(0)

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
        F.lit(0).alias(_LEFT_TAG),
        tie.alias(_TIE),
    ).withColumn("_r_ts", F.col("_asof_ts"))
    l_cols = left.columns
    lf = (
        left.withColumn("_asof_ts", F.col(left_ts))
        .withColumn(_LEFT_TAG, F.lit(1))
        .withColumn(_TIE, F.lit(0))
    )
    u = lf.unionByName(r, allowMissingColumns=True)

    # At equal timestamps the right row must sort BEFORE the left row to be
    # visible (at-or-before); strict mode flips the side order so an
    # equal-ts right row is NOT visible. The tiebreak then makes the
    # surviving right row the max-id one, matching the oracle's
    # ORDER BY ts DESC, id DESC LIMIT 1.
    side_order = F.col(_LEFT_TAG).asc() if not strict else F.col(_LEFT_TAG).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").asc(), side_order, F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = F.col(_LEFT_TAG) == 0
    matched = u.select(
        "*",
        F.last(F.when(is_right, F.col("_r_ts")), ignorenulls=True).over(w).alias(f"{prefix}ts"),
        *[
            F.last(F.when(is_right, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in carry
        ],
    )
    return matched.where(F.col(_LEFT_TAG) == 1).select(
        *l_cols, f"{prefix}ts", *[f"{prefix}{c}" for c in carry]
    )


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str | Sequence[str] = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    left_id: str = "event_id",
    aggs: Sequence[tuple[str, str]] = (("count", "*"),),
) -> DataFrame:
    """Trailing-window range join + aggregate: for every left row,
    aggregate the right rows with the same key and
    ``right.ts in [left.ts - window, left.ts)`` (half-open — the left row
    itself is excluded even when both sides are one table).

    ``aggs`` is a list of ("count", "*") / ("sum", col) / ("max", col) /
    ("min", col) pairs; output columns are ``{agg}_{col}`` (``n_right``
    for the count). Sums run over DECIMAL(18,6) so the result is exact
    and independent of partitioning / addition order (a raw double sum
    hashes differently per engine), then cast back to double.

    Left rows with no right rows in range are KEPT (count 0, sums 0.0):
    the aggregate runs over the inner candidate pairs, then rejoins the
    left side. The rejoin ships only (left_id, aggregates) — never data
    rows.
    """
    keys = [by] if isinstance(by, str) else list(by)
    win = F.lit(window_seconds)
    # bucket on INTEGER microseconds, not a double division: epoch-seconds
    # doubles can round across a bucket boundary and silently drop a
    # boundary candidate; integer div is exact. (Truncates toward zero, so
    # pre-1970 timestamps would shift one bucket — out of scope for event
    # logs; the exact interval filter below never admits false positives
    # either way.)
    win_us = int(window_seconds) * 1_000_000

    lb = left.withColumn("_bkt", F.expr(f"unix_micros({left_ts}) div {win_us}"))
    # a right row in bucket b can serve left rows in buckets b and b+1
    rb = right.withColumn(
        "_bkt0", F.expr(f"unix_micros({right_ts}) div {win_us}")
    ).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_r_ts"),
        # alias agg inputs so a self-join (left and right from one table)
        # never leaves two attributes named `value` in scope
        *[F.col(c).alias(f"_r_{c}") for c in sorted({c for _, c in aggs if c != "*"})],
        F.explode(F.array(F.col("_bkt0"), F.col("_bkt0") + 1)).alias("_bkt"),
    )
    in_range = (F.col("_r_ts") >= F.col(left_ts) - F.make_interval(secs=win)) & (
        F.col("_r_ts") < F.col(left_ts)
    )
    pairs = lb.join(rb, [*keys, "_bkt"]).where(in_range)

    agg_exprs = []
    out_cols = []
    for fn, c in aggs:
        if fn == "count":
            agg_exprs.append(F.count(F.lit(1)).alias("n_right"))
            out_cols.append(("n_right", F.lit(0).cast("long")))
        elif fn == "sum":
            agg_exprs.append(
                F.sum(F.col(f"_r_{c}").cast("decimal(18,6)")).cast("double").alias(f"sum_{c}")
            )
            out_cols.append((f"sum_{c}", F.lit(0.0)))
        elif fn in ("max", "min"):
            agg_exprs.append(getattr(F, fn)(F.col(f"_r_{c}")).alias(f"{fn}_{c}"))
            out_cols.append((f"{fn}_{c}", F.lit(None)))
        else:  # pragma: no cover - caller error
            raise ValueError(f"unsupported agg {fn!r}")
    hits = pairs.groupBy(left_id).agg(*agg_exprs)

    return left.join(hits, left_id, "left").select(
        *left.columns, *[F.coalesce(F.col(name), default).alias(name) for name, default in out_cols]
    )


def rate_anomalies(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket: str = "hour",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Event-rate anomaly screen: bucket the stream per type, z-score each
    bucket's count against that type's own rate distribution, and flag
    |z| >= z_threshold.  The ops staple for catching a broken producer or
    a crawler loop before it poisons a 100 TB ingest.

    Output: (event_type, bucket_start, n_events, mean_events, z_score,
    is_anomaly).  z_score is NULL (and is_anomaly false) when a type has
    <2 buckets or zero variance.

    Physical shape: ONE event-volume shuffle and ONE scan — groupBy(type,
    bucket) with map-side partial count; the per-type moments are WINDOW
    aggregates over the tiny bucket table (exact integer power sums,
    bit-stable under any partitioning — the corpus_summary discipline).
    The window form matters: a groupBy-stats-then-join-back shape
    recomputes the bucket aggregation from the scan on both branches
    (measured: 2 scans, 3 exchanges), while the window reuses the one
    bucket table in place — 1 scan, 2 exchanges (the second over buckets,
    not events), 0 joins.  Variance math stays in ONE double expression
    shape mirrored by the oracle, so both engines run the identical IEEE
    operation sequence.
    """
    b = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("event_type")
    joined = (
        b.withColumn("c", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum("n_events").over(w))
        .withColumn("s2", F.sum(F.col("n_events") * F.col("n_events")).over(w))
    )
    mean = F.col("s1").cast("double") / F.col("c")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("c")
    ) / (F.col("c") - F.lit(1))
    z = F.when(
        (F.col("c") > 1) & (var > 0),
        (F.col("n_events") - mean) / F.sqrt(var),
    )
    return joined.select(
        "event_type",
        "bucket_start",
        "n_events",
        F.round(mean, 6).alias("mean_events"),
        F.round(z, 6).alias("z_score"),
        F.coalesce(F.abs(z) >= F.lit(z_threshold), F.lit(False)).alias("is_anomaly"),
    )
