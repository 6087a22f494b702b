"""Streaming twin of operators/drift.categorical_drift: per-window bucket
mixes, final on emission, with PSI-vs-baseline as the live view.

Unlike the funnel/retention/anomaly twins this one needs NO custom state
machine: a tumbling event-time window + watermark + append output mode IS
the buffer-below-watermark discipline — Spark emits a (window, bucket)
count exactly once, when the window closes below the watermark, and late
rows inside the delay fold into the still-open window first.  That is the
whole point of expressing the operator Spark-first: the streaming
semantics fall out of the built-in windowed aggregation.

The PSI assembly stays downstream (the twin convention — retention's live
triangle, funnel's max-depth view): each emitted window's mix is compared
against a FIXED baseline mix with the same epsilon-clamped formula the
batch operator uses, via ``psi_vs_baseline`` — an ordinary batch
computation over the sink, reusing operators/drift.py semantics verbatim,
so stream==batch is testable per closed window.

At scale: the streaming state is |open windows| × |buckets| rows (domain-
bounded), the shuffle is map-side-partial counts, and the baseline is a
broadcast — the same envelope as the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.drift import EPS, NULL_BUCKET


def windowed_bucket_counts_stream(
    events_stream: DataFrame,
    *,
    value_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 day",
    slide: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, bucket, n) append rows — one per
    (window, category), emitted exactly once when the window closes below
    the watermark.  ``slide`` (≤ window: Spark's analyzer itself rejects a
    larger slide with PARAMETER_CONSTRAINT_VIOLATION, so gapped/sampling
    windows cannot be constructed silently — verified r10) turns the
    tumbling window into a sliding one — ROLLING drift, each event counted in window/slide
    overlapping mixes, the way a dashboard watches "last 24 h drift every
    hour"; the exactly-once-per-(window, bucket) contract is unchanged
    because emission is still on window close.  NULL categories fold into
    the batch twin's '(null)' bucket; NULL timestamps are dropped (no
    window)."""
    ev = (
        events_stream.withWatermark(ts_col, watermark_delay)
        .where(F.col(ts_col).isNotNull())
        .select(
            F.col(ts_col).alias("_t"),
            F.coalesce(F.col(value_col).cast("string"), F.lit(NULL_BUCKET)).alias(
                "bucket"
            ),
        )
    )
    win = F.window("_t", window, slide) if slide else F.window("_t", window)
    return (
        ev.groupBy(win.alias("w"), "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n",
        )
    )


def psi_vs_baseline(window_counts: DataFrame, baseline: DataFrame, *, value_col: str) -> DataFrame:
    """The live view: PSI of each emitted window's bucket mix against a
    fixed baseline snapshot — (window_start, bucket, n, frac_w, frac_base,
    psi), one row per (window, bucket) present in EITHER side (a bucket
    absent from one side gets the eps-clamped zero fraction, the batch
    operator's treatment of new/vanished categories).  Baseline fractions
    ride a broadcast of the (tiny, domain-bounded) baseline mix; window
    fractions are a window sum over the per-window bucket rows.  Batch
    computation over the sink — run it on the memory/Delta table the
    stream writes."""
    from pyspark.sql import Window

    base = (
        baseline.select(
            F.coalesce(F.col(value_col).cast("string"), F.lit(NULL_BUCKET)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    tot_b = Window.partitionBy()
    base = base.withColumn("_tot_b", F.sum("n_base").over(tot_b))

    wins = window_counts.select("window_start").distinct()
    # every (window, bucket-of-either-side) pair: windows × baseline buckets
    # unioned with the observed rows, zero-filled — both sides tiny
    grid = (
        wins.crossJoin(F.broadcast(base.select("bucket")))
        .unionByName(window_counts.select("window_start", "bucket"))
        .distinct()
    )
    w_tot = Window.partitionBy("window_start")
    joined = (
        grid.join(window_counts, ["window_start", "bucket"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn("_tot_w", F.sum("n").over(w_tot))
        .join(F.broadcast(base), ["bucket"], "left")
        .withColumn("n_base", F.coalesce(F.col("n_base"), F.lit(0)))
    )
    # a window with rows always has _tot_w > 0; _tot_b comes from the
    # baseline broadcast (left join can NULL it only for stream-only
    # buckets — re-attach the global total)
    tot_b_val = F.first("_tot_b", ignorenulls=True).over(Window.partitionBy())
    joined = joined.withColumn("_tot_b", F.coalesce(F.col("_tot_b"), tot_b_val))
    # try_divide for ANSI safety (degenerate empty sides → NULL → EPS clamp)
    frac_w = F.greatest(F.try_divide(F.col("n"), F.col("_tot_w")), F.lit(EPS))
    frac_b = F.greatest(F.try_divide(F.col("n_base"), F.col("_tot_b")), F.lit(EPS))
    return joined.select(
        "window_start",
        "bucket",
        "n",
        F.round(frac_w, 6).alias("frac_w"),
        F.round(frac_b, 6).alias("frac_base"),
        F.round((frac_w - frac_b) * F.log(frac_w / frac_b), 6).alias("psi"),
    ).orderBy("window_start", "bucket")
