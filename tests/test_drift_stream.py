"""Streaming drift twin (streaming/drift.py): tumbling-window bucket
mixes final on emission, PSI live view == batch categorical_drift."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators.drift import categorical_drift
from mcp_synaptic_spark.streaming.drift import (
    psi_vs_baseline,
    windowed_bucket_counts_stream,
)

from stream_utils import replayed_stream

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _run(spark, tmp_path, batches, **kw):
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    name = f"drift_stream_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        windowed_bucket_counts_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_window_counts_emit_once_and_fold_late_rows(spark, tmp_path):
    """A late-but-in-watermark row folds into its still-open window; each
    (window, bucket) emits exactly once with the full count."""
    batches = [
        [(1, _ts(1, 2), "view"), (2, _ts(1, 3), "click"), (3, _ts(2, 1), "view")],
        [(4, _ts(1, 9), "view")],                       # late day-1, within delay
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],  # advance + flush
    ]
    out = _run(
        spark, tmp_path, batches, window="1 day", watermark_delay="2 days"
    )
    day1 = {r.bucket: r.n for r in out if r.window_start.day == 1}
    assert day1 == {"view": 2, "click": 1}  # the late view is in the count
    keys = [(r.window_start, r.bucket) for r in out]
    assert len(keys) == len(set(keys))  # exactly once


def test_null_category_folds_to_null_bucket(spark, tmp_path):
    batches = [
        [(1, _ts(1), None), (2, _ts(1), "view")],
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],
    ]
    out = {r.bucket: r.n for r in _run(
        spark, tmp_path, batches, window="1 day", watermark_delay="0 seconds"
    ) if r.window_start.day == 1}
    assert out == {"(null)": 1, "view": 1}


def test_psi_view_matches_batch_categorical_drift(spark, tmp_path):
    """Per closed window, the PSI live view over the sink equals the batch
    categorical_drift of that window's slice against the baseline —
    including buckets present only in the baseline (eps-clamped) and only
    in the stream (new category)."""
    day1 = [(i, _ts(1, i % 20), ["view", "click", "buy"][i % 3]) for i in range(30)]
    day2 = [(i, _ts(2, i % 20), ["view", "signup"][i % 2]) for i in range(20)]
    batches = [day1, day2, [(9, _ts(20), "view")], [(9, _ts(28), "view")]]
    rows = _run(spark, tmp_path, batches, window="1 day", watermark_delay="0 seconds")
    sink = spark.createDataFrame(
        [(r.window_start, r.window_end, r.bucket, r.n) for r in rows],
        "window_start timestamp, window_end timestamp, bucket string, n long",
    ).where(F.dayofmonth("window_start") <= 2)

    baseline = spark.createDataFrame(
        [("view",), ("click",), ("buy",), ("rare",)] * 5, "event_type string"
    )
    view = psi_vs_baseline(sink, baseline, value_col="event_type").collect()

    for day, slice_rows in ((1, day1), (2, day2)):
        got = {
            r.bucket: (r.n, r.frac_w, r.frac_base, r.psi)
            for r in view
            if r.window_start.day == day
        }
        slice_df = spark.createDataFrame(slice_rows, SCHEMA).select(
            F.col("event_type")
        )
        batch = {
            r.bucket: (r.n_a, r.frac_a, r.frac_b, r.psi)
            for r in categorical_drift(
                slice_df, baseline, value_col="event_type"
            ).collect()
        }
        assert got == batch, day


def test_sliding_windows_roll_the_mix(spark, tmp_path):
    """slide < window: each event lands in window/slide overlapping mixes
    (rolling drift), still exactly once per (window, bucket)."""
    batches = [
        [(1, _ts(1, 6), "view"), (2, _ts(2, 6), "click")],
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],
    ]
    out = _run(
        spark, tmp_path, batches,
        window="2 days", slide="1 day", watermark_delay="0 seconds",
    )
    # the day-1 view appears in the windows starting day 0 and day 1;
    # the day-2 click in those starting day 1 and day 2
    by_win = {}
    for r in out:
        if r.window_start < dt.datetime(2024, 1, 3):  # data windows (first starts Dec 31)
            by_win.setdefault(r.window_start.day, {})[r.bucket] = r.n
    assert by_win[1] == {"view": 1, "click": 1}  # overlap window holds both
    assert sum(n for mix in by_win.values() for n in mix.values()) == 4  # 2 events x 2 windows
    keys = [(r.window_start, r.bucket) for r in out]
    assert len(keys) == len(set(keys))


def test_psi_view_empty_baseline_degenerate(spark):
    """An EMPTY baseline must eps-clamp every stream bucket (max drift)
    instead of dividing by a zero/NULL total — batch-only check on the
    live-view helper."""
    sink = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), "view", 4)],
        "window_start timestamp, window_end timestamp, bucket string, n long",
    )
    baseline = spark.createDataFrame([], "event_type string")
    rows = psi_vs_baseline(sink, baseline, value_col="event_type").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.bucket, r.n, r.frac_w) == ("view", 4, 1.0)
    assert r.frac_base == 1e-06 and r.psi > 10
