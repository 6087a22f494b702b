"""Streaming rate anomalies (streaming/anomaly.py): prequential scoring,
exactness under bounded out-of-order arrival, flush via event-time timeout."""

from __future__ import annotations

import datetime as dt
import math

from mcp_synaptic_spark.streaming.anomaly import rate_anomalies_stream

from stream_utils import replayed_stream

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _run(spark, tmp_path, batches, **kw):
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    name = f"anomaly_stream_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        rate_anomalies_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        spark.sql(f"SELECT * FROM {name}").collect(),
        key=lambda r: (r["event_type"], r["bucket_start"]),
    )


def _prequential(counts_by_bucket, z_threshold=3.0):
    """Reference fold: score each bucket against the moments of the prior
    ones, then absorb it."""
    out = []
    c = s1 = s2 = 0
    for b in sorted(counts_by_bucket):
        n = counts_by_bucket[b]
        if c >= 2:
            mean = s1 / c
            var = (s2 - s1 * s1 / c) / (c - 1)
            z = (n - mean) / math.sqrt(var) if var > 0 else None
        else:
            mean = s1 / c if c else None
            z = None
        out.append(
            (
                b,
                n,
                round(mean, 6) if mean is not None else None,
                round(z, 6) if z is not None else None,
                bool(z is not None and abs(z) >= z_threshold),
            )
        )
        c, s1, s2 = c + 1, s1 + n, s2 + n * n
    return out


def test_prequential_scores_and_spike_flag(spark, tmp_path):
    """Four quiet 60s buckets then a spike bucket: the spike is scored
    against the quiet history and flagged; the first two buckets are
    unscored (need two prior points for a sample stddev)."""
    counts = {0: 5, 60: 5, 120: 6, 180: 5, 240: 40}
    rows = [
        (u, _ts(b + u % 60), "click")
        for b, n in counts.items()
        for u in range(n)
    ]
    batches = [rows, [(9, _ts(10_000), "probe")], [(9, _ts(20_000), "probe")]]
    got = _run(spark, tmp_path, batches, bucket_seconds=60, watermark_delay="0 seconds")
    clicks = [r for r in got if r["event_type"] == "click"]
    ref = _prequential(counts)
    assert [
        (int(r["bucket_start"].timestamp() - _ts(0).timestamp()),
         r["n_events"], r["mean_prior"], r["z_score"], r["is_anomaly"])
        for r in clicks
    ] == [(b, n, m, z, a) for b, n, m, z, a in ref]
    assert clicks[-1]["is_anomaly"]
    assert all(not r["is_anomaly"] for r in clicks[:-1])


def test_late_event_counts_before_finalization(spark, tmp_path):
    """An event for bucket 0 arriving after bucket-60 traffic (but inside
    the watermark delay) must still land in bucket 0's count: buckets only
    finalize below the watermark, in event-time order."""
    batches = [
        [(1, _ts(0), "click"), (2, _ts(70), "click")],
        [(3, _ts(10), "click")],                # late for bucket 0
        [(9, _ts(5_000), "click")],             # advances the watermark
        [(9, _ts(9_000), "click")],             # fires the flush timeout
    ]
    got = _run(
        spark, tmp_path, batches, bucket_seconds=60, watermark_delay="120 seconds"
    )
    by_bucket = {
        int(r["bucket_start"].timestamp() - _ts(0).timestamp()): r["n_events"]
        for r in got
    }
    assert by_bucket[0] == 2  # late event included
    assert by_bucket[60] == 1


def test_quiet_type_flushed_by_other_traffic(spark, tmp_path):
    """A type with no further events still finalizes via its event-time
    timeout once any traffic advances the watermark."""
    batches = [
        [(1, _ts(0), "rare"), (1, _ts(1), "rare")],
        [(9, _ts(5_000), "busy")],
        [(9, _ts(9_000), "busy")],
    ]
    got = _run(spark, tmp_path, batches, bucket_seconds=60, watermark_delay="0 seconds")
    rare = [r for r in got if r["event_type"] == "rare"]
    assert len(rare) == 1 and rare[0]["n_events"] == 2


def test_fall_back_hour_buckets_match_batch_under_nyc(spark, tmp_path):
    """r11 tz-general: NY 2024-11-03 repeats the 01:00-02:00 local hour
    (EDT pass starting 05:00Z, EST pass starting 06:00Z). Spark's
    date_trunc is OFFSET-PRESERVING (java.time truncatedTo keeps the
    instant's zone offset), so the batch grid keeps the two passes as TWO
    distinct bucket instants that happen to render the same wall time —
    and the stream twin must reproduce exactly that, not merge them. The
    pre-r11 session-local floor would have merged the passes (diverging
    from batch) and, worse, compared local micros against the UTC
    watermark, double-emitting the bucket."""
    from mcp_synaptic_spark.operators.temporal import rate_anomalies

    from stream_utils import session_tz

    rows_hour = [
        (1, dt.datetime(2024, 11, 3, 5, 20), "view"),   # 01:20 EDT
        (2, dt.datetime(2024, 11, 3, 5, 40), "view"),   # 01:40 EDT
        (3, dt.datetime(2024, 11, 3, 6, 20), "view"),   # 01:20 EST — second pass
        (4, dt.datetime(2024, 11, 3, 6, 30), "view"),   # 01:30 EST
    ]
    batches = [
        rows_hour[:2],
        [(5, dt.datetime(2024, 11, 3, 6, 10), "view")],  # wm past 06:00Z
        rows_hour[2:],                                    # second-pass arrivals
        [(9, dt.datetime(2024, 11, 4, 12), "view")],
        [(9, dt.datetime(2024, 11, 5, 12), "view")],
    ]
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    with session_tz(spark, "America/New_York"):
        name = f"anomaly_tz_{abs(hash(str(tmp_path))) % 10**8}"
        q = (
            rate_anomalies_stream(stream, watermark_delay="0 seconds")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tz"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = spark.sql(f"SELECT * FROM {name}").collect()
        batch = rate_anomalies(
            spark.createDataFrame([r for b in batches for r in b], SCHEMA)
        ).collect()
        got = {(r["bucket_start"], r["n_events"]) for r in out}
        want = {(r["bucket_start"], r["n_events"]) for r in batch}
        # the stream cannot emit the advancer's final tail bucket; every
        # emitted bucket must be a batch bucket, and both 01:xx passes
        # must appear distinctly (EDT pass n=2, EST pass n=3 incl. 06:10)
        assert got <= want
        assert len(got) >= 3
        counts = sorted(n for _, n in got)
        assert counts.count(2) >= 1 and counts.count(3) >= 1
        # exactly-once: no bucket_start appears twice in the append output
        starts = [(r["event_type"], r["bucket_start"]) for r in out]
        assert len(starts) == len(set(starts))
