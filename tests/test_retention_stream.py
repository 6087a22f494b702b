"""Streaming retention updates (streaming/retention.py): cohort-min
finality under bounded out-of-order arrival, stream == batch triangle."""

from __future__ import annotations

import datetime as dt

from mcp_synaptic_spark.operators.retention import cohort_retention, rolling_active_users
from mcp_synaptic_spark.streaming.retention import (
    active_users_updates_stream,
    retention_updates_stream,
)

from stream_utils import replayed_stream

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _run(spark, tmp_path, batches, **kw):
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    name = f"retention_stream_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        retention_updates_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_late_earlier_day_still_sets_the_cohort(spark, tmp_path):
    """User 1's day-2 event arrives first; their day-1 event arrives later
    but inside the watermark delay. The fold must wait until day 1 is
    closed, so the cohort is day 1 and day 2 emits as offset 1 — an
    as-arrival fold would have emitted (cohort=day2, offset=0) and then
    needed a retraction."""
    batches = [
        [(1, _ts(2, 5), "view")],
        [(1, _ts(1, 3), "view")],                 # late, within delay
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],  # advance + flush
    ]
    got = {
        (r.key, r.cohort_day.day, r.day_offset)
        for r in _run(spark, tmp_path, batches, watermark_delay="2 days")
    }
    assert ("1", 1, 0) in got and ("1", 1, 1) in got
    assert not any(k == "1" and c == 2 for k, c, _ in got)


def test_stream_triangle_equals_batch(spark, tmp_path):
    import random

    rng = random.Random(41)
    rows = sorted(
        (
            (rng.randrange(8), _ts(rng.randrange(1, 12), rng.randrange(24)), "view")
            for _ in range(200)
        ),
        key=lambda r: r[1],
    )
    advancers = [(99, _ts(25), "view"), (99, _ts(28), "view")]
    batches = [rows[:70], rows[70:140], rows[140:], [advancers[0]], [advancers[1]]]
    out = _run(spark, tmp_path, batches, watermark_delay="0 seconds")
    # the advancer's own LAST day can never close below the final watermark
    # (nothing later exists to move it past the day end) — that tail-open
    # day is the one row a stream cannot know yet, so compare on the data
    # users, whose days all closed
    tri = {}
    for r in out:
        if r.key == "99":
            continue
        k = (r.cohort_day, r.day_offset)
        tri[k] = tri.get(k, 0) + 1
    batch = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in cohort_retention(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert tri == batch


def test_null_user_key_dropped_like_batch(spark, tmp_path):
    """NULL user_ids form no cohort in EITHER form (ADVICE r9): the batch
    twin's _activity drops them, so the stream must too — otherwise it
    emits NULL-cohort rows the batch triangle never produces."""
    batches = [
        [(None, _ts(1), "view"), (None, _ts(2), "view"), (1, _ts(1), "view")],
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],  # advance + flush
    ]
    out = _run(spark, tmp_path, batches, watermark_delay="0 seconds")
    assert not any(r.key is None for r in out)
    assert ("1", 1, 0) in {(r.key, r.cohort_day.day, r.day_offset) for r in out}
    # and the batch triangle over the same rows has no NULL-keyed cohorts
    rows = batches[0] + batches[1] + batches[2]
    batch = cohort_retention(spark.createDataFrame(rows, SCHEMA)).collect()
    assert sum(r.n_users for r in batch if r.day_offset == 0) == 2  # users 1, 9


def test_each_offset_emitted_exactly_once(spark, tmp_path):
    """Repeated activity on the same day (and replays of nearby days) must
    not re-emit an offset."""
    batches = [
        [(1, _ts(1, h), "view") for h in range(5)]
        + [(1, _ts(3, h), "view") for h in range(3)],
        [(1, _ts(3, 9), "view"), (1, _ts(1, 9), "view")],
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],
    ]
    out = [r for r in _run(spark, tmp_path, batches, watermark_delay="3 days") if r.key == "1"]
    assert sorted((r.cohort_day.day, r.day_offset) for r in out) == [(1, 0), (1, 2)]


# --- active-users twin (r10, VERDICT r9 #4) --------------------------------


def _run_au(spark, tmp_path, batches, **kw):
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    name = f"au_stream_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        active_users_updates_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_au"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _au_view(rows, exclude=("99",)):
    """The documented live view over the twin's append rows:
    (day, dau, rolling_au) with the observed-day clamp."""
    agg = {}
    for r in rows:
        if r.key in exclude:
            continue
        dau, rau = agg.get(r.day, (0, 0))
        agg[r.day] = (dau + (1 if r.is_active_day else 0), rau + 1)
    return {d: v for d, v in agg.items() if v[0] > 0}


def test_active_users_stream_equals_batch(spark, tmp_path):
    import random

    rng = random.Random(43)
    rows = sorted(
        (
            (rng.randrange(8), _ts(rng.randrange(1, 12), rng.randrange(24)), "view")
            for _ in range(200)
        ),
        key=lambda r: r[1],
    )
    # the advancer pushes the watermark past max_day + window so every data
    # user's report day closes
    advancers = [(99, _ts(25), "view"), (99, _ts(28), "view")]
    batches = [rows[:70], rows[70:140], rows[140:], [advancers[0]], [advancers[1]]]
    out = _run_au(spark, tmp_path, batches, window_days=7, watermark_delay="0 seconds")
    got = _au_view(out)
    batch = {
        r.day: (r.dau, r.rolling_au)
        for r in rolling_active_users(
            spark.createDataFrame(rows, SCHEMA), window_days=7
        ).collect()
    }
    assert got == batch


def test_active_users_late_day_still_counts(spark, tmp_path):
    """User 1's day-1 event arrives after their day-3 event but inside the
    watermark delay: day 1 must still emit as an active day and contribute
    to the trailing windows of days 1..7."""
    batches = [
        [(1, _ts(3, 5), "view")],
        [(1, _ts(1, 3), "view")],                 # late, within delay
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],
    ]
    out = [
        r for r in _run_au(
            spark, tmp_path, batches, window_days=3, watermark_delay="3 days"
        )
        if r.key == "1"
    ]
    got = sorted((r.day.day, r.is_active_day) for r in out)
    # active on 1 and 3; window (w=3) presence on 1..5 with own-days flagged
    assert got == [(1, True), (2, False), (3, True), (4, False), (5, False)]


def test_active_users_exactly_once_per_report_day(spark, tmp_path):
    """Repeated activity on the same day and overlapping windows must not
    re-emit a (user, report day) row."""
    batches = [
        [(1, _ts(1, h), "view") for h in range(5)]
        + [(1, _ts(2, h), "view") for h in range(3)],
        [(1, _ts(2, 9), "view"), (1, _ts(1, 9), "view")],
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],
    ]
    out = [
        r for r in _run_au(
            spark, tmp_path, batches, window_days=3, watermark_delay="2 days"
        )
        if r.key == "1"
    ]
    days = [(r.day.day, r.is_active_day) for r in out]
    assert sorted(days) == [(1, True), (2, True), (3, False), (4, False)]
    assert len(days) == len(set(days))  # no duplicates


def test_active_users_null_user_dropped(spark, tmp_path):
    batches = [
        [(None, _ts(1), "view"), (1, _ts(1), "view")],
        [(9, _ts(20), "view")], [(9, _ts(28), "view")],
    ]
    out = _run_au(spark, tmp_path, batches, window_days=2, watermark_delay="0 seconds")
    assert not any(r.key is None for r in out)
    assert any(r.key == "1" and r.is_active_day for r in out)


def test_active_users_state_removal_and_reseed(spark, tmp_path):
    """A user whose trailing window fully drains has their state REMOVED;
    when they return much later the re-seeded state must emit the new
    report days exactly once with no duplicates of the old ones (the
    docstring's re-seed safety argument: new folds sit above the old
    watermark, so new report days are strictly later)."""
    batches = [
        [(1, _ts(1, 5), "view")],
        [(9, _ts(15), "view")],                   # drain user 1's window
        [(1, _ts(20, 5), "view")],                # user 1 returns
        [(9, _ts(27), "view")], [(9, _ts(29), "view")],  # close + flush
    ]
    out = [
        r for r in _run_au(
            spark, tmp_path, batches, window_days=3, watermark_delay="0 seconds"
        )
        if r.key == "1"
    ]
    got = sorted((r.day.day, r.is_active_day) for r in out)
    assert got == [
        (1, True), (2, False), (3, False),        # first activity burst
        (20, True), (21, False), (22, False),     # post-reseed burst
    ]
    assert len(got) == len(set(got))


# --- tz-general day bucketing (r11, VERDICT r10 #3; replaces the r10
# UTC-only rejection guard) ---------------------------------------------


def test_retention_stream_equals_batch_under_nyc_spring_forward(spark, tmp_path):
    """Stream == batch triangle under America/New_York across the
    2024-03-10 spring-forward transition: local days are 23 h that Sunday,
    so the UTC-clock close test the r10 guard protected against would
    mis-time every fold; the DST-exact close (_pandas.day_close_us) must
    reproduce the batch triangle computed under the SAME session tz."""
    import random

    from stream_utils import session_tz

    rng = random.Random(47)
    rows = sorted(
        (
            (rng.randrange(8), dt.datetime(2024, 3, rng.randrange(8, 13), rng.randrange(24)), "view")
            for _ in range(200)
        ),
        key=lambda r: r[1],
    )
    advancers = [(99, dt.datetime(2024, 3, 25), "view"), (99, dt.datetime(2024, 3, 28), "view")]
    batches = [rows[:70], rows[70:140], rows[140:], [advancers[0]], [advancers[1]]]
    with session_tz(spark, "America/New_York"):
        out = _run(spark, tmp_path, batches, watermark_delay="0 seconds")
        tri = {}
        for r in out:
            if r.key == "99":
                continue
            k = (r.cohort_day, r.day_offset)
            tri[k] = tri.get(k, 0) + 1
        batch = {
            (r.cohort_day, r.day_offset): r.n_users
            for r in cohort_retention(spark.createDataFrame(rows, SCHEMA)).collect()
        }
    assert tri == batch


def test_active_users_stream_equals_batch_under_nyc_fall_back(spark, tmp_path):
    """AU twin under America/New_York across the 2024-11-03 fall-back
    transition (a 25 h local day whose midnight close arrives an hour
    later on the UTC clock than naive day arithmetic says)."""
    import random

    from stream_utils import session_tz

    rng = random.Random(48)
    rows = sorted(
        (
            (rng.randrange(8), dt.datetime(2024, 11, rng.randrange(1, 7), rng.randrange(24)), "view")
            for _ in range(200)
        ),
        key=lambda r: r[1],
    )
    advancers = [(99, dt.datetime(2024, 11, 20), "view"), (99, dt.datetime(2024, 11, 25), "view")]
    batches = [rows[:70], rows[70:140], rows[140:], [advancers[0]], [advancers[1]]]
    with session_tz(spark, "America/New_York"):
        out = _run_au(spark, tmp_path, batches, window_days=7, watermark_delay="0 seconds")
        got = _au_view(out)
        batch = {
            r.day: (r.dau, r.rolling_au)
            for r in rolling_active_users(
                spark.createDataFrame(rows, SCHEMA), window_days=7
            ).collect()
        }
    assert got == batch


def test_unresolvable_session_tz_raises_loudly():
    """The twins must never guess a zone: an unresolvable session timeZone
    string fails at construction, not as a silent mis-close."""
    import pytest

    from mcp_synaptic_spark.streaming._pandas import tzinfo_of

    with pytest.raises(ValueError, match="timeZone"):
        tzinfo_of("Not/AZone")
    # forms Spark accepts must resolve
    import datetime as _dt

    assert tzinfo_of("UTC") is _dt.timezone.utc
    assert tzinfo_of("+05:30").utcoffset(None) == _dt.timedelta(hours=5, minutes=30)
    assert tzinfo_of("GMT+8:00").utcoffset(None) == _dt.timedelta(hours=8)
    assert tzinfo_of("America/New_York") is not None


def test_tz_change_between_construction_and_start_raises(spark, tmp_path):
    """ADVICE r11: the fold clock (day_close_us) is baked into the twin's
    closure at construction, but the Arrow serializer renders timestamps
    under the conf in effect at query START — a session.timeZone change in
    between must surface as a loud query failure (guard_tz_chunks comparing
    the attached current_timezone() column), never as silently skewed day
    closes."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from stream_utils import session_tz

    stream = replayed_stream(
        spark, tmp_path, [[(1, _ts(2, 5), "view")], [(9, _ts(28), "view")]], SCHEMA
    )
    twin = retention_updates_stream(stream)  # built under the current zone
    with session_tz(spark, "America/New_York"):
        q = (
            twin.writeStream.format("memory")
            .queryName("tz_guard_trip")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException, match="session timezone changed"):
            q.awaitTermination(180)
