"""Streaming funnel (streaming/funnel.py): exactness under bounded
out-of-order arrival, and stream == batch on ordered feeds."""

from __future__ import annotations

import datetime as dt

from mcp_synaptic_spark.operators.funnel import funnel
from mcp_synaptic_spark.streaming.funnel import funnel_updates_stream

from stream_utils import replayed_stream

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _run(spark, tmp_path, batches, **kw):
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    name = f"funnel_stream_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        funnel_updates_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        f"SELECT key, max(steps_reached) AS depth FROM {name} GROUP BY key"
    ).collect()
    return {r["key"]: r["depth"] for r in rows}


def test_late_in_watermark_event_reorders_exactly(spark, tmp_path):
    """A step-1 event arriving AFTER its user's step-2 event (but inside the
    watermark delay) must still fold in event-time order: the chain sees
    view@50 then click@100 and reaches depth 2. An as-arrival fold would
    stick at depth 1 — this is the case that forces the buffer."""
    steps = ("view", "click")
    batches = [
        [(1, _ts(100), "click"), (2, _ts(0), "view")],
        [(1, _ts(50), "view")],                      # late, inside the 60s delay
        [(9, _ts(1000), "view")],                    # advances the watermark
        [(9, _ts(2000), "view")],                    # fires the flush timeouts
    ]
    got = _run(
        spark, tmp_path, batches,
        steps=steps, horizon=60, watermark_delay="60 seconds",
    )
    assert got["1"] == 2
    assert got["2"] == 1


def test_stream_equals_batch_on_ordered_feed(spark, tmp_path):
    import random

    rng = random.Random(17)
    steps = ("view", "click", "purchase")
    rows = sorted(
        (
            (rng.randrange(10), _ts(rng.randrange(0, 500)),
             rng.choice(("view", "click", "purchase", "noise")))
            for _ in range(300)
        ),
        key=lambda r: r[1],
    )
    # in-event-time-order batches + two far-future step-typed advancers (the
    # watermark advances with step traffic only — module contract); the
    # advancer user is a legitimate view-only participant on both sides
    advancers = [(99, _ts(10_000), "view"), (99, _ts(20_000), "view")]
    batches = [rows[:100], rows[100:200], rows[200:], [advancers[0]], [advancers[1]]]
    got = _run(
        spark, tmp_path, batches,
        steps=steps, horizon=120, watermark_delay="0 seconds",
    )
    stream_counts = [sum(1 for d in got.values() if d >= j + 1) for j in range(3)]
    batch_counts = [
        r["n_users"]
        for r in sorted(
            funnel(
                spark.createDataFrame(rows + advancers, SCHEMA),
                steps=steps, horizon=120,
            ).collect(),
            key=lambda r: r["step"],
        )
    ]
    assert stream_counts == batch_counts


def test_monotone_updates_and_quiet_user_flush(spark, tmp_path):
    """A user who goes quiet still gets flushed by other traffic advancing
    the watermark (the event-time timeout), and emitted depths only grow."""
    steps = ("view", "click")
    batches = [
        [(5, _ts(0), "view"), (5, _ts(10), "click")],
        [(5, _ts(20), "noise")],        # non-step rows are scan-pruned
        [(9, _ts(5_000), "view")],      # other-user step traffic advances wm
        [(9, _ts(9_000), "view")],      # ...and fires the flush timeouts
    ]
    got = _run(
        spark, tmp_path, batches,
        steps=steps, horizon=60, watermark_delay="0 seconds",
    )
    assert got["5"] == 2
    assert got["9"] == 1  # view-only participant


def test_null_user_key_streams_like_batch(spark, tmp_path):
    """NULL user_ids are dropped by BOTH forms (ADVICE r9): anonymous
    events must not collapse into one pseudo-user whose mixed events
    jointly complete a chain, and the relational (oracle) form drops
    NULLs after step 1 anyway. Stream and batch must agree on that."""
    steps = ("view", "click")
    batches = [
        [(None, _ts(0), "view"), (None, _ts(10), "click"), (1, _ts(5), "view")],
        [(9, _ts(5_000), "view")],
        [(9, _ts(9_000), "view")],
    ]
    got = _run(
        spark, tmp_path, batches,
        steps=steps, horizon=60, watermark_delay="0 seconds",
    )
    assert None not in got  # anonymous events form no group
    assert got["1"] == 1

    batch = {
        r["step"]: r["n_users"]
        for r in funnel(
            spark.createDataFrame(batches[0] + batches[1] + batches[2], SCHEMA),
            steps=steps, horizon=60,
        ).collect()
    }
    stream_counts = {j + 1: sum(1 for d in got.values() if d >= j + 1) for j in range(2)}
    assert stream_counts == batch


def test_fall_back_hour_folds_in_instant_order_under_nyc(spark, tmp_path):
    """r11 tz-general: during the 2024-11-03 NY fall-back the local wall
    clock repeats 01:00-02:00, so LOCAL-time ordering inverts against
    instant ordering. The fold must use true instants (the JVM unix_micros
    column): user 1's view happens at 06:10Z (01:10 EST, the SECOND pass)
    AFTER their click at 05:30Z (01:30 EDT, the first pass) — depth 1,
    like the batch fold over instants. A local-wall sort would see
    view(01:10) before click(01:30) and wrongly complete the chain."""
    from stream_utils import session_tz

    steps = ("view", "click")
    # instants, written as UTC wall times under the UTC session
    batches = [
        [(1, dt.datetime(2024, 11, 3, 5, 30), "click"),
         (1, dt.datetime(2024, 11, 3, 6, 10), "view")],
        [(9, dt.datetime(2024, 11, 5), "view")],
        [(9, dt.datetime(2024, 11, 8), "view")],
    ]
    stream = replayed_stream(spark, tmp_path, batches, SCHEMA)
    with session_tz(spark, "America/New_York"):
        name = f"funnel_tz_{abs(hash(str(tmp_path))) % 10**8}"
        q = (
            funnel_updates_stream(
                stream, steps=steps, horizon="1d", watermark_delay="0 seconds"
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tz"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["key"]: r["depth"]
            for r in spark.sql(
                f"SELECT key, max(steps_reached) AS depth FROM {name} GROUP BY key"
            ).collect()
        }
        batch = {
            r["step"]: r["n_users"]
            for r in funnel(
                spark.createDataFrame(
                    [r for b in batches for r in b], SCHEMA
                ),
                steps=steps,
                horizon="1d",
            ).collect()
        }
    assert got["1"] == 1, "view arrived after click on the instant clock"
    stream_per_step = {
        j + 1: sum(1 for d in got.values() if d >= j + 1) for j in range(len(steps))
    }
    assert stream_per_step == batch
