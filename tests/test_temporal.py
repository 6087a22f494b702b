"""Temporal joins: as-of join and trailing range join (operators/temporal.py).

Reference has no time-series ops; these are graded against brute-force
oracles here and against DuckDB LATERAL / inequality-join SQL twins in the
driver contract (events_asof_join, events_range_join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators.temporal import asof_join, range_join_agg


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    # left: (id, user, ts_offset_seconds)
    left = spark.createDataFrame(
        [(1, 10, _ts(100)), (2, 10, _ts(200)), (3, 20, _ts(50)), (4, 30, _ts(500))],
        "event_id long, user_id long, ts timestamp",
    )
    # right: (id, user, ts, value) — user 30 has no rows at all
    right = spark.createDataFrame(
        [
            (101, 10, _ts(90), 1.0),
            (102, 10, _ts(100), 2.0),   # ties left id=1 exactly
            (103, 10, _ts(150), 3.0),
            (104, 20, _ts(60), 4.0),    # after left id=3 — never matches
            (105, 10, _ts(100), 5.0),   # same ts as 102, larger id wins
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["m_ts"], r["m_value"])
        for r in asof_join(
            left, right, by="user_id", right_cols=("value",),
            right_tiebreak="event_id", prefix="m_",
        ).collect()
    }
    assert out[1] == (_ts(100), 5.0)  # equal-ts row visible; id 105 beats 102
    assert out[2] == (_ts(150), 3.0)  # latest of the three
    assert out[3] == (None, None)     # only right row is AFTER the left ts
    assert out[4] == (None, None)     # key never on the right side


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["m_ts"], r["m_value"])
        for r in asof_join(
            left, right, by="user_id", right_cols=("value",),
            right_tiebreak="event_id", strict=True, prefix="m_",
        ).collect()
    }
    assert out[1] == (_ts(90), 1.0)   # the two ts=100 right rows now invisible
    assert out[2] == (_ts(150), 3.0)


def test_asof_matches_brute_force(spark):
    """Randomized cross-check: union-window result == per-row argmax scan."""
    import random

    rng = random.Random(7)
    lrows = [(i, rng.randrange(5), _ts(rng.randrange(1000))) for i in range(80)]
    rrows = [
        (1000 + i, rng.randrange(5), _ts(rng.randrange(1000)), float(i))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["m_ts"], r["m_value"])
        for r in asof_join(
            left, right, by="user_id", right_cols=("value",),
            right_tiebreak="event_id", prefix="m_",
        ).collect()
    }
    for lid, lu, lts in lrows:
        cand = [(ts, rid, v) for rid, ru, ts, v in rrows if ru == lu and ts <= lts]
        want = (None, None)
        if cand:
            ts, _, v = max(cand)
            want = (ts, v)
        assert got[lid] == want, lid


def test_range_join_agg_boundaries_and_zeros(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["n_right"], r["sum_value"])
        for r in range_join_agg(
            left, right, by="user_id", window_seconds=60,
            aggs=(("count", "*"), ("sum", "value")),
        ).collect()
    }
    # id=1 @100: window [40,100) -> right ts 90 only (ts=100 excluded: half-open)
    assert out[1] == (1, 1.0)
    # id=2 @200: window [140,200) -> ts 150 only
    assert out[2] == (1, 3.0)
    # id=3 @50: user-20 right row is at 60 (after) -> kept with zeros
    assert out[3] == (0, 0.0)
    assert out[4] == (0, 0.0)


def test_range_join_agg_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    lrows = [(i, rng.randrange(4), _ts(rng.randrange(500))) for i in range(60)]
    rrows = [
        (1000 + i, rng.randrange(4), _ts(rng.randrange(500)), float(rng.randrange(9)))
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["n_right"], r["sum_value"])
        for r in range_join_agg(
            left, right, by="user_id", window_seconds=45,
            aggs=(("count", "*"), ("sum", "value")),
        ).collect()
    }
    for lid, lu, lts in lrows:
        lo = lts - dt.timedelta(seconds=45)
        cand = [v for rid, ru, ts, v in rrows if ru == lu and lo <= ts < lts]
        assert got[lid] == (len(cand), float(sum(cand))), lid


def test_asof_plan_is_single_exchange_no_join(spark):
    """The physical-shape claim in the docstring: one hash exchange on the
    key, a window, and NO join operator of any kind."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, by="user_id", right_cols=("value",), right_tiebreak="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_plan_is_equi_join_not_bnlj(spark):
    """Bucketing must turn the inequality join into an equi-join: the range
    predicate may appear only as a join/filter condition of a hash-keyed
    join — never a BroadcastNestedLoopJoin / CartesianProduct."""
    left, right = _frames(spark)
    plan = (
        range_join_agg(left, right, by="user_id", window_seconds=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --- rate_anomalies -------------------------------------------------------

def test_rate_anomalies_flags_spike(spark):
    import datetime as dt

    from mcp_synaptic_spark.operators.temporal import rate_anomalies

    rows = []
    eid = 0
    # 10 quiet hours of 5 events, one hour of 50 — a clear spike
    for h in range(10):
        for i in range(5):
            rows.append((eid, dt.datetime(2024, 1, 1, h, i), 1, "click"))
            eid += 1
    for i in range(50):
        rows.append((eid, dt.datetime(2024, 1, 1, 10, i % 60), 1, "click"))
        eid += 1
    # a flat type: identical counts -> zero variance -> never anomalous
    for h in range(5):
        rows.append((eid, dt.datetime(2024, 1, 1, h, 0), 1, "view"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = rate_anomalies(df).collect()
    flagged = {(r.event_type, r.bucket_start.hour) for r in out if r.is_anomaly}
    assert flagged == {("click", 10)}
    clicks = [r for r in out if r.event_type == "click"]
    import math
    counts = [5] * 10 + [50]
    mu = sum(counts) / len(counts)
    var = sum((c - mu) ** 2 for c in counts) / (len(counts) - 1)
    spike = next(r for r in clicks if r.bucket_start.hour == 10)
    assert spike.mean_events == round(mu, 6)
    assert abs(spike.z_score - (50 - mu) / math.sqrt(var)) < 1e-6
    views = [r for r in out if r.event_type == "view"]
    assert all(r.z_score is None and not r.is_anomaly for r in views)


def test_rate_anomalies_single_bucket_type(spark):
    import datetime as dt

    from mcp_synaptic_spark.operators.temporal import rate_anomalies

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0), 1, "solo")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = rate_anomalies(df).collect()
    assert len(out) == 1 and out[0].z_score is None and not out[0].is_anomaly
