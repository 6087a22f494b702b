"""Cohort retention + rolling active users (operators/retention.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import retention as RET


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, "view") for i, (u, d, h) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _naive_retention(rows):
    """Reference triangle from (user, day) pairs."""
    act = {(u, d) for u, d, _ in rows}
    first = {}
    for u, d in act:
        first[u] = min(first.get(u, d), d)
    tri = {}
    for u, d in act:
        key = (first[u], d - first[u])
        tri[key] = tri.get(key, 0) + 1
    return tri


def test_cohort_retention_matches_naive(spark):
    rows = [
        (1, 1, 0), (1, 1, 5), (1, 3, 2), (1, 8, 0),
        (2, 1, 1), (2, 2, 1),
        (3, 3, 0), (3, 3, 9), (3, 10, 0),
        (4, 5, 0),
    ]
    out = {
        (r.cohort_day.day, r.day_offset): (r.n_users, r.cohort_size, r.retention_rate)
        for r in RET.cohort_retention(_events(spark, rows)).collect()
    }
    naive = _naive_retention([(u, d, h) for u, d, h in rows])
    assert set(out) == set(naive)
    for (cd, off), n in naive.items():
        size = naive[(cd, 0)]
        got = out[(cd, off)]
        assert got == (n, size, round(n / size, 6))


def test_cohort_retention_offset0_is_cohort_size(spark):
    rows = [(u, d, 0) for u in range(1, 8) for d in range(u % 3 + 1, 12, u % 4 + 1)]
    df = RET.cohort_retention(_events(spark, rows))
    z = df.where(F.col("day_offset") == 0).collect()
    assert all(r.n_users == r.cohort_size and r.retention_rate == 1.0 for r in z)
    # cohort sizes partition the user population
    users = {u for u, _, _ in rows}
    assert sum(r.n_users for r in z) == len(users)


def test_cohort_retention_null_and_granularity_guard(spark):
    df = _events(spark, [(1, 1, 0)]).union(
        spark.createDataFrame(
            [(99, None, None, "view")],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
    )
    assert RET.cohort_retention(df).count() == 1
    with pytest.raises(ValueError):
        RET.cohort_retention(df, granularity="hour")


def test_rolling_active_users_matches_naive(spark):
    rows = [
        (1, 1, 0), (1, 2, 0), (1, 9, 0),
        (2, 1, 0), (2, 8, 0),
        (3, 4, 0), (3, 4, 6),
    ]
    k = 3
    out = {
        r.day.day: (r.dau, r.rolling_au)
        for r in RET.rolling_active_users(_events(spark, rows), window_days=k).collect()
    }
    act = {(u, d) for u, d, _ in rows}
    days = sorted({d for _, d in act})
    assert set(out) == set(days)
    for d in days:
        dau = len({u for u, dd in act if dd == d})
        wau = len({u for u, dd in act if d - k + 1 <= dd <= d})
        assert out[d] == (dau, wau)


def test_rolling_window_one_equals_dau(spark):
    rows = [(u, d, 0) for u in range(1, 6) for d in range(1, 10, u)]
    df = RET.rolling_active_users(_events(spark, rows), window_days=1)
    assert df.where(F.col("dau") != F.col("rolling_au")).count() == 0
    with pytest.raises(ValueError):
        RET.rolling_active_users(df, window_days=0)


def test_retention_and_active_users_on_seeded_random_feeds(spark):
    """Seeded random (user, day, hour) feeds vs the pure-Python model —
    covers multi-cohort overlap, gaps, and single-day users (Spark
    round-trips are too slow for per-example hypothesis here)."""
    import random

    rng = random.Random(29)
    for trial in range(3):
        rows = [
            (rng.randint(1, 12), rng.randint(1, 20), rng.randint(0, 23))
            for _ in range(rng.randint(5, 120))
        ]
        ev = _events(spark, rows)
        naive = _naive_retention(rows)
        got = {
            (r.cohort_day.day, r.day_offset): r.n_users
            for r in RET.cohort_retention(ev).collect()
        }
        assert got == naive, f"trial {trial}"
        k = rng.randint(1, 9)
        act = {(u, d) for u, d, _ in rows}
        days = sorted({d for _, d in act})
        au = {
            r.day.day: (r.dau, r.rolling_au)
            for r in RET.rolling_active_users(ev, window_days=k).collect()
        }
        for d in days:
            dau = len({u for u, dd in act if dd == d})
            wau = len({u for u, dd in act if d - k + 1 <= dd <= d})
            assert au[d] == (dau, wau), f"trial {trial} day {d}"
        assert set(au) == set(days)


def test_rolling_active_users_sketch_matches_exact_small(spark):
    """The HLL sketch tier (r14) answers EXACTLY below the sketch's
    promotion threshold — on small daily cohorts its (day, dau,
    rolling_au) output must equal the exact operator's row for row, at
    both a short and a long window."""
    rows = [
        (u, d, h)
        for d in range(1, 15)
        for u in range(1, 1 + (d * 7) % 13 + 3)
        for h in (1, (u + d) % 23 + 1)
    ]
    ev = _events(spark, rows)
    for w in (1, 7, 28):
        exact = {
            (r["day"], r["dau"], r["rolling_au"])
            for r in RET.rolling_active_users(ev, window_days=w).collect()
        }
        approx = {
            (r["day"], r["dau"], r["rolling_au"])
            for r in RET.rolling_active_users_sketch(ev, window_days=w).collect()
        }
        assert approx == exact, f"window={w}"


def test_rolling_active_users_sketch_tolerance_on_seeded_feed(spark, sf_dir):
    """On the real events fixture the sketch estimates stay within the HLL
    error envelope of the exact counts (±3σ ≈ 5% at lg_config_k=12), and
    the reported day set matches exactly (the observed-day clamp is
    estimate-independent)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {r["day"]: (r["dau"], r["rolling_au"])
             for r in RET.rolling_active_users(ev, window_days=7).collect()}
    approx = {r["day"]: (r["dau"], r["rolling_au"])
              for r in RET.rolling_active_users_sketch(ev, window_days=7).collect()}
    assert set(exact) == set(approx)
    for day, (dau, au) in exact.items():
        a_dau, a_au = approx[day]
        assert abs(a_dau - dau) <= max(1, 0.05 * dau), (day, dau, a_dau)
        assert abs(a_au - au) <= max(1, 0.05 * au), (day, au, a_au)
