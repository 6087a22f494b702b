"""Ordered conversion funnel (operators/funnel.py).

Ground truth is the relational chain (min-ts per step, each within the
horizon of the previous) computed in Python; the driver twin runs the
same chain as DuckDB correlated-min SQL (events_funnel)."""

from __future__ import annotations

import datetime as dt

import pytest

from mcp_synaptic_spark.operators.funnel import _horizon_seconds, funnel


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def _chain(rows, steps, h_s):
    """Reference semantics: t_j = min ts of step j with
    t_{j-1} <= ts <= t_{j-1} + horizon (inclusive)."""
    users = {u for u, _, _ in rows}
    counts = [0] * len(steps)
    for u in users:
        prev = None
        for j, s in enumerate(steps):
            cand = [
                t
                for uu, t, e in rows
                if uu == u
                and e == s
                and (j == 0 or (prev <= t <= prev + dt.timedelta(seconds=h_s)))
            ]
            if not cand:
                break
            prev = min(cand)
            counts[j] += 1
    return counts


def test_funnel_matches_reference_chain(spark):
    rows = [
        # u1 completes all three inside the horizon
        (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "buy"),
        # u2: click arrives past the horizon
        (2, _ts(0), "view"), (2, _ts(120), "click"),
        # u3: click BEFORE the first view — ordered funnel must not count it
        (3, _ts(50), "click"), (3, _ts(60), "view"),
        # u4: only views
        (4, _ts(0), "view"), (4, _ts(5), "view"),
        # u5: buy within horizon of click but click out of view's horizon
        (5, _ts(0), "view"), (5, _ts(90), "click"), (5, _ts(95), "buy"),
    ]
    steps = ("view", "click", "buy")
    got = {
        r["step_name"]: (r["n_users"], r["frac_of_first"])
        for r in funnel(_df(spark, rows), steps=steps, horizon=60).collect()
    }
    want = _chain(rows, steps, 60)
    assert [got[s][0] for s in steps] == want == [5, 1, 1]
    assert got["view"][1] == 1.0
    assert got["click"][1] == pytest.approx(0.2)


def test_equal_timestamp_is_inclusive(spark):
    # click at exactly the view time, buy at exactly horizon boundary
    rows = [(1, _ts(0), "view"), (1, _ts(0), "click"), (1, _ts(60), "buy")]
    out = funnel(_df(spark, rows), steps=("view", "click", "buy"), horizon=60).collect()
    assert [r["n_users"] for r in sorted(out, key=lambda r: r["step"])] == [1, 1, 1]


def test_chain_uses_earliest_qualifying_time(spark):
    # first click at t=30 (in horizon of view); buy at t=100 is within 60s
    # of the SECOND click (t=50) but not of the first — the chain pins the
    # earliest click, so the buy must NOT count.
    rows = [
        (1, _ts(0), "view"),
        (1, _ts(30), "click"),
        (1, _ts(50), "click"),
        (1, _ts(100), "buy"),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel(_df(spark, rows), steps=("view", "click", "buy"), horizon=60).collect()
    }
    assert out == {"view": 1, "click": 1, "buy": 0}


def test_empty_first_step_gives_null_frac(spark):
    rows = [(1, _ts(0), "click")]
    out = sorted(
        funnel(_df(spark, rows), steps=("view", "click"), horizon=60).collect(),
        key=lambda r: r["step"],
    )
    assert [r["n_users"] for r in out] == [0, 0]
    assert all(r["frac_of_first"] is None for r in out)


def test_fuzz_against_reference_chain(spark):
    import random

    rng = random.Random(3)
    steps = ("a", "b", "c")
    rows = [
        (rng.randrange(12), _ts(rng.randrange(0, 500)), rng.choice(("a", "b", "c", "x")))
        for _ in range(400)
    ]
    got = [
        r["n_users"]
        for r in sorted(
            funnel(_df(spark, rows), steps=steps, horizon=120).collect(),
            key=lambda r: r["step"],
        )
    ]
    want = _chain([r for r in rows if r[2] in steps], steps, 120)
    assert got == want


def test_horizon_parse():
    assert _horizon_seconds("90") == 90
    assert _horizon_seconds("15m") == 900
    assert _horizon_seconds("1h") == 3600
    assert _horizon_seconds("1d") == 86400
    assert _horizon_seconds(7) == 7
    with pytest.raises(ValueError):
        _horizon_seconds("soon")


def test_step_validation(spark):
    df = _df(spark, [(1, _ts(0), "view")])
    with pytest.raises(ValueError):
        funnel(df, steps=())
    with pytest.raises(ValueError):
        funnel(df, steps=("a", "a"))


# --- conversion_lags --------------------------------------------------------

def test_conversion_lags_match_chain(spark):
    import datetime as dt

    from mcp_synaptic_spark.operators.funnel import conversion_lags

    def ts(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    rows = [
        # user 1 completes: view@0 -> click@30 -> purchase@100
        (1, ts(0), "view"), (1, ts(30), "click"), (1, ts(100), "purchase"),
        # user 2 stalls after click
        (2, ts(0), "view"), (2, ts(10), "click"),
        # user 3: purchase before any view -> never completes
        (3, ts(5), "purchase"), (3, ts(50), "view"),
        # user 4 completes with same-timestamp steps (inclusive boundary)
        (4, ts(7), "view"), (4, ts(7), "click"), (4, ts(7), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user_id: (r.lag_us_1, r.lag_us_2, r.lag_us_total)
        for r in conversion_lags(
            df, steps=("view", "click", "purchase"), horizon=300
        ).collect()
    }
    assert out == {
        1: (30_000_000, 70_000_000, 100_000_000),
        4: (0, 0, 0),
    }


def test_null_users_never_complete_a_chain(spark):
    """NULL user_ids are dropped (ADVICE r9): anonymous events must not
    collapse into one pseudo-user — here the NULL rows would jointly
    complete view->click if kept, which the relational/oracle form (JOIN
    USING user_id) never counts."""
    rows = [
        (None, _ts(0), "view"), (None, _ts(10), "click"),
        (1, _ts(0), "view"),
    ]
    out = {r.step: r.n_users for r in funnel(
        _df(spark, rows), steps=("view", "click"), horizon=60
    ).collect()}
    assert out == {1: 1, 2: 0}


def test_conversion_lags_requires_two_steps(spark):
    import pytest as _pytest

    from mcp_synaptic_spark.operators.funnel import conversion_lags

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pytest.raises(ValueError):
        conversion_lags(df, steps=("view",))


def test_oracle_parity_with_null_users_and_null_ts(spark, tmp_path):
    """The sf0.01 events table has no NULL user_ids, so the driver's hash
    gate never exercises the NULL paths — run the REAL events_funnel /
    events_conversion_lag oracle SQL against a synthetic table containing
    a NULL-user chain and a NULL-ts-only user, and require bit-equality
    with the Spark queries (r10 review: the oracle's s1 previously
    counted both at step 1, the engine neither)."""
    import duckdb

    import __spark_entry__ as entry
    from tools.parity import norm_rows

    rows = [
        (None, _ts(0), "view"), (None, _ts(10), "click"), (None, _ts(20), "purchase"),
        (1, _ts(0), "view"), (1, _ts(30), "click"), (1, _ts(100), "purchase"),
        (2, _ts(0), "view"),
        (3, None, "view"),  # only NULL-ts step-1 events
    ]
    _df(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    for q in ("events_funnel", "events_conversion_lag"):
        sdf = entry.queries()[q](spark, str(tmp_path))
        scols, srows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(entry.oracle_sql()[q]).fetchall()
        ocols, orows = norm_rows([d[0] for d in con.description], res)
        assert scols == ocols, q
        assert srows == orows, q
    # and the NULL pseudo-user's complete chain counted nowhere
    out = {r.step: r.n_users for r in funnel(
        _df(spark, rows), steps=("view", "click", "purchase"), horizon="1d"
    ).collect()}
    assert out == {1: 2, 2: 1, 3: 1}
