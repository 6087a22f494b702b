"""Corpus distribution drift / PSI (operators/drift.py).

Ground truth is the textbook PSI computed in Python with the same
epsilon clamp; the driver twins (corpus_drift / corpus_drift_lang) run
the identical formulation as DuckDB SQL."""

from __future__ import annotations

import math

import pytest

from mcp_synaptic_spark.operators.drift import (
    EPS,
    NULL_BUCKET,
    categorical_drift,
    distribution_drift,
)


def _num(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x double")


def _cat(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "c string")


def _psi(na, nb, ta, tb):
    fa = max(na / ta, EPS)
    fb = max(nb / tb, EPS)
    return round((fa - fb) * math.log(fa / fb), 6)


def test_numeric_psi_matches_reference(spark):
    a = [1.0, 5.0, 5.0, 12.0, 25.0, None]
    b = [1.0, 1.0, 7.0, 30.0, 30.0, 30.0]
    out = {
        r.bucket: (r.n_a, r.n_b, r.psi)
        for r in distribution_drift(
            _num(spark, a), _num(spark, b), value_col="x", boundaries=[2, 10, 20]
        ).collect()
    }
    # buckets: (-inf,2) [2,10) [10,20) [20,inf) (null); totals 6 and 6
    expect = {
        "(-inf, 2)": (1, 2),
        "[2, 10)": (2, 1),
        "[10, 20)": (1, 0),
        "[20, inf)": (1, 3),
        NULL_BUCKET: (1, 0),
    }
    assert set(out) == set(expect)
    for bucket, (na, nb) in expect.items():
        assert out[bucket] == (na, nb, _psi(na, nb, 6, 6)), bucket


def test_numeric_bucket_order_and_null_toggle(spark):
    a, b = _num(spark, [0.0, 3.0, None]), _num(spark, [5.0])
    rows = distribution_drift(a, b, value_col="x", boundaries=[1, 4]).collect()
    assert [r.bucket for r in rows] == ["(-inf, 1)", "[1, 4)", "[4, inf)", NULL_BUCKET]
    no_null = distribution_drift(
        a, b, value_col="x", boundaries=[1, 4], null_bucket=False
    ).collect()
    assert [r.bucket for r in no_null] == ["(-inf, 1)", "[1, 4)", "[4, inf)"]
    # null_bucket=False excludes NULLs from the TOTALS too (r10 review):
    # side A has 2 non-null rows, so fractions are halves, not thirds
    assert {r.bucket: r.frac_a for r in no_null} == {
        "(-inf, 1)": 0.5, "[1, 4)": 0.5, "[4, inf)": EPS,
    }


def test_null_toggle_does_not_leak_null_share_into_buckets(spark):
    """r10 review scenario: identical non-null distributions with an
    asymmetric null share must score ZERO drift when null_bucket=False."""
    a = _num(spark, [5.0] + [None] * 9)
    b = _num(spark, [5.0])
    rows = distribution_drift(
        a, b, value_col="x", boundaries=[10], null_bucket=False
    ).collect()
    assert all(r.psi == 0.0 for r in rows)
    # with the default null bucket the same shift IS the signal, carried
    # by the null bucket's own term, not smeared over the others
    with_null = {
        r.bucket: r.psi
        for r in distribution_drift(a, b, value_col="x", boundaries=[10]).collect()
    }
    assert with_null[NULL_BUCKET] > 10  # 0.9 vs eps
    assert abs(with_null["(-inf, 10)"]) < 3  # (0.1 vs 1.0), not eps-exploded


def test_boundary_values_fall_in_right_closed_left_bucket(spark):
    # cut at 10: value 10 belongs to [10, inf), 9.999... below
    out = {
        r.bucket: r.n_a
        for r in distribution_drift(
            _num(spark, [10.0, 9.999]), _num(spark, [0.0]), value_col="x", boundaries=[10]
        ).collect()
    }
    assert out["[10, inf)"] == 1 and out["(-inf, 10)"] == 1


def test_identical_snapshots_score_zero(spark):
    vals = [1.0, 2.0, 3.0, 50.0] * 5
    rows = distribution_drift(
        _num(spark, vals), _num(spark, vals), value_col="x", boundaries=[2, 10]
    ).collect()
    assert all(r.psi == 0.0 for r in rows)
    assert sum(r.psi for r in rows) == 0.0


def test_disjoint_snapshots_score_large(spark):
    rows = distribution_drift(
        _num(spark, [1.0] * 10), _num(spark, [100.0] * 10), value_col="x", boundaries=[50]
    ).collect()
    total = sum(r.psi for r in rows)
    assert total > 25  # two fully-moved buckets with eps-clamped zeros


def test_boundaries_validation(spark):
    a = _num(spark, [1.0])
    with pytest.raises(ValueError):
        distribution_drift(a, a, value_col="x", boundaries=[])
    with pytest.raises(ValueError):
        distribution_drift(a, a, value_col="x", boundaries=[5, 5])
    with pytest.raises(ValueError):
        distribution_drift(a, a, value_col="x", boundaries=[5, 1])


def test_categorical_psi_and_new_category(spark):
    a = ["en", "en", "en", "fr", None]
    b = ["en", "de", "de", "de"]
    out = {
        r.bucket: (r.n_a, r.n_b, r.psi)
        for r in categorical_drift(_cat(spark, a), _cat(spark, b), value_col="c").collect()
    }
    expect = {"en": (3, 1), "fr": (1, 0), "de": (0, 3), NULL_BUCKET: (1, 0)}
    assert set(out) == set(expect)
    for cat, (na, nb) in expect.items():
        assert out[cat] == (na, nb, _psi(na, nb, 5, 4)), cat
    # rows come back bucket-sorted
    order = [
        r.bucket
        for r in categorical_drift(_cat(spark, a), _cat(spark, b), value_col="c").collect()
    ]
    assert order == sorted(order)


def test_single_scan_per_input_and_tiny_window(spark):
    """Plan pin: each snapshot is scanned once (totals ride a global window
    over the bucket table, not a re-aggregating branch) and there is no
    join in the plan."""
    import os

    docs = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    plan = (
        distribution_drift(a, b, value_col="n_chars", boundaries=[200, 400, 800])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 2  # one per snapshot
    assert "Join" not in plan
    # the only range exchange allowed is the final |buckets|-row sort
    assert plan.count("Exchange rangepartitioning") <= 1


def test_empty_snapshot_side_is_all_eps(spark):
    """ANSI-mode edge (Spark 4 default): an empty snapshot must eps-clamp
    every bucket instead of raising DIVIDE_BY_ZERO — try_divide path."""
    a = _num(spark, [])
    b = _num(spark, [1.0, 30.0])
    out = {
        r.bucket: (r.n_a, r.n_b, r.psi)
        for r in distribution_drift(a, b, value_col="x", boundaries=[20]).collect()
    }
    assert out == {
        "(-inf, 20)": (0, 1, _psi(0, 1, 1, 2)),  # fa clamps to EPS
        "[20, inf)": (0, 1, _psi(0, 1, 1, 2)),
    }
