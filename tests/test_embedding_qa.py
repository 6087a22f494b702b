"""Embedding hygiene screen (operators/embedding_qa.py)."""

import math

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators.embedding_qa import embedding_screen


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_screen_flags_each_failure_mode(spark):
    good = [0.5] * 4
    rows = [
        (1, good),                          # valid (norm 1.0)
        (2, [float("nan"), 0.5, 0.5, 0.5]),  # nonfinite
        (3, [float("inf"), 0.5, 0.5, 0.5]),  # nonfinite
        (4, [0.0, 0.0, 0.0, 0.0]),           # zero (also norm_low)
        (5, [0.1, 0.0, 0.0, 0.0]),           # norm_low
        (6, [9.0, 0.0, 0.0, 0.0]),           # norm_high
        (7, [0.5, 0.5, 0.5]),                # bad_dim
        (8, None),                           # bad_dim, NULL norm
    ]
    out = {r.vec_id: r for r in embedding_screen(_emb(spark, rows), dim=4).collect()}
    assert out[1].is_valid and out[1].norm == 1.0
    assert out[2].nonfinite and out[2].norm is None and not out[2].is_valid
    assert out[3].nonfinite and not out[3].is_valid
    assert out[4].zero and out[4].norm_low and not out[4].is_valid
    assert out[5].norm_low and not out[5].zero and not out[5].is_valid
    assert out[6].norm_high and not out[6].is_valid
    assert out[7].bad_dim and out[7].n_dims == 3 and not out[7].is_valid
    assert out[8].bad_dim and out[8].n_dims == -1 and out[8].norm is None
    assert out[5].norm == round(0.1, 6)
    assert out[6].norm == 9.0


def test_screen_zero_shuffle_single_scan(spark, tmp_path):
    path = str(tmp_path / "emb")
    _emb(spark, [(1, [1.0, 0.0])]).write.parquet(path)
    df = embedding_screen(spark.read.parquet(path), dim=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1
    assert df.collect()[0].is_valid


def test_screen_norm_matches_math(spark):
    rows = [(i, [float(i + 1) / 10] * 4) for i in range(5)]
    out = embedding_screen(_emb(spark, rows), dim=4, min_norm=0.0, max_norm=99.0)
    for r in out.collect():
        v = (r.vec_id + 1) / 10
        assert r.norm == round(math.sqrt(4 * v * v), 6)
        assert r.is_valid or r.zero
