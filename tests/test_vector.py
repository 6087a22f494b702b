"""Vector function tests — cosine semantics incl. the reference's zero-norm
guard (rag/embeddings/manager.py:69-98) and score clamping
(rag/database/search.py:53-56)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mcp_synaptic_spark.functions import vector as V


def _sim(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    return df.select(V.cosine_similarity(F.col("a"), F.col("b")).alias("s")).first().s


def test_cosine_identity(spark):
    assert abs(_sim(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) - 1.0) < 1e-12


def test_cosine_orthogonal(spark):
    assert abs(_sim(spark, [1.0, 0.0], [0.0, 1.0])) < 1e-12


def test_cosine_opposite(spark):
    assert abs(_sim(spark, [1.0, 0.0], [-1.0, 0.0]) + 1.0) < 1e-12


def test_cosine_zero_norm_guard(spark):
    # reference returns 0.0 when either vector has zero norm
    assert _sim(spark, [0.0, 0.0], [1.0, 2.0]) == 0.0
    assert _sim(spark, [1.0, 2.0], [0.0, 0.0]) == 0.0
    assert _sim(spark, [0.0, 0.0], [0.0, 0.0]) == 0.0


def test_cosine_known_value(spark):
    got = _sim(spark, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
    want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert abs(got - want) < 1e-12


def test_distance_to_score_clamps(spark):
    df = spark.createDataFrame([(d,) for d in [-0.5, 0.0, 0.3, 1.0, 1.7]], "d double")
    out = [r.s for r in df.select(V.distance_to_score(F.col("d")).alias("s")).collect()]
    # score = max(0, 1−d) clamped to [0,1]  (X17)
    assert out == [1.0, 1.0, 0.7, 0.0, 0.0]


def test_l2_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "v array<float>")
    out = df.select(V.l2_normalize(F.col("v")).alias("n")).collect()
    assert all(abs(x - y) < 1e-12 for x, y in zip(out[0].n, [0.6, 0.8]))
    assert out[1].n == [0.0, 0.0]  # zero vector passes through


def test_fixed_variants_accept_mixed_str_column(spark):
    # ADVICE r6: a mixed str/Column call used to fall into the Column branch
    # with the raw str and crash on .getItem — both orders must now work and
    # match the all-Column result bit-for-bit.
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>")
    want = df.select(V.cosine_similarity_fixed(F.col("a"), F.col("b"), 3).alias("s")).first().s
    for a, b in [("a", F.col("b")), (F.col("a"), "b")]:
        got = df.select(V.cosine_similarity_fixed(a, b, 3).alias("s")).first().s
        assert got == want
        d = df.select(V.dot_fixed(a, b, 3).alias("d")).first().d
        assert d == 32.0
