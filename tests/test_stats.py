"""Corpus profile stats (operators/stats.py): exact pass vs brute force,
sketch arm vs exact pass."""

from __future__ import annotations

import math

from mcp_synaptic_spark.operators.stats import corpus_summary, corpus_summary_approx


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_corpus_summary_matches_brute_force(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, " ".join("w%d" % rng.randrange(50) for _ in range(rng.randrange(1, 30))),
         f"s{rng.randrange(4)}")
        for i in range(200)
    ] + [(1000, "", "s0"), (1001, "   ", "s9")]  # empty-text edge: 0 words
    out = corpus_summary(_mk_docs(spark, rows)).collect()[0]

    counts = sorted(len(t.split()) for _, t, _ in rows)
    n = len(counts)
    assert out["n_docs"] == n
    assert out["total_words"] == sum(counts)
    assert out["min_words"] == counts[0]
    assert out["max_words"] == counts[-1]
    assert out["n_sources"] == len({s for _, _, s in rows})
    assert out["mean_words"] == round(sum(counts) / n, 6)
    mean = sum(counts) / n
    var = sum((c - mean) ** 2 for c in counts) / (n - 1)
    assert abs(out["stddev_words"] - math.sqrt(var)) < 1e-6

    def q(p):  # standard interpolated quantile ((n-1)*p rule)
        pos = (n - 1) * p
        lo, frac = int(pos), pos - int(pos)
        return counts[lo] if frac == 0 else counts[lo] + frac * (counts[lo + 1] - counts[lo])

    for p, col in ((0.5, "p50_words"), (0.9, "p90_words"), (0.99, "p99_words")):
        assert abs(out[col] - q(p)) < 1e-6, col


def test_sketch_arm_tracks_exact(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, " ".join("w" for _ in range(rng.randrange(1, 200))), f"s{rng.randrange(20)}")
        for i in range(3000)
    ]
    docs = _mk_docs(spark, rows)
    exact = corpus_summary(docs).collect()[0]
    approx = corpus_summary_approx(docs).collect()[0]
    # moments are the same exact power-sum code path in both
    assert approx["n_docs"] == exact["n_docs"]
    assert approx["total_words"] == exact["total_words"]
    assert approx["stddev_words"] == exact["stddev_words"]
    # HLL++ at rsd=0.02 on 20 true values: allow a generous ±10%
    assert abs(approx["n_sources"] - exact["n_sources"]) <= 2
    # GK at accuracy=10k on 3k rows is exact-rank: within one neighbor value
    for col in ("p50_words", "p90_words", "p99_words"):
        assert abs(approx[col] - exact[col]) <= 2.0, col
