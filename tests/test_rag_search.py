"""RAG search pipeline tests — ordering/threshold/rank invariants from the
reference's integration spec (tests/integration/test_rag_integration.py:
strictly score-descending results, rank assigned after threshold filter,
self-exclusion in find_similar)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import rag as R


def _emb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
        (5, [0.0, 0.0, 0.0]),  # zero vector
    ]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_rag_search_ordering_and_rank(spark):
    out = R.rag_search(_emb(spark), [1.0, 0.0, 0.0], threshold=0.0, limit=10).collect()
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)  # strictly score-descending
    assert [r.rank for r in out] == list(range(1, len(out) + 1))  # 1-based dense
    assert out[0].id == 1 and out[0].score == 1.0


def test_rag_search_threshold_applied_before_rank(spark):
    out = R.rag_search(_emb(spark), [1.0, 0.0, 0.0], threshold=0.9, limit=10).collect()
    # only ids 1 (1.0) and 2 (~0.994) survive; ranks restart at 1
    assert [r.id for r in out] == [1, 2]
    assert [r.rank for r in out] == [1, 2]


def test_rag_search_zero_vector_scores_zero(spark):
    out = {r.id: r.score for r in R.rag_search(_emb(spark), [1.0, 0.0, 0.0], threshold=0.0, limit=10).collect()}
    assert out[5] == 0.0  # zero-norm guard


def test_rag_search_k_capped_by_max_results(spark):
    # reference search.py:38: n_results = min(limit, MAX_RAG_RESULTS)
    out = R.rag_search(_emb(spark), [1.0, 0.0, 0.0], threshold=0.0, limit=100, max_results=3).collect()
    assert len(out) == 3


def test_find_similar_excludes_self(spark):
    out = R.find_similar(_emb(spark), 1, threshold=0.0, limit=10).collect()
    assert all(r.id != 1 for r in out)
    assert out[0].id == 2  # nearest neighbor of [1,0,0]


def test_batch_topk_per_query(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("id") <= 2).select(F.col("id").alias("qid"), F.col("embedding").alias("qvec"))
    out = R.batch_topk_join(queries, emb, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 2
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
        assert sorted(rows, key=lambda r: r.rank)[0].id == q  # self is nearest
