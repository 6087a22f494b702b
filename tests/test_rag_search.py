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


# --- bm25_search (r8, retrieval.py) -----------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_bm25_rare_term_outranks_common(spark):
    """idf: the doc matching the corpus-rare term must beat docs matching
    only the everywhere-term, at equal tf and length."""
    from mcp_synaptic_spark.operators.retrieval import bm25_search

    d = _docs(spark, [
        (1, "common rare pad1 pad2"),
        (2, "common other pad1 pad2"),
        (3, "common other pad3 pad4"),
        (4, "common other pad5 pad6"),
    ])
    out = bm25_search(d, "rare common", k=4).collect()
    assert out[0].doc_id == 1 and out[0].n_terms_matched == 2
    assert all(r.bm25 <= out[0].bm25 for r in out)


def test_bm25_tf_saturates_and_length_normalizes(spark):
    from mcp_synaptic_spark.operators.retrieval import bm25_search

    d = _docs(spark, [
        (1, "term x"),                       # tf=1, short
        (2, "term term term term term x"),   # tf=5, longer
        (3, "x y"),
    ])
    out = {r.doc_id: r.bm25 for r in bm25_search(d, "term", k=3).collect()}
    assert 3 not in out                      # non-matching doc absent
    assert out[2] > out[1] > 0               # higher tf wins, but...
    assert out[2] < 5 * out[1]               # ...sub-linearly (saturation)


def test_bm25_ties_break_on_doc_id(spark):
    from mcp_synaptic_spark.operators.retrieval import bm25_search

    d = _docs(spark, [(9, "a b"), (3, "a b"), (5, "a b")])
    out = [r.doc_id for r in bm25_search(d, "a", k=3).collect()]
    assert out == [3, 5, 9]


def test_bm25_empty_query_raises(spark):
    import pytest

    from mcp_synaptic_spark.operators.retrieval import bm25_search

    with pytest.raises(ValueError, match="non-empty"):
        bm25_search(_docs(spark, [(1, "a")]), "   ")


def test_bm25_case_insensitive_and_dedups_query_terms(spark):
    from mcp_synaptic_spark.operators.retrieval import bm25_search

    d = _docs(spark, [(1, "Alpha beta"), (2, "gamma beta")])
    a = {r.doc_id: r.bm25 for r in bm25_search(d, "ALPHA alpha", k=2).collect()}
    b = {r.doc_id: r.bm25 for r in bm25_search(d, "alpha", k=2).collect()}
    assert a == b and set(a) == {1}


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF math, full-outer membership flags, and tie-break: a doc in both
    lists beats a doc holding rank 1 in only one list (1/61+1/62 > 1/61)."""
    from mcp_synaptic_spark.operators.retrieval import hybrid_search_rrf

    lex = spark.createDataFrame([(10, 1), (20, 2)], "doc_id LONG, rank INT")
    sem = spark.createDataFrame([(20, 1), (30, 2)], "doc_id LONG, rank INT")
    out = {r.doc_id: r for r in hybrid_search_rrf(lex, sem, k=3).collect()}
    assert set(out) == {10, 20, 30}
    assert out[20].rank == 1 and out[20].in_lexical and out[20].in_semantic
    assert round(1 / 62 + 1 / 61, 6) == out[20].rrf
    assert out[10].in_lexical and not out[10].in_semantic
    assert not out[30].in_lexical and out[30].in_semantic
    # 10 (lex rank 1) vs 30 (sem rank 2): 1/61 > 1/62
    assert out[10].rank == 2 and out[30].rank == 3


def test_hybrid_rrf_equal_scores_tie_break_on_id(spark):
    from mcp_synaptic_spark.operators.retrieval import hybrid_search_rrf

    lex = spark.createDataFrame([(7, 1), (3, 2)], "doc_id LONG, rank INT")
    sem = spark.createDataFrame([(3, 1), (7, 2)], "doc_id LONG, rank INT")
    out = [r.doc_id for r in hybrid_search_rrf(lex, sem, k=2).collect()]
    assert out == [3, 7]  # identical rrf; ascending id wins


def test_with_query_vec_keeps_null_vec_id_rows(spark):
    """The entry helper's broadcast equi-key must be NULL-SAFE (ADVICE r9):
    a NULL vec_id row previously got a NULL join key and was silently
    dropped by the inner join — and the plan must still be a
    BroadcastHashJoin (the non-foldable-key contract), not a BNLJ."""
    import __spark_entry__ as entry

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (None, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = entry._with_query_vec(emb, 0)
    assert out.count() == 3  # NULL vec_id row survives
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
