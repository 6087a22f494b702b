"""Document CRUD transforms (SURVEY.md §2.9 Q9–Q12) — post-state checks,
mirroring the reference's integration style
(tests/integration/test_rag_integration.py:75-143 document lifecycle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import documents as DOC


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s1", 16),
            (2, "delta epsilon", "en", "s1", 13),
            (3, "zeta", "de", "s2", 4),
        ],
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _emb(spark):
    return spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        schema="vec_id bigint, embedding array<float>",
    )


def test_document_add_upserts_existing_id(spark):
    new = spark.createDataFrame(
        [(3, "zeta prime", "de", "s2", 10), (9, "new doc", "en", "s3", 7)],
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = DOC.document_add(_docs(spark), new)
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows == {1: "alpha beta gamma", 2: "delta epsilon", 3: "zeta prime", 9: "new doc"}


def test_document_get_joins_embedding_and_derives(spark):
    row = DOC.document_get(_docs(spark), _emb(spark), 1).collect()[0]
    assert row.content_length == 16
    assert row.word_count == 3
    assert row.embedding_dimension == 2
    assert len(row.content_hash) == 32


def test_document_get_missing_embedding_is_null(spark):
    emb = _emb(spark).where(F.col("vec_id") != 2)
    row = DOC.document_get(_docs(spark), emb, 2).collect()[0]
    assert row.embedding_dimension is None


def test_document_update_recomputes_derived(spark):
    out = DOC.document_update(_docs(spark), 2, F.lit("xx"))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[2].text == "xx"
    assert rows[2].content_length == 2 and rows[2].word_count == 1
    # untouched rows keep their content
    assert rows[1].text == "alpha beta gamma"


def test_document_delete_removes_both_sides(spark):
    docs_after, emb_after = DOC.document_delete(_docs(spark), _emb(spark), 3)
    assert docs_after.where(F.col("doc_id") == 3).count() == 0
    assert emb_after.where(F.col("vec_id") == 3).count() == 0
    assert docs_after.count() == 2 and emb_after.count() == 2


def test_document_delete_idempotent(spark):
    docs_after, _ = DOC.document_delete(_docs(spark), None, 42)
    assert docs_after.count() == 3


def test_document_update_with_reembed(spark):
    from mcp_synaptic_spark.sources.embedders import hash_embedder

    docs = _docs(spark)
    emb = hash_embedder(docs, dim=8).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    new_docs, new_emb = DOC.document_update_with_reembed(
        docs, emb, 2, F.lit("completely new text"), dim=8
    )
    # doc content replaced
    assert new_docs.where(F.col("doc_id") == 2).collect()[0].text == "completely new text"
    # re-embedded vector equals embedding of the NEW content, not the old
    got = new_emb.where(F.col("vec_id") == 2).collect()[0].embedding
    want = (
        hash_embedder(new_docs.where(F.col("doc_id") == 2), dim=8)
        .collect()[0]
        .embedding
    )
    old = emb.where(F.col("vec_id") == 2).collect()[0].embedding
    assert got == want and got != old
    # untouched rows keep their stored vectors
    keep = {r.vec_id: r.embedding for r in new_emb.where(F.col("vec_id") != 2).collect()}
    orig = {r.vec_id: r.embedding for r in emb.where(F.col("vec_id") != 2).collect()}
    assert keep == orig
