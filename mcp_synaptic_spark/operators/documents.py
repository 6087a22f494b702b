"""RAG document store operations (SURVEY.md §2.9 Q9–Q12, §2.1 S7–S9, §2.2 P1).

The reference mutates a ChromaDB collection in place (rag/database/
documents.py:22-186); the Spark re-expression treats the documents +
embeddings tables as immutable state and each operation as a deterministic
batch transform (state, args) → state' — the same model operators/memory.py
uses for the memory table. Correctness is checked on post-state, matching the
reference's integration-test style (tests/integration/test_rag_integration.py).

Scale notes
-----------
- Upserts dedupe per key with one window over the id — a single keyed
  shuffle; on Delta this is a MERGE INTO instead.
- Point reads (document_get) are filter + broadcast-able join: the predicate
  pushes to the parquet scan, so at 100 TB a get touches only matching
  row-groups, not the corpus.
- Delete rewrites are filter scans (Delta: DELETE WHERE) on both tables;
  the embeddings row is dropped with its document (reference documents.py:
  170-186 deletes both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import content_hash, content_length, word_count


def with_derived(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """P1/X12/X13 — system-derived columns the reference stores as metadata
    (content_length/word_count models/rag.py:40-48; content_hash :35-38)."""
    c = F.col(content_col)
    return (
        docs.withColumn("content_length", content_length(c))
        .withColumn("word_count", word_count(c))
        .withColumn("content_hash", content_hash(c))
    )


def document_add(
    docs: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Q9 — add documents; an existing id is replaced (upsert), mirroring the
    reference's add-then-Chroma-upsert behavior (rag/database/documents.py:
    22-64). One window-dedupe keyed shuffle; Delta MERGE at scale."""
    prio = F.lit(0)
    merged = docs.withColumn("_prio", prio).unionByName(new_docs.withColumn("_prio", F.lit(1)))
    w = Window.partitionBy(id_col).orderBy(F.col("_prio").desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def document_get(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    doc_id=None,
    *,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    content_col: str = "text",
) -> DataFrame:
    """Q10/S8 — point read with the system-metadata split (P1) and the
    doc↔embedding identity join (J2, reference documents.py:66-111). The id
    predicate pushes down to both parquet scans."""
    out = with_derived(docs.where(F.col(id_col) == doc_id), content_col)
    if embeddings is not None:
        emb = embeddings.where(F.col(emb_id_col) == doc_id).select(
            F.col(emb_id_col).alias(id_col), F.size("embedding").alias("embedding_dimension")
        )
        out = out.join(emb, id_col, "left")
    return out


def document_update(
    docs: DataFrame,
    doc_id,
    new_content: Column,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Q11 — update = delete + re-add with fresh content (the reference
    re-embeds and re-adds rather than patching in place, rag/database/
    documents.py:113-168). Derived columns recompute for the touched row;
    the caller re-runs the embedder source for the new content."""
    hit = F.col(id_col) == doc_id
    return with_derived(
        docs.withColumn(content_col, F.when(hit, new_content).otherwise(F.col(content_col))),
        content_col,
    )


def document_update_with_reembed(
    docs: DataFrame,
    embeddings: DataFrame,
    doc_id,
    new_content: Column,
    *,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    content_col: str = "text",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Q11 full semantics — content change triggers RE-EMBEDDING (the
    reference deletes + re-adds doc AND vector, rag/database/documents.py:
    113-168; behavior pinned by its integration test
    tests/integration/test_rag_integration.py:75-143).

    The updated row's new vector comes from the deterministic hash embedder
    (swap for the API provider in production); untouched rows keep their
    stored vectors — only the single re-embedded row passes through Python.
    """
    from ..sources.embedders import hash_embedder

    new_docs = document_update(docs, doc_id, new_content, id_col=id_col, content_col=content_col)
    changed = new_docs.where(F.col(id_col) == doc_id)
    new_vec = hash_embedder(changed, id_col=id_col, content_col=content_col, dim=dim).select(
        F.col(id_col).alias(emb_id_col), "embedding"
    )
    kept = embeddings.where(F.col(emb_id_col) != doc_id).select(emb_id_col, "embedding")
    return new_docs, kept.unionByName(new_vec)


def document_delete(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    doc_id=None,
    *,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame | None]:
    """Q12/S9 — idempotent delete from both tables (reference documents.py:
    170-186 checks existence then deletes doc + vector together)."""
    docs_after = docs.where(F.col(id_col) != doc_id)
    emb_after = None if embeddings is None else embeddings.where(F.col(emb_id_col) != doc_id)
    return docs_after, emb_after
