"""RAG search / similarity operators (SURVEY.md §2.9 Q13–Q19).

The reference delegates k-NN to an in-process ChromaDB HNSW index
(rag/database/search.py:21-101). Spark-first re-expression: exact brute-force
cosine as a one-pass scan + ``TakeOrderedAndProject`` (per-partition top-k
heaps, driver merge — no shuffle of the corpus), with the query vector folded
into the plan as a literal (broadcast to every task). At 100 TB this is the
exact baseline; `operators/similarity.py` adds the LSH-bucketed approximate
path for latency-sensitive scale.

Determinism contract (for the DuckDB oracle): scores are computed in fp64,
ordering uses ``round(score, 9)`` with the id as tiebreak, and emitted scores
are rounded to 6 dp so order-insensitive value hashes are bit-stable across
engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, cosine_similarity_fixed, distance_to_score
from ..schemas import DEFAULT_SIMILARITY_THRESHOLD, MAX_RAG_RESULTS

ROUND_DP = 6  # emitted float precision
ORDER_DP = 9  # precision used for ordering / ranking


def query_vector_lit(vec: Sequence[float]) -> Column:
    """Embed the query vector into the plan as an ARRAY<DOUBLE> literal.

    A literal reaches every task with the plan itself — the moral equivalent
    of a broadcast variable, with zero extra shuffle.
    """
    return F.array(*[F.lit(float(x)) for x in vec])


def _sim(a: Column | str, b: Column | str, dim: int | None) -> Column:
    """Cosine: unrolled codegen form when the dimension is known (hot paths),
    interpreted HOF fold otherwise — identical fold order, identical values
    (functions/vector.py:dot_fixed). Accepts column names (preferred on hot
    paths: one parsed SQL expression instead of ~6·dim py4j calls) or Column
    objects (computed/literal vectors)."""
    if dim:
        return cosine_similarity_fixed(a, b, dim)
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return cosine_similarity(a, b)


def score_against(
    embeddings: DataFrame,
    query: Column | str,
    vec_col: str = "embedding",
    *,
    dim: int | None = None,
) -> DataFrame:
    """Append distance/score columns for one query vector (X17 + X18).

    The cosine is clamped into [-1, 1] before 1 - cos: fp error on a
    self-match can give cos = 1 + 2e-16, whose distance rounds to -0.0 —
    bit-different from 0.0 under value-hash comparison. The oracle SQL
    applies the identical clamp.

    ``query`` may be a column NAME (preferred on hot paths with ``dim``
    set: the whole unrolled cosine is then built as ONE parsed SQL
    expression — see functions/vector.py:dot_fixed) or a Column
    (computed/literal vectors). The textual duplication of the cosine in
    distance + score is erased at runtime by whole-stage codegen's
    subexpression elimination — both columns read one evaluated slot.
    """
    a: Column | str = vec_col if isinstance(query, str) else F.col(vec_col)
    sim = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), _sim(a, query, dim)))
    return embeddings.withColumn("distance", F.round(F.lit(1.0) - sim, ROUND_DP)).withColumn(
        "score", F.round(distance_to_score(F.lit(1.0) - sim), ROUND_DP)
    )


def rag_search(
    embeddings: DataFrame,
    query: Column | Sequence[float],
    documents: DataFrame | None = None,
    *,
    limit: int = MAX_RAG_RESULTS,
    threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
    max_results: int = MAX_RAG_RESULTS,
    id_col: str = "id",
    vec_col: str = "embedding",
    doc_id_col: str = "id",
    metadata_predicate: Column | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Q13 — the flagship pipeline (reference rag/database/search.py:21-101).

    embed query → (optional metadata pre-filter) → cosine → score=max(0,1−d)
    → top-k (k = min(limit, max_results), reference search.py:38) →
    threshold filter → 1-based rank (search.py:89-98).

    The threshold is applied AFTER the top-k limit — set-identical to the
    reference's filter-then-top-k at any threshold: if ≥ k rows clear the
    threshold, the k best overall all clear it (both forms = the k best);
    if fewer do, the overall top-k contains every clearing row (they are
    the global head) and the post-filter keeps exactly those. Rank is
    assigned after the filter either way, over the same rows in the same
    total order. The placement matters physically (r9-r10 measurement,
    PLANS): a pre-top-k threshold referencing the scored corpus gets
    pushed into the broadcast join's condition, where the cosine evaluates
    INTERPRETED per corpus row and a third textual copy of it overflows
    the JVM's 64 KB codegen budget in unrolled form; post-limit it touches
    ≤ k rows and the scan pipeline keeps one codegen'd cosine (CSE merges
    the distance/score pair).

    Physical shape: corpus scan with the projection pushed to parquet;
    per-partition top-k heap (TakeOrderedAndProject) — the corpus is never
    shuffled; the k surviving rows then join `documents` (broadcast — k ≤
    100 rows).
    """
    if not isinstance(query, (Column, str)):
        query = query_vector_lit(query)
    k = min(limit, max_results)

    scored = score_against(embeddings, query, vec_col, dim=dim)
    if documents is not None:
        scored = scored.join(documents, scored[id_col] == documents[doc_id_col]).drop(documents[doc_id_col])
    if metadata_predicate is not None:
        scored = scored.where(metadata_predicate)

    topk = (
        scored.orderBy(F.round(F.col("score"), ORDER_DP).desc(), F.col(id_col).asc())
        .limit(k)
        .where(F.col("score") >= threshold)
    )
    # rank over ≤k rows — the single-partition window is on the tiny result set,
    # never on the corpus.
    w = Window.orderBy(F.round(F.col("score"), ORDER_DP).desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w))


def find_similar(
    embeddings: DataFrame,
    target_id,
    documents: DataFrame | None = None,
    *,
    limit: int = MAX_RAG_RESULTS,
    threshold: float = 0.8,
    id_col: str = "id",
    vec_col: str = "embedding",
    doc_id_col: str = "id",
    dim: int | None = None,
) -> DataFrame:
    """Q16 — docs similar to a given doc, excluding itself
    (reference rag/retrieval.py:100-136: fetch k+1 then filter id ≠ target).

    The similarity threshold moves after the top-k limit — set-identical
    (the rag_search argument); the self-exclusion stays BEFORE the top-k,
    it shapes the candidate set.
    """
    target_vec = F.first(F.col(vec_col))
    qrow = embeddings.where(F.col(id_col) == target_id).agg(target_vec.alias("qv"))
    # single-row broadcast cross join — the query vector rides along with every task
    scored = score_against(
        embeddings.crossJoin(F.broadcast(qrow)),
        "qv",
        vec_col,
        dim=dim,
    ).drop("qv")
    scored = scored.where(F.col(id_col) != target_id)
    if documents is not None:
        scored = scored.join(documents, scored[id_col] == documents[doc_id_col]).drop(documents[doc_id_col])
    topk = (
        scored.orderBy(F.round(F.col("score"), ORDER_DP).desc(), F.col(id_col).asc())
        .limit(limit)
        .where(F.col("score") >= threshold)
    )
    w = Window.orderBy(F.round(F.col("score"), ORDER_DP).desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w))


def pairwise_similarity(embeddings: DataFrame, id_a, id_b, *, id_col: str = "id", vec_col: str = "embedding") -> DataFrame:
    """Q19 — compute_similarity(text1, text2) as a 1-row plan
    (reference rag/embeddings/manager.py:69-98)."""
    a = embeddings.where(F.col(id_col) == id_a).select(F.col(vec_col).alias("va"))
    b = embeddings.where(F.col(id_col) == id_b).select(F.col(vec_col).alias("vb"))
    return a.crossJoin(F.broadcast(b)).select(
        F.lit(str(id_a)).alias("id_a"),
        F.lit(str(id_b)).alias("id_b"),
        F.round(cosine_similarity(F.col("va"), F.col("vb")), ROUND_DP).alias("similarity"),
    )


def batch_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 3,
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    id_col: str = "id",
    vec_col: str = "embedding",
    carry_cols: Sequence[str] = (),
    broadcast_queries: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """N×M batch similarity join: top-k corpus neighbors per query row.

    Physical shape: broadcast the (small) query side, stream the corpus once;
    per-query top-k via a window partitioned by query id — the shuffle moves
    only (qid, id, score[, carry]) tuples, never the vectors, and partitioning
    by qid spreads the ranking across the cluster (no global single-partition
    sort).
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    sim = _sim(vec_col, query_vec_col, dim)
    scored = (
        corpus.crossJoin(q)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(distance_to_score(F.lit(1.0) - sim), ROUND_DP).alias("score"),
            *[F.col(c) for c in carry_cols],
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round(F.col("score"), ORDER_DP).desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    label_col: str = "label",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    id_col: str = "id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Majority label among the k nearest corpus vectors, per query.

    Ties broken toward the smaller label value (deterministic).
    """
    nn = batch_topk_join(
        queries,
        corpus.select(id_col, vec_col, label_col),
        k=k,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        id_col=id_col,
        vec_col=vec_col,
        carry_cols=(label_col,),
        dim=dim,
    )
    counts = nn.groupBy(query_id_col, label_col).agg(F.count("*").alias("votes"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("votes").desc(), F.col(label_col).asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(query_id_col), F.col(label_col).alias("predicted_label"), F.col("votes"))
    )
