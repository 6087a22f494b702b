"""Retrieval utilities (SURVEY.md §2.9 Q15 context assembly, Q17 extractive
summary, Q18 metadata-only search — reference rag/retrieval.py:46-216).

The reference folds these greedily in Python on collected results; here the
same greedy semantics compile to window functions (running totals per doc /
per result-rank) so they stay distributed: the per-document summary is a
narrow window over exploded sentences (partitioned by doc — scales out), and
context assembly windows over the ≤k search results only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def document_summary(
    docs: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_summary_length: int = 200,
) -> DataFrame:
    """Q17 — extractive summary: split on '. ', accumulate sentences in
    order while the running summary (sentences joined by '. ') stays within
    max_summary_length; the first sentence is always kept
    (reference rag/retrieval.py:138-187).

    Output: (id, summary, n_sentences).
    """
    sent = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(content_col), r"\. ")).alias("pos", "sentence"),
    )
    # running length of 'summary so far including me': Σ len + 2 per separator
    w = Window.partitionBy("id").orderBy("pos")
    cum = F.sum(F.length("sentence") + 2).over(w) - 2  # k sentences ⇒ k−1 separators
    kept = sent.withColumn("cum_len", cum).where((F.col("cum_len") <= max_summary_length) | (F.col("pos") == 0))
    # first sentence may exceed the budget on its own — it is still kept, but
    # then nothing else is (cum_len already blocks followers).
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "sentence"))), lambda s: s.sentence),
            ". ",
        ).alias("summary"),
        F.count("*").cast("int").alias("n_sentences"),
    )
    return agg


def search_by_metadata(
    docs: DataFrame,
    predicate: Column,
    *,
    id_col: str = "doc_id",
    limit: int = 10,
) -> DataFrame:
    """Q18 — metadata-only listing: filter + deterministic order + limit
    (reference rag/retrieval.py:189-216 runs Q13 with empty query and
    threshold 0 — i.e. a pure metadata filter)."""
    return docs.where(predicate).orderBy(F.col(id_col).asc()).limit(limit)


def assemble_context(
    ranked_docs: DataFrame,
    *,
    content_col: str = "content",
    rank_col: str = "rank",
    max_context_length: int = 1000,
    min_truncate: int = 100,
) -> DataFrame:
    """Q15 — greedy context assembly over ranked search results
    (reference rag/retrieval.py:46-98): walk results in rank order, append
    each document ('\\n\\n' separator) while it fits the char budget; when the
    next document does not fit but ≥ min_truncate chars remain, append its
    truncated head + '...' and stop.

    Pure window expression over the ≤k result rows (never the corpus):
      prev_cum  = chars consumed by all fully-included predecessors
      include   = running AND of 'fits so far'
      truncated = first non-fitting doc, if the leftover budget allows
    Output: one row (context, n_docs, n_chars).
    """
    sep_len = 2  # '\n\n'
    w = Window.orderBy(rank_col)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)

    clen = F.length(F.col(content_col))
    # cost of me = len + separator if I have a predecessor
    with_cost = ranked_docs.withColumn(
        "_cost", clen + F.when(F.row_number().over(w) > 1, sep_len).otherwise(0)
    )
    fits = F.sum("_cost").over(w) <= max_context_length
    flagged = with_cost.withColumn("_fits", fits.cast("int"))
    # include = every result up to me fits (running min of _fits)
    flagged = flagged.withColumn("_include", F.min("_fits").over(w))
    # leftover budget after the included prefix
    flagged = flagged.withColumn("_prev_cum", F.coalesce(F.sum(F.when(F.col("_include") == 1, F.col("_cost"))).over(wprev), F.lit(0)))
    first_excluded = (F.col("_include") == 0) & (
        F.coalesce(F.min("_include").over(wprev), F.lit(1)) == 1
    )
    leftover = max_context_length - F.col("_prev_cum") - sep_len
    flagged = flagged.withColumn(
        "_part",
        F.when(F.col("_include") == 1, F.col(content_col)).when(
            first_excluded & (leftover >= min_truncate),
            F.concat(F.col(content_col).substr(F.lit(1), leftover - 3), F.lit("...")),
        ),
    )
    assembled = flagged.where(F.col("_part").isNotNull()).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(rank_col).alias("r"), F.col("_part").alias("p")))),
                lambda s: s.p,
            ),
            "\n\n",
        ).alias("context"),
        F.count("*").cast("int").alias("n_docs"),
    )
    return assembled.withColumn("n_chars", F.length("context"))



def bm25_search(
    docs: DataFrame,
    query: str,
    *,
    k: int = 10,
    content_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword search over the corpus — the lexical complement of the
    embedding-based rag_search (Q13). The reference retrieves by vector
    similarity only (rag/retrieval.py:46-136); production RAG stacks pair
    that with a term-frequency ranker for hybrid retrieval, so this is part
    of the beyond-reference retrieval tier. Formula: Lucene's BM25
    (Robertson idf, ln(1 + (N - df + 0.5)/(df + 0.5))), summed over the
    distinct query terms in sorted order.

    Scale shape — ZERO data shuffles for a keyword-sized query:
    - Because |Q| is small and fixed per call, per-term tf is an ARRAY
      EXPRESSION over each doc's token list (size(filter(toks, t = term))),
      not an exploded postings table: one narrow projection per doc, no
      (doc, term) shuffle, no Generate fan-out.
    - df per term, corpus size, and avgdl all come from ONE 1-row aggregate
      over that projection, broadcast back (the accepted 1-row-broadcast
      pattern); scoring is then a pure per-row expression with the sum over
      terms in FIXED index order — deterministic fp addition, same order as
      the oracle.
    - top-k compiles to TakeOrderedAndProject (per-partition heaps, no
      global sort) — the rag_search shape. Net: two column-pruned corpus
      scans (stats + scoring; cache the projection to make it one) and a
      k-row result. Ties break on ascending id for cross-engine
      determinism.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("bm25_search requires a non-empty query")
    toks = F.expr(
        f"IF(trim(lower(`{content_col}`)) = '', CAST(array() AS ARRAY<STRING>), "
        f"split(trim(lower(`{content_col}`)), '\\\\s+'))"
    )
    # project toks ONCE, then derive counts (HOF lambdas have no CSE — the
    # PLANS note-1 lesson; a single-projection form would re-split per term)
    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "\\'")

    # tokenize + per-term HOF counts are CPU-bound; fan out when the corpus
    # parquet is a single compressed split (the r11 index-build lesson,
    # PLANS note 104) so the map stage uses every core
    from ..util import ensure_parallelism

    per_doc = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), toks.alias("toks")
    ).select(
        "id",
        F.size("toks").alias("dl"),
        *[
            F.expr(f"size(filter(toks, t -> t = '{esc(t)}'))").alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    idf = [
        F.log(1.0 + (F.col("n_docs") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5))
        for i in range(len(terms))
    ]
    tf = [F.col(f"_tf_{i}").cast("double") for i in range(len(terms))]
    contrib = [
        F.when(
            tf[i] > 0,
            idf[i] * tf[i] * (k1 + 1) / (tf[i] + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        for i in range(len(terms))
    ]
    score = contrib[0]
    for c in contrib[1:]:  # fixed left-to-right order — oracle mirrors it
        score = score + c
    n_matched = None
    for i in range(len(terms)):
        m = (tf[i] > 0).cast("int")
        n_matched = m if n_matched is None else n_matched + m
    return (
        scored.where(n_matched > 0)
        .select(
            F.col("id").alias(id_col),
            F.round(score, 6).alias("bm25"),
            n_matched.alias("n_terms_matched"),
        )
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def hybrid_search_rrf(
    lexical: DataFrame,
    semantic: DataFrame,
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of two
    ranked result lists — the standard way production RAG stacks combine a
    lexical ranker (bm25_search) with a vector ranker (rag_search) without
    score calibration: rrf(d) = Σ_lists 1/(k0 + rank_list(d)), k0 = 60 per
    the paper. Deterministic given the inputs, so the composed query is
    fully hash-oracle-able.

    Inputs are (id, rank) frames of ≤ top-n rows each (the two rankers'
    outputs — already tiny), so the fusion join is broadcast-sized whatever
    the corpus size; ties break on ascending id. Output: (id, rrf,
    in_lexical, in_semantic, rank).
    """
    a = lexical.select(F.col(id_col).alias("id"), F.col(rank_col).alias("_ra"))
    b = semantic.select(F.col(id_col).alias("id"), F.col(rank_col).alias("_rb"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        F.round(
            F.coalesce(1.0 / (F.lit(k0) + F.col("_ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k0) + F.col("_rb")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.col("_ra").isNotNull().alias("in_lexical"),
        F.col("_rb").isNotNull().alias("in_semantic"),
    )
    w = Window.orderBy(F.desc("rrf"), F.col("id").asc())
    return (
        fused.orderBy(F.desc("rrf"), F.col("id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("id").alias(id_col), "rrf", "in_lexical", "in_semantic", "rank"
        )
    )
