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
