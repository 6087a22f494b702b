"""Corpus term statistics: TF-IDF characteristic terms per group
(beyond-reference tier).

The reference has no term-level analytics at all (its text surface is
store/embed/search — reference ``mcp_synaptic/rag/``); the engine's
text_analysis tier scores documents, BM25 ranks them.  This adds the
corpus-curation staple in between: **which terms characterize a slice of
the corpus** (a language, a source, a topic bucket) — the first tool
reached for when auditing what a 100 TB crawl actually contains per
domain, and the classic TF-IDF keyword extractor.

Semantics (standard smooth-idf TF-IDF, sklearn's formulation):

    tf(g, t)  = number of occurrences of term t in group g
    df(t)     = number of DOCUMENTS containing t (corpus-wide)
    idf(t)    = ln((N + 1) / (df(t) + 1)) + 1          (N = docs with text)
    score     = tf * idf, rounded to 6dp

Top-k terms per group by (rounded score desc, term asc) — ranking on the
ROUNDED score keeps the cross-engine tie-break deterministic even when
the two engines' ln() differ in the last ulp.

Physical shape: tokenize with a codegen split/explode (no Python in the
hot path), then

    tf   : groupBy(group, term).count()          [shuffle 1 — token-volume]
    df   : groupBy(term).agg(count_distinct(doc))[shuffle 2 — token-volume]
    join : tf ⋈ df on term                       [both already aggregated:
           vocab-sized inputs, AQE picks the strategy]
    N    : 1-row broadcast (the engine's standard stats-attach pattern)
    topk : window rank per group over vocab-sized rows

Both token-volume shuffles carry (key, count) pairs with map-side partial
aggregation — the wire volume is vocab-bounded per partition, not
token-bounded.  Skew: natural-language term frequency is Zipfian, but the
partial agg collapses each partition's duplicates before the exchange, so
the hot term costs one row per upstream partition.  No stage reads the
corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"
MIN_TOKEN_LEN = 2


def tokens(docs: DataFrame, *, text_col: str = "text", extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """One row per token occurrence: (doc-identifying extra cols..., term).
    Lowercased, split on non-alphanumeric runs, tokens shorter than
    MIN_TOKEN_LEN dropped."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(*extra_cols, F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"))
        .where(F.length("term") >= MIN_TOKEN_LEN)
    )


def tfidf_terms(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
) -> DataFrame:
    """Top-k characteristic terms per group:
    (group, term, tf, df, score, rank)."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toks = tokens(docs, text_col=text_col, extra_cols=(group_col, id_col))
    tf = toks.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    n = (
        docs.where(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(group_col, "term", "tf", "df", "score", "rank")
    )


def group_vocab_overlap(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus slices — "how much do two
    crawl sources speak the same language": one row per unordered group
    pair (group_a < group_b) with vocab sizes, intersection size, and
    jaccard rounded to 6dp.

    Physical shape: ONE tokenize pass → distinct (group, term) [the only
    token-volume shuffle; everything after is vocab-sized] → self equi-join
    on term for intersections + a groupBy for sizes.  The per-term join
    fan-out is bounded by |groups|² regardless of corpus size, and the
    G×G result is tiny, so this stays two vocab-sized shuffles at 100 TB.
    Groups with no tokens simply don't appear (their Jaccard with anything
    is 0/undefined)."""
    gt = (
        tokens(docs, text_col=text_col, extra_cols=(group_col,))
        .select(F.col(group_col).alias("g"), "term")
        .distinct()
    )
    sizes = gt.groupBy("g").agg(F.count(F.lit(1)).alias("vocab"))
    a, b = gt.alias("a"), gt.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("g").alias("group_a"), F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("g").alias("group_b"), F.col("vocab").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
