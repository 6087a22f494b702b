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
hot path), then ONE token-volume shuffle to (term, group, doc) grain;
df attaches as a window count over term (a doc has one group, so the
per-(doc, term) row count per term IS df) and the tf groupBy reuses the
term hash partitioning (hash(term) already co-locates every (group, term)
pair — no new exchange).  N is the one extra pass (a null-mask-only scan:
docs-with-text is not derivable from any vocab-grain aggregate, and Spark
plans no exchange reuse across aggregation grains — measured, r9 review),
attached as the engine's 1-row broadcast.  Top-k is a window rank per
group over vocab-sized rows.

The token-volume shuffle carries (key, count) pairs with map-side partial
aggregation — wire volume is vocab-bounded per partition, not
token-bounded.  Skew: natural-language term frequency is Zipfian, but the
partial agg collapses each partition's duplicates before the exchange, so
the hot term costs one row per upstream partition.  Corpus scans: exactly
TWO (main chain + N), pinned in tests/test_plan_shapes.py.
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
    # (doc, term) grain first: a document has ONE group, so the row count
    # per term over this relation IS df — attached as a window aggregate
    # (hash-partitioned by term), which removes the separate df branch and
    # its second corpus scan (Spark does not reuse the exchange across the
    # two aggregation grains — measured, r9 review). The groupBy(group,
    # term) that follows needs no new exchange either: hash(term) already
    # co-locates every (group, term) pair.
    per_doc = toks.groupBy("term", group_col, id_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("term")
    per_doc = per_doc.withColumn("df", F.count(F.lit(1)).over(w))
    tf = per_doc.groupBy(group_col, "term").agg(
        F.sum("c").alias("tf"), F.first("df").alias("df")
    )
    # N is the one remaining second pass: docs-with-text is not derivable
    # from any vocab-grain aggregate without re-consuming the chain (no
    # exchange reuse), and the scan it costs reads only the text column's
    # null mask
    n = (
        docs.where(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    scored = tf.join(F.broadcast(n)).withColumn(
        "score",
        F.round(
            F.col("tf")
            * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
            6,
        ),
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

    Physical shape: tokenize → distinct (group, term) with the group's
    vocab size attached as a WINDOW count (no separate sizes branch — the
    exchange is not reused across aggregation grains, so a sizes groupBy
    would re-scan the corpus; measured, r9 review) → self equi-join on
    term for intersections, vocab_a/vocab_b riding the join sides.  The
    self-join still evaluates its input twice (two corpus scans — Spark
    plans no exchange reuse here either), the per-term fan-out is bounded
    by |groups|² regardless of corpus size, and the G×G result is tiny.
    Groups with no tokens simply don't appear (their Jaccard with anything
    is 0/undefined)."""
    w = Window.partitionBy("g")
    gt = (
        tokens(docs, text_col=text_col, extra_cols=(group_col,))
        .select(F.col(group_col).alias("g"), "term")
        .distinct()
        .withColumn("vocab", F.count(F.lit(1)).over(w))
    )
    a, b = gt.alias("a"), gt.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.vocab")).alias("vocab_a"),
            F.first(F.col("b.vocab")).alias("vocab_b"),
        )
    )
    return inter.select(
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
