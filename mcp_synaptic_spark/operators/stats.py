"""Corpus summary statistics (beyond-reference tier).

The first thing anyone does to a 100 TB corpus is profile it: how long are
the documents, how skewed, how many sources. The reference exposes only
count/avg stubs (rag/database/documents.py:get_collection_stats); this
module is the full one-pass profile plus the sketch arm you actually run
at scale.

- ``corpus_summary`` is ONE aggregate pass: count / min / max / mean,
  variance from exact integer power sums (word counts are integers, so
  sum and sum-of-squares are exact BIGINTs and the result is bit-stable
  under any partitioning — a streamed ``stddev_samp`` merge is
  order-dependent and can flap a value hash), and exact interpolated
  percentiles via ``F.percentile``. Exact percentiles shuffle the column
  to a single reducer per group — acceptable for a profile run, and the
  oracle-checkable ground truth for the sketch arm.
- ``corpus_summary_approx`` swaps the two scale cliffs for sketches:
  ``percentile_approx`` (GK, bounded error, mergeable) and
  ``approx_count_distinct`` (HLL++) — single narrow pass, no per-value
  shuffle, the form to run on the full corpus. Accuracy is pinned against
  the exact pass in tests, not against an oracle (it is approximate by
  contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_count
from ..util import ensure_parallelism

PCTS = (0.5, 0.9, 0.99)


def _profile_cols(words: Column) -> list[Column]:
    n = F.count(F.lit(1))
    s = F.sum(words)  # exact: BIGINT sum of ints
    s2 = F.sum(words * words)  # exact while n_docs * max_len^2 << 2^63
    # sample variance from power sums: (s2 - s^2/n) / (n-1), computed in
    # fp64 only at the very end — deterministic because s, s2, n are exact
    var = (s2.cast("double") - s.cast("double") * s.cast("double") / n) / (n - 1)
    return [
        n.alias("n_docs"),
        s.alias("total_words"),
        F.min(words).alias("min_words"),
        F.max(words).alias("max_words"),
        F.round(s.cast("double") / n, 6).alias("mean_words"),
        F.round(F.sqrt(var), 6).alias("stddev_words"),
    ]


def corpus_summary(
    docs: DataFrame, *, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Exact one-row corpus profile: counts, moments, p50/p90/p99.

    ``F.percentile`` is the exact interpolated quantile (same definition as
    standard ``quantile_cont``): at 100 TB this is the audit pass — the
    deployment profile is ``corpus_summary_approx``.
    """
    words = word_count(F.col(text_col))
    pcols = [
        F.round(F.percentile(words, F.lit(p)), 6).alias(f"p{int(p * 100)}_words")
        for p in PCTS
    ]
    # word_count over every document is the CPU-bound map stage; a
    # single-split small parquet otherwise runs it on one task (note 105)
    return ensure_parallelism(docs).agg(
        *_profile_cols(words),
        F.countDistinct(F.col(source_col)).alias("n_sources"),
        *pcols,
    )


def corpus_summary_approx(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    accuracy: int = 10_000,
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch-backed profile: same shape as ``corpus_summary`` with
    percentile_approx (max rank error n/accuracy) and HLL++ distinct
    (relative error ``rsd``). One narrow pass, fully mergeable partial
    aggregates — no per-value shuffle at any corpus size."""
    words = word_count(F.col(text_col))
    pcols = [
        F.percentile_approx(words, F.lit(p), F.lit(accuracy))
        .cast("double")
        .alias(f"p{int(p * 100)}_words")
        for p in PCTS
    ]
    return ensure_parallelism(docs).agg(
        *_profile_cols(words),
        F.approx_count_distinct(F.col(source_col), rsd).alias("n_sources"),
        *pcols,
    )
