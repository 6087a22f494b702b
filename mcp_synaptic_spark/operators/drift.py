"""Corpus distribution drift between two snapshots (beyond-reference tier).

The reference has no notion of corpus monitoring at all (its ingest is
one-document-at-a-time MCP tool calls — reference ``mcp_synaptic/rag/``);
the engine's screens (text_qa, embedding_qa, rate anomalies) gate a SINGLE
snapshot.  This adds the between-snapshot staple: **has the distribution
of a feature moved between corpus A and corpus B** — yesterday's crawl vs
today's, train vs eval, pre- vs post-filter — scored with the Population
Stability Index, the drift number production ML pipelines alarm on
(PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 action):

    psi = Σ_buckets (frac_a - frac_b) · ln(frac_a / frac_b)

Two operators share one physical shape:

- ``distribution_drift`` — numeric column against FIXED caller-supplied
  bucket boundaries (fixed, not quantile-derived, so the score is
  reproducible across runs and the bucketing is a pure projection; NULLs
  get their own bucket).
- ``categorical_drift`` — string column, one bucket per observed category
  (bounded by the domain: sources, languages, licenses — never corpus
  size).

Physical shape: tag-and-union the two inputs (no join — the tag is a
literal), bucket with a codegen CASE/coalesce projection, ONE tiny
shuffle to bucket grain with map-side-partial conditional counts, totals
attached as the engine's 1-row broadcast, PSI per bucket as a single
double expression mirrored by the oracle (identical IEEE sequence, the
events_anomaly discipline).  Fractions are epsilon-clamped (EPS=1e-6,
the industry convention) so empty buckets contribute a finite term
instead of ±inf.  Each input is scanned ONCE reading only the drift
column; at 100 TB the shuffle carries |buckets| × partitions rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fraction clamp for empty buckets — keeps ln() finite, standard PSI form
EPS = 1e-6

NULL_BUCKET = "(null)"


def _psi_table(tagged: DataFrame, bucket: Column, order: Column) -> DataFrame:
    """Shared tail: (bucket, n_a, n_b, frac_a, frac_b, psi) from a union
    frame carrying ``_side`` (0 = A, 1 = B) — one bucket-grain shuffle,
    1-row totals broadcast, codegen math."""
    from pyspark.sql import Window

    counts = (
        tagged.select(bucket.alias("bucket"), order.alias("_ord"), "_side")
        .groupBy("bucket")
        .agg(
            F.min("_ord").alias("_ord"),
            F.count(F.when(F.col("_side") == 0, 1)).alias("n_a"),
            F.count(F.when(F.col("_side") == 1, 1)).alias("n_b"),
        )
    )
    # totals as a GLOBAL window over the bucket table — |buckets| rows in
    # one partition by construction (domain-bounded, never corpus-bounded),
    # and it keeps each input at exactly one scan: a totals-aggregate
    # branch would re-run the union from the source on both branches
    # (no exchange reuse across grains — the tfidf/anomaly lesson)
    w = Window.partitionBy()
    counts = counts.withColumn("_tot_a", F.sum("n_a").over(w)).withColumn(
        "_tot_b", F.sum("n_b").over(w)
    )
    # try_divide: an EMPTY snapshot has total 0 — the NULL quotient falls
    # through greatest() to the EPS clamp (every bucket "vanished"), the
    # same treatment the textbook gives an empty side; a plain `/` raises
    # DIVIDE_BY_ZERO under ANSI mode (Spark 4 default)
    frac_a = F.greatest(F.try_divide(F.col("n_a"), F.col("_tot_a")), F.lit(EPS))
    frac_b = F.greatest(F.try_divide(F.col("n_b"), F.col("_tot_b")), F.lit(EPS))
    return (
        counts.select(
            "bucket",
            "_ord",
            "n_a",
            "n_b",
            F.round(frac_a, 6).alias("frac_a"),
            F.round(frac_b, 6).alias("frac_b"),
            F.round((frac_a - frac_b) * F.log(frac_a / frac_b), 6).alias("psi"),
        )
        .orderBy("_ord")
        .drop("_ord")
    )


def _tag_union(a: DataFrame, b: DataFrame, cols: Sequence[str]) -> DataFrame:
    sel = [F.col(c) for c in cols]
    return a.select(*sel, F.lit(0).alias("_side")).unionByName(
        b.select(*sel, F.lit(1).alias("_side"))
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    *,
    value_col: str,
    boundaries: Sequence[float],
    null_bucket: bool = True,
) -> DataFrame:
    """PSI drift of a numeric column between snapshots A and B over FIXED
    ascending ``boundaries`` [b1 < b2 < ... < bk]: buckets are
    (-inf, b1), [b1, b2), ..., [bk, +inf) plus a NULL bucket.  Returns one
    row per bucket — (bucket, n_a, n_b, frac_a, frac_b, psi), bucket
    labels carrying the interval — in bucket order; ``sum(psi)`` is the
    headline score.  Fixed boundaries (never quantiles of either side)
    keep the score reproducible and the bucketing a pure projection.

    ``null_bucket=False`` excludes NULL rows from the comparison ENTIRELY
    — they leave the totals too, so the visible fractions still sum to 1
    and an asymmetric null share cannot leak into every bucket's psi term
    (r10 review: a post-hoc row filter would have kept NULLs in the
    denominators).  The default keeps them as their own bucket, where a
    null-share shift shows up as that bucket's own psi contribution."""
    bs = list(boundaries)
    if not bs or any(bs[i] >= bs[i + 1] for i in range(len(bs) - 1)):
        raise ValueError("boundaries must be non-empty and strictly ascending")
    v = F.col(value_col)
    # first matching CASE arm wins: (-inf,b1), [b1,b2), ..., [bk,inf), NULL
    label = F.when(v.isNull(), F.lit(NULL_BUCKET))
    order = F.when(v.isNull(), F.lit(len(bs) + 1))
    prev: float | None = None
    for i, cut in enumerate(bs):
        label = label.when(v < F.lit(cut), F.lit(_interval(prev, cut)))
        order = order.when(v < F.lit(cut), F.lit(i))
        prev = cut
    label = label.otherwise(F.lit(_interval(prev, None)))
    order = order.otherwise(F.lit(len(bs)))
    tagged = _tag_union(a, b, [value_col])
    if not null_bucket:
        tagged = tagged.where(v.isNotNull())
    return _psi_table(tagged, label, order)


def _interval(lo: float | None, hi: float | None) -> str:
    fmt = lambda x: f"{x:g}"  # noqa: E731 — label formatting only
    if lo is None:
        return f"(-inf, {fmt(hi)})"
    if hi is None:
        return f"[{fmt(lo)}, inf)"
    return f"[{fmt(lo)}, {fmt(hi)})"


def categorical_drift(
    a: DataFrame,
    b: DataFrame,
    *,
    value_col: str,
) -> DataFrame:
    """PSI drift of a categorical column: one bucket per observed category
    (either side; NULL becomes the '(null)' bucket), rows ordered by
    bucket name.  Same output shape and epsilon convention as
    ``distribution_drift`` — a category present in only one snapshot
    contributes the clamped-fraction term, the standard PSI treatment of
    new/vanished categories."""
    bucket = F.coalesce(F.col(value_col).cast("string"), F.lit(NULL_BUCKET))
    return _psi_table(_tag_union(a, b, [value_col]), bucket, bucket)
