"""Embedding-column hygiene screen (beyond-reference tier).

Before a 100 TB embedding table feeds dedup/ANN/decontamination, every
production pipeline screens it: model servers emit NaN/Inf/NULL rows under
load-shedding, zero vectors appear when an upstream batch silently fails,
and norm drift breaks the normalized-cosine contract the retrieval tier
assumes (operators/rag.py scores are only distances when ||v|| ≈ 1).
The reference stores embeddings without ever validating them
(reference rag/embeddings/manager.py:embed_text stores whatever the
provider returns); this operator is the missing gate.

Checks are PER-ROW against a fixed contract (dim, [min_norm, max_norm]) —
deliberately not against corpus statistics: a fixed contract needs ONE
scan and ZERO shuffles (pure projection + filter, fully codegen), makes
the verdict deterministic row-by-row (no cross-engine float-sum ordering
in a corpus mean), and matches how the contract is actually known ahead
of time (the embedder's normalization promise).  For rate-style outlier
screening against a learned distribution, compose with
operators/temporal.rate_anomalies on the flag counts.

Flags per row:
- bad_dim       — array length != expected dim (or NULL embedding)
- nonfinite     — any NaN/±Inf/NULL component (a NULL component is the
  same upstream damage class as NaN, and it would otherwise NULL-poison
  the norm fold into a silent pass — the r9 review finding)
- zero          — non-empty AND all components exactly 0.0 (the non-empty
  guard keeps the vacuous-forall answer aligned across engines: Spark's
  forall([]) is true, SQL bool_and over [] is NULL)
- norm_low/high — L2 norm outside [min_norm, max_norm]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm2(col: str) -> Column:
    """Sum of squares as a single parsed SQL expression (one codegen fold,
    the functions/vector.py discipline — not a py4j Column loop)."""
    return F.expr(
        f"aggregate(`{col}`, cast(0.0 as double), (acc, x) -> acc + x * x)"
    )


def embedding_screen(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    min_norm: float = 0.5,
    max_norm: float = 2.0,
) -> DataFrame:
    """One row per input row: (id, n_dims, norm, bad_dim, nonfinite, zero,
    norm_low, norm_high, is_valid).  norm is rounded to 6dp; flag columns
    are booleans; is_valid = no flag set.  NULL embeddings flag bad_dim
    with NULL norm; vectors with damaged (NaN/Inf/NULL) components flag
    nonfinite with NULL norm."""
    v = F.col(vec_col)
    n_dims = F.coalesce(F.array_size(v), F.lit(-1))
    bad_dim = n_dims != F.lit(dim)
    nonfinite = F.coalesce(
        F.exists(v, lambda x: x.isNull() | x.isNaN() | (F.abs(x) == float("inf"))),
        F.lit(False),
    )
    zero = F.coalesce(
        (F.array_size(v) > 0) & F.forall(v, lambda x: x == 0.0), F.lit(False)
    )
    norm = F.sqrt(_norm2(vec_col))
    # a damaged component poisons the fold; gate the norm so the
    # norm-range flags stay crisp booleans instead of NaN comparisons
    norm = F.when(~nonfinite & ~bad_dim, norm)
    norm_low = F.coalesce(norm < min_norm, F.lit(False))
    norm_high = F.coalesce(norm > max_norm, F.lit(False))
    return emb.select(
        F.col(id_col),
        n_dims.alias("n_dims"),
        F.round(norm, 6).alias("norm"),
        bad_dim.alias("bad_dim"),
        nonfinite.alias("nonfinite"),
        zero.alias("zero"),
        norm_low.alias("norm_low"),
        norm_high.alias("norm_high"),
        (~bad_dim & ~nonfinite & ~zero & ~norm_low & ~norm_high).alias("is_valid"),
    )


def dims_profile(emb: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension profile: (dim, n, n_nonzero, n_damaged, min_x, max_x,
    mean_x, is_dead) — the dead/collapsed-dimension detector (a dimension
    the model never varies wastes index space and silently shrinks every
    cosine's dynamic range).  is_dead = never nonzero OR constant, judged
    over the CLEAN values only; n_damaged counts NaN/Inf/NULL components
    per dimension (min/max/mean/n_nonzero exclude them — otherwise a
    single NaN silently skews the mean denominator in Spark and hard-fails
    the DECIMAL cast in the DuckDB oracle, the r9 review finding).

    Physical shape: posexplode then ONE keyed shuffle with map-side
    partial aggregation — the wire carries |dims| rows per upstream
    partition, not |rows|·|dims|.  min/max are exact doubles; the mean
    sums in DECIMAL(28,12) so the total is order-independent (the exact
    integer-power-sum discipline, extended to fixed-point) and only the
    final divide is float."""
    x = F.col("x")
    damaged = x.isNull() | x.isNaN() | (F.abs(x) == float("inf"))
    exploded = (
        emb.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(vec_col).alias("dim", "x"))
        .select("dim", F.when(~damaged, x).alias("fin"), damaged.alias("dmg"))
    )
    fin = F.col("fin")
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(fin != 0.0, 1)).alias("n_nonzero"),
            F.count(F.when(F.col("dmg"), 1)).alias("n_damaged"),
            F.min(fin).alias("min_x"),
            F.max(fin).alias("max_x"),
            F.sum(fin.cast("decimal(28,12)")).alias("_s"),
            F.count(fin).alias("_nf"),
        )
        .select(
            "dim",
            "n",
            "n_nonzero",
            "n_damaged",
            "min_x",
            "max_x",
            F.round(
                F.when(F.col("_nf") > 0, F.col("_s").cast("double") / F.col("_nf")), 6
            ).alias("mean_x"),
            ((F.col("n_nonzero") == 0) | (F.col("min_x") == F.col("max_x"))).alias(
                "is_dead"
            ),
        )
    )
