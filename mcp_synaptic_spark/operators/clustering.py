"""Near-duplicate clustering: pair lists → connected components → one kept
document per duplicate cluster.

A pair list is not a dedup decision. Banded LSH/SimHash emit *pairs*
(A,B),(B,C); keeping "one of each pair" either over-deletes (both B and C go)
or under-deletes (A and C both survive although they are transitive
near-dups). Production training-data pipelines therefore cluster the pair
graph into connected components and keep ONE canonical document per
component. The reference has no analogue (its dedup surface stops at
content_hash equality, `models/rag.py:35-38`); this module is part of the
beyond-reference pipeline tier, composing with every pair generator in
`operators/dedup.py`.

Scale design
------------
- Algorithm: iterative min-label propagation ("HashMin"): every vertex
  repeatedly adopts the smallest label among itself and its neighbours.
  Rounds = graph diameter. Near-dup graphs are dense cliques-of-duplicates
  with tiny diameter (band collisions connect duplicates directly), so the
  loop terminates in a handful of rounds; the large-star/small-star variant
  (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  would bound rounds by O(log n) for adversarial chains — same join shape,
  noted here as the drop-in upgrade if diameters ever grow.
- Per round: ONE shuffle join (labels → symmetric edges, keyed by vertex) +
  ONE partial-aggregated min-groupBy. Both sides carry only (id, label) /
  (src, dst) longs — never documents.
- The vertex set is only the documents that appear in some pair — at real
  corpus scale a small fraction of the corpus — and the edge set is cached
  once and reused every round.
- Lineage is truncated each round with localCheckpoint (plan depth stays
  O(1) instead of O(rounds); on a real cluster with a fault-tolerance
  requirement swap for `checkpoint()` against a reliable dir — same call
  site, noted inline).
- The driver-side convergence loop is O(diameter) tiny jobs; the per-round
  changed-label count rides the same cached frame that produces the next
  label set (no extra pass).

Canonical choice: the component label IS the minimum member id, so
"canonical = (id == component)" needs no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import scoped_cache as _scoped_cache

__all__ = ["connected_components", "dedup_corpus"]


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components of an undirected pair graph.

    Input: one row per edge (`id_a`, `id_b`); extra columns (jaccard, cosine,
    …) are ignored. Output: (id, component) for every vertex that appears in
    at least one pair, where `component` is the minimum vertex id reachable
    from `id` — i.e. the canonical member of the cluster.

    Raises RuntimeError if min-label propagation has not converged after
    `max_iters` rounds (diameter > max_iters ⇒ the pair graph is not the
    clique-like near-dup shape this operator is tuned for; raise the limit or
    switch to the large-star/small-star variant described in the module
    docstring).
    """
    # NOTE: no _release_stale() here — this operator composes on top of a
    # pair generator (minhash_lsh_pairs etc.) whose scoped caches are live
    # inside `pairs`; releasing them now would force the edge materialization
    # to recompute the whole shingle/signature pipeline uncached. The next
    # top-level operator's release sweeps this operator's cache too.
    # Symmetrize with ONE explode, not union(p, swap(p)): the single-branch
    # plan evaluates the (possibly expensive) pair source once per job with
    # no extra cache or barrier job. (Block-level cache locking means the
    # union shape would not actually double-compute — A/B-measured in PLANS
    # note 18 — but the explode shape is strictly simpler and one job
    # cheaper.)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(id_a).alias("a"), F.col(id_b).alias("b")),
                F.struct(F.col(id_b).alias("a"), F.col(id_a).alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    # cached once: every round's join re-reads the edge list
    edges = _scoped_cache(sym.distinct())
    labels = (
        edges.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()

    # max_iters bounds PROPAGATION rounds; the +1 grants the extra confirming
    # round a diameter-d graph needs (d rounds move the label, round d+1
    # observes changed==0) so convergence exactly at the bound is not a
    # spurious failure.
    for _ in range(max_iters + 1):
        # min label among each vertex's neighbours, partial-agg before shuffle
        prop = (
            edges.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # one cached pass yields BOTH the changed-count and the next labels
        step = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                "label",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("new_label"),
            )
            .localCheckpoint()  # truncates lineage; also materializes `step`
        )
        changed = step.where(F.col("new_label") < F.col("label")).limit(1).count()
        labels = step.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds; "
        "graph diameter exceeds the near-dup assumption (see module docstring)"
    )


def dedup_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Remove every non-canonical member of each near-dup cluster.

    Documents absent from `pairs` are untouched; of each connected component
    exactly the minimum-id document survives. The apply step is a single
    LEFT ANTI join against the removal list (vertices where id !=
    component). No forced broadcast: in heavily-duplicated crawl corpora
    the removal list is a large fraction of the corpus — AQE picks the
    broadcast strategy at runtime when (and only when) the list is small.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    removals = comp.where(F.col("id") != F.col("component")).select("id")
    return docs.join(removals.withColumnRenamed("id", id_col), id_col, "left_anti")
