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

__all__ = ["connected_components", "connected_components_twostar", "dedup_corpus"]


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    algorithm: str = "hashmin",
) -> DataFrame:
    """Connected components of an undirected pair graph.

    Input: one row per edge (`id_a`, `id_b`); extra columns (jaccard, cosine,
    …) are ignored. Output: (id, component) for every vertex that appears in
    at least one pair, where `component` is the minimum vertex id reachable
    from `id` — i.e. the canonical member of the cluster.

    Raises RuntimeError if min-label propagation has not converged after
    `max_iters` rounds (diameter > max_iters ⇒ the pair graph is not the
    clique-like near-dup shape this operator is tuned for; raise the limit or
    pass algorithm="twostar" for the large-star/small-star variant, whose
    round count is O(log n) independent of diameter).

    ``algorithm``: "hashmin" (default — cheapest per round on the tiny-
    diameter clique graphs near-dup pairs produce) or "twostar"
    (connected_components_twostar — identical output, property-tested
    equivalent on random graphs).
    """
    if algorithm == "twostar":
        return connected_components_twostar(
            pairs, id_a=id_a, id_b=id_b, max_iters=max_iters
        )
    if algorithm != "hashmin":
        raise ValueError(f"algorithm must be 'hashmin' or 'twostar', got {algorithm!r}")
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


def connected_components_twostar(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the diameter-independent twin of `connected_components`.

    Same contract as the HashMin variant: input (id_a, id_b) edge rows,
    output (id, component) for every vertex appearing in some pair, with
    component = the minimum reachable vertex id. HashMin's round count is
    the graph DIAMETER — ideal for the clique-like graphs near-dup pair
    generators emit, quadratic-time on an adversarial length-n chain. The
    two-star alternation contracts chains exponentially, converging in
    O(log n) rounds on ANY topology, at the price of two edge-set rewrites
    per round instead of one label join.

    Per round, both operations are one groupBy-min + one equi-join over
    (long, long) edges — no vertex labels, no documents:
    - large-star: every node u points each LARGER neighbor at
      m(u) = min(N(u) ∪ {u});
    - small-star: with edges oriented high→low, every node u points its
      not-larger neighbors (and itself) at its minimum neighbor.
    Both preserve connectivity and never raise the minimum reachable id
    (proof in the paper); the fixpoint is a star forest centered at each
    component's minimum. Lineage is truncated per round with
    localCheckpoint, and convergence is an exact edge-set comparison
    (count + exceptAll on the checkpointed sets — two tiny jobs).
    """
    # ONE checkpointed normalized pair set (self-pairs kept) feeds BOTH the
    # edge set and the final vertex set: the r15 plan audit found the old
    # shape evaluated the pair GENERATOR three times (once for `sym`, twice
    # in the closing `vertices` union — 41 parquet scans in the
    # dedup_clusters_twostar plan), because Spark plans no subtree reuse and
    # upstream scoped caches are released by then. The distinct normalized
    # set is the same volume class as the HashMin variant's cached edge
    # list, so the materialization cost is already accepted for this
    # operator family.
    sym_all = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        sym_all.select(F.explode(F.array("u", "v")).alias("id")).distinct()
    )
    # lazy filter over the checkpoint — no second materialization job
    edges = sym_all.where(F.col("u") != F.col("v"))
    n_edges = edges.count()
    if n_edges == 0:
        # vertices that appear only in self-pairs are their own component
        return vertices.withColumn("component", F.col("id"))

    def large_star(e: DataFrame) -> DataFrame:
        s = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                    F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
                )
            ).alias("d")
        ).select("d.a", "d.b")
        mins = s.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
        return (
            s.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # input is high→low oriented already (both ops emit x > y)
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (
            e.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        own = mins.select("u", F.col("m").alias("v"))
        return nbr.union(own).where(F.col("u") != F.col("v")).distinct()

    for _ in range(max_iters):
        nxt = small_star(large_star(edges)).localCheckpoint()
        n_nxt = nxt.count()
        if n_nxt == n_edges and nxt.exceptAll(edges).limit(1).count() == 0:
            break
        edges, n_edges = nxt, n_nxt
    else:
        raise RuntimeError(
            f"connected_components_twostar did not converge in {max_iters} rounds"
        )
    # fixpoint is a star forest (child u → root v = component min); roots and
    # self-pair-only vertices label themselves (vertices derives from the
    # checkpointed pair set above — no pair-generator re-evaluation)
    return (
        vertices.join(edges.withColumnRenamed("u", "id"), "id", "left")
        .select("id", F.coalesce("v", F.col("id")).alias("component"))
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


def dedup_corpus_minhash(
    docs: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int | None | str = "auto",
) -> DataFrame:
    """FUSED corpus dedup: `dedup_corpus(docs, minhash_lsh_pairs(docs))`
    without ever materializing the expanded pair graph (r12).

    At crawl-corpus duplication the expanded minhash graph is dominated by
    intra-group clique edges (every pair of byte-identical copies), and
    connected-components pays a full edges⋈labels shuffle of that clique
    volume per HashMin round — ~60–70 s of the 100× artifact for a graph
    whose distinct-text skeleton has a few thousand vertices. This
    operator runs label propagation on the REP-GRAIN pair graph
    (dedup._minhash_rep_stage — the exact stage minhash_lsh_pairs expands
    from) and recovers the document-level keep set by expansion:

    keep(doc) ⇔ doc.id == its expanded component's minimum. Equality with
    the unfused composition, case by case (test-pinned):
    - group retained ≥1 post-cap bucket AND its rep is in a rep-grain
      component C: the expanded component is ∪(members of groups of C),
      whose min is C's label (HashMin labels are component minima over
      rep ids, and each rep IS its group's min member) — keep that one
      document.
    - bucketed group, rep in NO rep pair: the expanded component is the
      group's intra clique; keep its min member (= the rep).
    - group with NO surviving bucket: the uncollapsed pipeline emitted no
      intra pairs for it (the "shares a surviving bucket" gate), so every
      member is a singleton — all kept.
    Documents absent from every pair are untouched, exactly as
    `dedup_corpus`.
    """
    from .dedup import _minhash_rep_stage

    rep_pairs, members, bucketed_reps = _minhash_rep_stage(
        docs,
        content_col=content_col,
        id_col=id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
    )
    comp = connected_components(rep_pairs.select("id_a", "id_b"))
    if members is None:
        # collapse auto-gate skipped (dup-light corpus): the "rep" pairs
        # are document-grain, so this is exactly dedup_corpus's apply step
        removals = comp.where(F.col("id") != F.col("component")).select("id")
        return docs.join(
            removals.withColumnRenamed("id", id_col), id_col, "left_anti"
        )
    lab = (
        members.join(
            bucketed_reps.withColumn("_bk", F.lit(True)), "rid", "left"
        )
        .join(
            comp.select(F.col("id").alias("rid"), "component"), "rid", "left"
        )
        .select(
            "id",
            F.when(
                F.col("_bk").isNotNull(), F.coalesce("component", "rid")
            )
            .otherwise(F.col("id"))
            .alias("label"),
        )
    )
    removals = lab.where(F.col("id") != F.col("label")).select("id")
    return docs.join(removals.withColumnRenamed("id", id_col), id_col, "left_anti")
