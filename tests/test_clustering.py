"""Connected-components clustering over pair graphs: transitive chains,
singleton exclusion, canonical (min-id) labels, corpus apply, and the
non-convergence guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import clustering as CL


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_transitive_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: a diameter-3 path — exercises multiple propagation rounds
    out = CL.connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r.id: r.component for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    out = CL.connected_components(_pairs(spark, [(1, 2), (10, 11), (11, 12)]))
    got = {r.id: r.component for r in out.collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_unpaired_docs_are_not_vertices(spark):
    out = CL.connected_components(_pairs(spark, [(7, 3)]))
    got = {r.id: r.component for r in out.collect()}
    assert got == {3: 3, 7: 3}  # component label is the min member id


def test_reversed_and_duplicate_edges_are_harmless(spark):
    out = CL.connected_components(_pairs(spark, [(2, 1), (1, 2), (2, 1)]))
    got = {r.id: r.component for r in out.collect()}
    assert got == {1: 1, 2: 1}


def test_long_path_exceeding_max_iters_raises(spark):
    # a path of 6 vertices has diameter 5; with max_iters=2 the min label
    # cannot reach the far end — the guard must fire, not silently return
    # half-merged components
    path = [(i, i + 1) for i in range(1, 6)]
    with pytest.raises(RuntimeError, match="did not converge"):
        CL.connected_components(_pairs(spark, path), max_iters=2)


def test_dedup_corpus_keeps_canonical_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    # clusters {1,2,3} and {5,6}; 4 untouched
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(r.doc_id for r in CL.dedup_corpus(docs, pairs).collect())
    assert kept == [1, 4, 5]


def test_convergence_exactly_at_max_iters_succeeds(spark):
    # diameter-5 path with max_iters=5: the label needs all 5 permitted
    # propagation rounds and the +1 confirming round observes changed==0 —
    # must NOT raise (round-7 review boundary fix)
    path = [(i, i + 1) for i in range(1, 6)]
    out = CL.connected_components(_pairs(spark, path), max_iters=5)
    got = {r.id: r.component for r in out.collect()}
    assert got == {i: 1 for i in range(1, 7)}


# --- two-star variant (Kiveris et al. SoCC'14) ------------------------------

def test_twostar_matches_hashmin_on_basics(spark):
    for rows in ([(1, 2), (2, 3), (3, 4)], [(1, 2), (10, 11), (11, 12)], [(7, 3)],
                 [(2, 1), (1, 2), (2, 1)]):
        hm = {r.id: r.component for r in CL.connected_components(_pairs(spark, rows)).collect()}
        ts = {
            r.id: r.component
            for r in CL.connected_components(_pairs(spark, rows), algorithm="twostar").collect()
        }
        assert ts == hm, rows


@pytest.mark.volume
def test_twostar_adversarial_chain_converges_logarithmically(spark):
    """The flag's reason to exist: a diameter-31 path needs 31 HashMin rounds
    but must finish well within 12 two-star rounds (O(log n))."""
    path = [(i, i + 1) for i in range(1, 32)]
    out = CL.connected_components_twostar(_pairs(spark, path), max_iters=12)
    got = {r.id: r.component for r in out.collect()}
    assert got == {i: 1 for i in range(1, 33)}


@pytest.mark.volume
def test_twostar_equivalence_on_random_graphs(spark):
    """Property equivalence vs both HashMin and a pure-Python union-find
    model on seeded random graphs (hypothesis's Spark round-trips are too
    slow per-example here; seeded random draws cover the same space)."""
    import random

    def uf_model(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    rng = random.Random(8)
    for trial in range(4):
        n = rng.randint(2, 40)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(1, 60))
        ]
        model = uf_model(edges)
        ts = {
            r.id: r.component
            for r in CL.connected_components_twostar(_pairs(spark, edges)).collect()
        }
        hm = {
            r.id: r.component
            for r in CL.connected_components(_pairs(spark, edges), max_iters=60).collect()
        }
        assert ts == model == hm, (trial, edges)


def test_twostar_bad_algorithm_rejected(spark):
    with pytest.raises(ValueError, match="algorithm"):
        CL.connected_components(_pairs(spark, [(1, 2)]), algorithm="bogus")


@pytest.mark.volume
def test_dedup_corpus_minhash_equals_unfused_composition(spark):
    """r12 fused corpus dedup: dedup_corpus_minhash must keep EXACTLY the
    documents dedup_corpus(docs, minhash_lsh_pairs(docs)) keeps — on a
    heavily duplicated corpus, uncapped AND with a binding occupancy cap
    (where whole groups lose their buckets and every member must survive)."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.clustering import (
        dedup_corpus,
        dedup_corpus_minhash,
    )
    from mcp_synaptic_spark.operators.dedup import minhash_lsh_pairs

    base = [
        "spark shuffle join partition exchange codegen whole stage",
        "spark shuffle join partition exchange codegen whole stage tungsten",
        "completely different words about cats and dogs and fish",
        "boilerplate header lorem ipsum dolor sit amet consectetur",
    ]
    rows = [(g * 100 + i, t) for g, t in enumerate(base) for i in range(4 if g < 2 else 7)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for cap in (None, 5):
        want = {
            r.doc_id
            for r in dedup_corpus(
                docs, minhash_lsh_pairs(docs, threshold=0.3, max_bucket=cap)
            ).collect()
        }
        got = {
            r.doc_id
            for r in dedup_corpus_minhash(docs, threshold=0.3, max_bucket=cap).collect()
        }
        assert got == want, f"cap={cap}: diff={got ^ want}"
    # sanity: the cap binds (more docs survive when buckets drop)
    uncapped = dedup_corpus_minhash(docs, threshold=0.3, max_bucket=None).count()
    capped = dedup_corpus_minhash(docs, threshold=0.3, max_bucket=5).count()
    assert capped > uncapped
