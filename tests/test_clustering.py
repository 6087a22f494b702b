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
