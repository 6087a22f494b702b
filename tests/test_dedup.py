"""Dedup operator tests with planted duplicates: exact groups, MinHash-LSH
recall vs exact Jaccard ground truth, SimHash on identical docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import dedup as D

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"  # 1-word diff
OTHER = "completely different words about spark query engines and big data systems"


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),        # exact dup of 1
        (3, NEAR),        # near dup of 1/2
        (4, OTHER),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = D.exact_dedup_groups(_docs(spark)).collect()
    assert len(out) == 1
    assert out[0].n_copies == 2 and out[0].keep_id == 1


def test_exact_dedup_keeps_min_id(spark):
    out = D.exact_dedup(_docs(spark))
    assert out.count() == 4
    assert out.where("doc_id = 2").count() == 0  # dup dropped, min id kept


def test_minhash_lsh_finds_planted_pairs(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_lsh_pairs(_docs(spark), threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup ⇒ jaccard 1
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0  # near dup
    assert all(4 not in p and 5 not in p for p in pairs)  # unrelated docs not paired


def test_minhash_matches_exact_jaccard_on_candidates(spark):
    docs = _docs(spark)
    lsh = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_lsh_pairs(docs, threshold=0.3).collect()}
    exact = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    for pair, j in lsh.items():
        assert abs(exact[pair] - j) < 1e-9  # verify step reports true jaccard


def test_simhash_identical_docs_distance_zero(spark):
    out = {(r.id_a, r.id_b): r.hamming for r in D.simhash_pairs(_docs(spark), max_hamming=32).collect()}
    assert out[(1, 2)] == 0  # identical text ⇒ identical signature
    assert out[(1, 3)] <= 6  # near dup ⇒ small distance
    assert out[(1, 4)] > 6  # unrelated ⇒ large distance


def test_embedding_near_dup(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = [(r.id_a, r.id_b) for r in D.embedding_near_dup_pairs(emb, threshold=0.95).collect()]
    assert out == [(1, 2)]


def test_ngram_jaccard_max_df_prunes_hot_shingles(spark):
    from mcp_synaptic_spark.operators.dedup import ngram_jaccard_pairs

    # docs 1/2 share a distinctive shingle-set; every doc shares boilerplate
    boiler = "lorem ipsum dolor sit amet"
    rows = [
        (1, f"alpha beta gamma delta {boiler}"),
        (2, f"alpha beta gamma delta epsilon {boiler}"),
        (3, f"totally different content here {boiler}"),
        (4, f"yet another unrelated doc text {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()}
    # boilerplate links every pair at low threshold
    assert (3, 4) in full and (1, 2) in full

    capped = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.05, max_df=2).collect()
    }
    # hot shingles (df=4) pruned: boilerplate-only pairs disappear,
    # genuinely-similar pair survives via its rare shared shingles
    assert (1, 2) in capped and (3, 4) not in capped


def test_embedding_lsh_recall_and_exactness(spark, sf_dir):
    """The LSH-bucketed near-dup path: every emitted pair is exact-verified
    (subset of the exhaustive result) and recall matches the banding theory
    1−(1−p^k)^L for the chosen (k, L)."""
    from mcp_synaptic_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            emb, threshold=0.4, n_planes=3, n_tables=9
        ).collect()
    }
    assert approx <= exact  # verification is exact — no false positives
    assert len(exact) > 0
    assert len(approx & exact) / len(exact) >= 0.6  # theory ≈0.86 at θ≈0.45
