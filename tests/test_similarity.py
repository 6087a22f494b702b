"""ANN tier tests: recall of hyperplane-LSH / MLlib-LSH / IVF against the
exact brute-force baseline (operators/rag.py) on the driver's embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import rag as R
from mcp_synaptic_spark.operators import similarity as S
from mcp_synaptic_spark.sources.tables import load_table

K = 5


def _corpus_and_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding")
    )
    queries = emb.where(F.col("id") % 100 == 0).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return emb, queries


def _exact_topk(emb, queries):
    return {
        (r.qid, r.id)
        for r in R.batch_topk_join(queries, emb, k=K).collect()
    }


def _recall(approx_rows, exact_pairs):
    approx = {(r.qid, r.id) for r in approx_rows}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_hyperplane_lsh_recall(spark, sf_dir):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    exact = _exact_topk(emb, queries)
    approx = S.lsh_topk_join(queries, emb, dim=64, k=K, n_planes=4, multiprobe=True).collect()
    # this corpus is near-orthogonal (true-neighbor cos ≈ 0.3) — the hard
    # case for sign-LSH: P(bucket match) ≈ (1−θ/π)^p. At p=4 with Hamming-1
    # multiprobe the expected recall is ~0.5-0.7; clustered corpora do far
    # better. The exact tier (rag.batch_topk_join) remains the default.
    assert _recall(approx, exact) >= 0.4
    # self-match must always survive (identical vector ⇒ identical bucket)
    qids = {r.qid for r in approx}
    for q in qids:
        assert (q, q) in {(r.qid, r.id) for r in approx}


def test_hyperplane_lsh_deterministic(spark, sf_dir):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    a = sorted(map(tuple, S.lsh_topk_join(queries, emb, dim=64, k=K, seed=7).collect()))
    b = sorted(map(tuple, S.lsh_topk_join(queries, emb, dim=64, k=K, seed=7).collect()))
    assert a == b


def test_mllib_lsh_recall(spark, sf_dir):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    exact = _exact_topk(emb, queries)
    approx = S.mllib_lsh_topk(queries, emb, k=K, num_hash_tables=4).collect()
    assert _recall(approx, exact) >= 0.5


def test_brp_plane_fixture_matches_live_model(spark):
    """The committed .brp_cache fixture must equal the projection vectors a
    freshly-fit BucketedRandomProjectionLSH(seed=42, dim=64, tables=3)
    produces — the ann_mllib_lsh oracle embeds the fixture as literals, so
    drift here (a Spark upgrade changing the seeded RNG stream) would
    silently break the oracle's bucket replay. JSON round-trips float64
    exactly ⇒ exact equality."""
    import json

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    with open("/root/repo/.brp_cache/brp_seed42_d64_t3.json") as f:
        fixture = json.load(f)

    df = spark.createDataFrame(
        [(Vectors.dense([float(i == j) for i in range(64)]),) for j in range(4)],
        ["features"],
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=1.0, numHashTables=3, seed=42
    ).fit(df)
    live = [[float(x) for x in v.toArray()] for v in model._java_obj.randUnitVectors()]
    assert live == fixture


def test_ivf_recall_and_probe_scaling(spark, sf_dir):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    exact = _exact_topk(emb, queries)
    indexed, centroids = S.ivf_build(emb, n_cells=8)
    few = S.ivf_topk(queries, indexed, centroids, k=K, nprobe=2).collect()
    all_probe = S.ivf_topk(queries, indexed, centroids, k=K, nprobe=8).collect()
    # probing every cell ≡ exact brute force
    assert _recall(all_probe, exact) == 1.0
    # fewer probes trade recall for scan cost, but never below the cell that
    # contains the query itself
    assert _recall(few, exact) >= 0.3


def test_ivf_cells_partition_prune(spark, sf_dir, tmp_path):
    """The IVF scale path: cells written as parquet partitions ⇒ an nprobe
    query scans only the probed cells (PartitionFilters, not a corpus scan)."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.similarity import ivf_build

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    indexed, centroids = ivf_build(emb, n_cells=4, id_col="vec_id")
    out = str(tmp_path / "ivf")
    indexed.write.partitionBy("cell").parquet(out)

    back = spark.read.parquet(out)
    probed = back.where(F.col("cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # partition filter present, and only the probed cells' files are read
    assert "PartitionFilters" in plan and "cell" in plan
    n_cells_read = {r.cell for r in probed.select("cell").distinct().collect()}
    assert n_cells_read <= {0, 1}
    # and the pruned read is consistent with the unpruned table
    assert probed.count() == back.where(F.col("cell").isin([0, 1])).count() > 0


def test_auto_index_sizing():
    """Scale-adaptive index parameters (VERDICT r5 #3/#6): cells ≈ √N,
    planes ≈ log2(N/target_bucket) — constants only via explicit opt-in."""
    assert S.auto_n_cells(0) == 1
    assert S.auto_n_cells(2) == 2          # never exceeds N (KMeans k ≤ N)
    assert S.auto_n_cells(100) == 10
    assert S.auto_n_cells(1_000_000) == 1000
    assert S.auto_n_cells(10**10) == 65536  # hi clamp
    assert S.auto_n_planes(100) == 4        # lo clamp
    assert S.auto_n_planes(2000) == 7       # == pinned _LSH_PLANES at bench SF
    assert S.auto_n_planes(10**9, target_bucket_size=16) == 20  # hi clamp
    # bucket occupancy stays ~target as N scales 1000×
    for n in (10**4, 10**6, 10**7):
        p = S.auto_n_planes(n)
        if p < 20:
            assert 8 <= n / 2**p <= 32


def test_mllib_lsh_indexed_matches_fit_path(spark, sf_dir, tmp_path):
    """The persisted-index probe (mllib_lsh_topk_indexed) must return the
    exact rows the fit-per-call path returns for the same planes: the BRP
    fit is only a plane draw (data-independent, committed fixture), so the
    build/probe split may not change a single (qid, id, score, rank)."""
    import json

    with open("/root/repo/.brp_cache/brp_seed42_d64_t3.json") as f:
        planes = json.load(f)

    emb, queries = _corpus_and_queries(spark, sf_dir)
    fit_rows = sorted(
        (r.qid, r.id, r.score, r.rank)
        for r in S.mllib_lsh_topk(queries, emb, k=K, num_hash_tables=3, seed=42).collect()
    )

    path = str(tmp_path / "brp_index")
    S.mllib_lsh_index_write(emb, path, planes)
    indexed, loaded_planes, bl = S.mllib_lsh_index_load(spark, path)
    assert loaded_planes == planes and bl == 1.0
    idx_rows = sorted(
        (r.qid, r.id, r.score, r.rank)
        for r in S.mllib_lsh_topk_indexed(queries, indexed, loaded_planes, k=K, bucket_length=bl).collect()
    )
    assert idx_rows == fit_rows

    # idempotence: rewriting the SAME corpus is a no-op (same recorded meta)
    S.mllib_lsh_index_write(emb, path, planes)
    again, _, _ = S.mllib_lsh_index_load(spark, path)
    assert again.count() == indexed.count()
    # staleness guard: a changed corpus (different row count) forces a rebuild
    S.mllib_lsh_index_write(emb.limit(1), path, planes)
    rebuilt, _, _ = S.mllib_lsh_index_load(spark, path)
    assert rebuilt.count() == 1
