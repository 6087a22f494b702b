"""Bucketed co-partitioned joins: the README's "pay one layout write, drop
the per-join shuffle" claim, demonstrated — the bucketed doc<->embedding
join must contain NO exchange on either side, and still produce exactly the
rows the plain join produces."""

from __future__ import annotations

import pytest

from mcp_synaptic_spark.sources import tables as T


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the join-side exchanges (or their absence)
    are actually observable — at test scale everything fits a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_doc_embedding_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    docs = T.load_table(spark, sf_dir, "documents")
    emb = T.load_table(spark, sf_dir, "embeddings")
    try:
        T.write_bucketed(docs, "b_docs", str(tmp_path / "b_docs"), bucket_col="doc_id", n_buckets=8)
        T.write_bucketed(emb, "b_emb", str(tmp_path / "b_emb"), bucket_col="vec_id", n_buckets=8)

        bd, be = T.read_bucketed(spark, "b_docs"), T.read_bucketed(spark, "b_emb")
        joined = bd.join(be, bd.doc_id == be.vec_id)
        rows = joined.count()

        # same rows as the plain-parquet join
        assert rows == docs.join(emb, docs.doc_id == emb.vec_id).count() > 0

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-partitioning proved, no shuffle
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_emb")


def test_unbucketed_same_join_does_shuffle(spark, sf_dir, no_broadcast):
    """Control: the identical join over plain parquet pays two exchanges —
    the bucketing, not something else, removes them."""
    docs = T.load_table(spark, sf_dir, "documents")
    emb = T.load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id)
    joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
