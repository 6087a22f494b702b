"""Interchange-format seams (sources/tables.py): JSONL/CSV export + schema-
enforced re-ingest must round-trip the engine's tables exactly — timestamps
as instants, arrays element-for-element — and refuse lossy conversions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_synaptic_spark.sources import tables as T


def _collect_sorted(df, key):
    return [r.asDict(recursive=True) for r in df.orderBy(key).collect()]


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = T.load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    T.write_jsonl(docs, path)
    back = T.read_jsonl(spark, path, docs.schema)
    assert _collect_sorted(back, "doc_id") == _collect_sorted(docs, "doc_id")


def test_jsonl_roundtrip_events_timestamps(spark, sf_dir, tmp_path):
    """Timestamps must survive as the same instant (ISO-8601 with offset out,
    schema-bearing parse back in, UTC session both ways)."""
    ev = T.load_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "events_jsonl")
    T.write_jsonl(ev, path)
    back = T.read_jsonl(spark, path, ev.schema)
    assert _collect_sorted(back, "event_id") == _collect_sorted(ev, "event_id")


def test_jsonl_roundtrip_embeddings_arrays(spark, sf_dir, tmp_path):
    emb = T.load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "emb_jsonl")
    T.write_jsonl(emb, path)
    back = T.read_jsonl(spark, path, emb.schema)
    assert _collect_sorted(back, "vec_id") == _collect_sorted(emb, "vec_id")


def test_jsonl_failfast_on_schema_violation(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-00000.json").write_text('{"a": 1}\n{"a": "not-a-number"}\n')
    with pytest.raises(Exception, match="(?i)malformed|failfast|cannot"):
        T.read_jsonl(spark, str(bad), "a bigint").collect()


def test_csv_roundtrip_and_complex_column_refusal(spark, sf_dir, tmp_path):
    docs = T.load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    path = str(tmp_path / "docs_csv")
    T.write_csv(docs, path)
    back = T.read_csv(spark, path, docs.schema)
    assert _collect_sorted(back, "doc_id") == _collect_sorted(docs, "doc_id")

    emb = T.load_table(spark, sf_dir, "embeddings").limit(5)
    with pytest.raises(ValueError, match="complex columns.*embedding"):
        T.write_csv(emb, str(tmp_path / "emb_csv"))

    # explicit stringify path round-trips via from_json (schema must name
    # every file column — FAILFAST rejects a 2-col schema on the 3-col file,
    # which is the enforcement working)
    T.write_csv(emb, str(tmp_path / "emb_csv"), stringify_complex=True)
    raw = T.read_csv(
        spark, str(tmp_path / "emb_csv"), "vec_id bigint, embedding string, label int"
    ).withColumn("embedding", F.from_json("embedding", "array<float>"))
    assert _collect_sorted(raw, "vec_id") == _collect_sorted(emb, "vec_id")


def test_orc_roundtrip_documents_and_embeddings(spark, sf_dir, tmp_path):
    """ORC interchange: full-fidelity round-trip for strings, ints, and
    float-array columns (the other columnar lake format, built into Spark)."""
    from mcp_synaptic_spark.sources.layouts import read_orc, write_orc
    from mcp_synaptic_spark.sources.tables import load_table

    for name, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        src = load_table(spark, sf_dir, name)
        path = str(tmp_path / f"{name}_orc")
        write_orc(src, path)
        back = read_orc(spark, path)
        assert back.schema == src.schema

        def canon(rows):  # float lists are unhashable — tuple-ize nested
            return {
                tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in rows
            }

        assert canon(src.collect()) == canon(back.collect())


def test_orc_pushes_filters_to_scan(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.sources.layouts import read_orc, write_orc
    from mcp_synaptic_spark.sources.tables import load_table

    path = str(tmp_path / "docs_orc")
    write_orc(load_table(spark, sf_dir, "documents"), path)
    plan = (
        read_orc(spark, path)
        .where(F.col("doc_id") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:200]


def test_partitioned_layout_prunes_directories(spark, sf_dir, tmp_path):
    """Hive partitioning by `source`: an equality filter must read ONLY the
    matching partition's files (pruning before I/O — the S1 layout lever)."""
    import os

    from pyspark.sql import functions as F

    from mcp_synaptic_spark.sources.layouts import read_partitioned, write_partitioned
    from mcp_synaptic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_source")
    write_partitioned(docs, path, partition_by="source")
    parts = [d for d in os.listdir(path) if d.startswith("source=")]
    assert len(parts) > 1, "corpus must span several sources for this test"

    back = read_partitioned(spark, path)
    one = back.where(F.col("source") == "src0")
    # partition pruning is visible in the file-scan metadata: the selected
    # scan reads strictly fewer files than the full table
    full_files = back._jdf.queryExecution().executedPlan().toString()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "source" in plan.split("PartitionFilters")[1][:200]
    # semantics: identical rows to the unpartitioned filter
    want = sorted(r.doc_id for r in docs.where(F.col("source") == "src0").collect())
    got = sorted(r.doc_id for r in one.collect())
    assert got == want and len(got) > 0
