"""Text hygiene screen (operators/text_qa.py)."""

from mcp_synaptic_spark.operators.text_qa import text_screen


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_screen_flags_each_damage_mode(spark):
    rows = [
        (1, "clean ascii text\nsecond line"),
        (2, "null byte \x00 inside"),          # control
        (3, "bad decode � here"),          # replacement char
        (4, "x" * 5000),                        # one mile-long line
        (5, "tabs\tand\nnewlines are fine"),
        (6, "héllo wörld"),                     # non-ascii but not suspect
        (7, None),                              # dropped
        (8, ""),                                # empty: ratio 0, nothing suspect
    ]
    out = {r.doc_id: r for r in text_screen(_docs(spark, rows), max_line=4000).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 8}
    assert not out[1].is_suspect and out[1].n_lines == 2
    assert out[2].has_control and out[2].is_suspect
    assert out[3].has_replacement and out[3].is_suspect
    assert out[4].long_line and out[4].max_line_len == 5000
    assert not out[5].is_suspect and not out[5].has_control
    assert not out[6].is_suspect
    assert out[6].non_ascii_ratio == round(2 / len("héllo wörld"), 6)
    assert out[8].n_chars == 0 and out[8].non_ascii_ratio == 0.0
    assert not out[8].is_suspect


def test_screen_zero_shuffle(spark, tmp_path):
    path = str(tmp_path / "docs")
    _docs(spark, [(1, "ok")]).write.parquet(path)
    df = text_screen(spark.read.parquet(path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_suspect_expr_matches_screen_flags(spark):
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.text_qa import suspect_expr

    rows = [
        (1, "clean"), (2, "ctl \x01"), (3, "bad �"), (4, "y" * 9000),
        (5, "multi\nline\nfine"),
    ]
    df = _docs(spark, rows)
    via_expr = {
        r.doc_id for r in df.where(suspect_expr("text", max_line=4000)).collect()
    }
    via_screen = {
        r.doc_id for r in text_screen(df, max_line=4000).collect() if r.is_suspect
    }
    assert via_expr == via_screen == {2, 3, 4}


def test_ingest_pipeline_transport_screen_rejects_damage(spark, tmp_path):
    """A mojibake doc that would PASS the content-quality rules must be
    dropped by the front door's transport screen (and kept when the screen
    is explicitly disabled)."""
    from mcp_synaptic_spark.streaming.ingest import ingest_pipeline

    good = "the quick brown fox jumps over the lazy dog and keeps running " * 3
    bad = good[:30] + "�" + good[30:]
    df = spark.createDataFrame(
        [(1, good), (2, bad)], "doc_id long, text string"
    )
    kept = {r.doc_id for r in ingest_pipeline(df, chunk_words=50, overlap=0).collect()}
    assert kept == {1}
    kept_off = {
        r.doc_id
        for r in ingest_pipeline(
            df, chunk_words=50, overlap=0, transport_screen=False
        ).collect()
    }
    assert kept_off == {1, 2}
