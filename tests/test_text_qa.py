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
