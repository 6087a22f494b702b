"""Text function + analysis tests — word-count edge cases mirror the
reference (tests/unit/models/test_rag.py:74-91: Python str.split semantics);
summary/context-assembly greedy semantics from rag/retrieval.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_synaptic_spark.functions import text as TX
from mcp_synaptic_spark.operators import retrieval as RT
from mcp_synaptic_spark.operators import text_analysis as TA


def test_word_count_python_split_semantics(spark):
    df = spark.createDataFrame(
        [("hello world",), ("",), ("   ",), ("one",), ("a  b\t c",)], "t string"
    )
    out = [r.n for r in df.select(TX.word_count(F.col("t")).alias("n")).collect()]
    assert out == [2, 0, 0, 1, 3]  # empty/whitespace → 0, runs collapse


def test_sanitize_string(spark):
    df = spark.createDataFrame([("  <b>bold</b> text\x00here  ",)], "t string")
    out = df.select(TX.sanitize_string(F.col("t")).alias("s")).first().s
    assert out == "bold texthere"  # tags stripped, control chars removed, trimmed


def test_key_validation(spark):
    df = spark.createDataFrame(
        [("valid_key-1.x",), ("has space",), ("",), ("x" * 256,), ("ok",)], "k string"
    )
    out = [r.v for r in df.select(TX.is_valid_key(F.col("k")).alias("v")).collect()]
    assert out == [True, False, False, False, True]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = [r.s for r in df.select(TX.word_shingles(F.col("t"), 3).alias("s")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # shorter than n ⇒ whole text as one shingle


def test_quality_score_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat with a hat and a bat near the flat door today"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in TA.quality_score(docs).collect()}
    assert 0.0 <= out[1].quality_score <= 1.0
    assert out[1].quality_score > out[2].quality_score  # real sentence beats 1-char doc
    assert out[1].stopword_ratio > 0.2


def test_lang_id_picks_marker_language(spark):
    docs = spark.createDataFrame(
        [(1, "der hund und die katze ist hier"), (2, "the cat and the dog of mine")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.predicted_lang for r in TA.lang_id(docs).collect()}
    assert out[1] == "de"
    assert out[2] == "en"


def test_fingerprint_normalizes(spark):
    docs = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.fingerprint for r in TA.fingerprint(docs).collect()}
    assert out[1] == out[2]  # case + whitespace normalized away
    assert out[1] != out[3]


def test_document_summary_budget(spark):
    docs = spark.createDataFrame(
        [(1, "First sentence here. Second part follows. Third bit. Fourth chunk ends")],
        "doc_id long, text string",
    )
    out = RT.document_summary(docs, max_summary_length=45).first()
    # 'First sentence here' (19) + '. ' + 'Second part follows' (19) = 40 ≤ 45; third would exceed
    assert out.summary == "First sentence here. Second part follows"
    assert out.n_sentences == 2


def test_document_summary_first_sentence_always_kept(spark):
    docs = spark.createDataFrame([(1, "A very long opening sentence that blows the budget. Tail")],
                                 "doc_id long, text string")
    out = RT.document_summary(docs, max_summary_length=10).first()
    assert out.n_sentences == 1
    assert out.summary.startswith("A very long")


def test_assemble_context_greedy_with_truncation(spark):
    ranked = spark.createDataFrame(
        [(1, "A" * 100), (2, "B" * 100), (3, "C" * 200)], "rank int, content string"
    )
    out = RT.assemble_context(ranked, max_context_length=320, min_truncate=50).first()
    # doc1 (100) + sep(2) + doc2 (100) = 202 fits; doc3 needs 202+2+200=404 > 320
    # leftover = 320 − 202 − 2 = 116 ≥ 50 ⇒ truncated head of doc3 (113 chars) + '...'
    parts = out.context.split("\n\n")
    assert parts[0] == "A" * 100 and parts[1] == "B" * 100
    assert parts[2] == "C" * 113 + "..."
    assert out.n_docs == 3
    assert out.n_chars <= 320


def test_assemble_context_no_truncation_when_tiny_leftover(spark):
    ranked = spark.createDataFrame([(1, "A" * 100), (2, "B" * 100)], "rank int, content string")
    out = RT.assemble_context(ranked, max_context_length=110, min_truncate=100).first()
    # only doc1 fits; leftover = 110−100−2 = 8 < 100 ⇒ no truncated tail
    assert out.context == "A" * 100
    assert out.n_docs == 1


# --- repetition_stats (Gopher filters, arXiv:2112.11446 §A1.1) -------------


def test_repetition_stats_degenerate_doc(spark):
    from mcp_synaptic_spark.operators.text_analysis import repetition_stats

    docs = spark.createDataFrame([(1, "a a a a")], "doc_id INT, text STRING")
    r = repetition_stats(docs).collect()[0]
    assert r.n_words == 4
    assert r.dup_word_frac == 0.75  # 1 distinct of 4
    assert r.top_bigram == "a a" and r.top_bigram_count == 3
    # 3 occurrences × 3 chars over 7 doc chars — uncapped by design
    assert r.top_bigram_char_frac == round(9 / 7, 6)
    assert r.dup_5gram_frac == 0.0  # only 4 words → no 5-grams


def test_repetition_stats_short_and_empty_docs(spark):
    from mcp_synaptic_spark.operators.text_analysis import repetition_stats

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "   "), (3, "x y x y x y x y")], "doc_id INT, text STRING"
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[1].top_bigram is None and out[1].top_bigram_count == 0
    assert out[1].top_bigram_char_frac == 0.0 and out[1].dup_word_frac == 0.0
    assert out[2].n_words == 0 and out[2].dup_word_frac == 0.0
    # overlapping 5-grams of a 2-periodic string: 4 total, 2 distinct
    assert out[3].dup_5gram_frac == 0.5
    # bigram tie "x y"×4 vs "y x"×3 — count wins before the lexicographic tie-break
    assert out[3].top_bigram == "x y" and out[3].top_bigram_count == 4


def test_repetition_stats_bigram_tie_breaks_lexicographically_largest(spark):
    from mcp_synaptic_spark.operators.text_analysis import repetition_stats

    # "a b" and "c d" both occur exactly twice; the oracle's ORDER BY
    # cnt DESC, g DESC picks "c d" — the operator must agree
    docs = spark.createDataFrame([(1, "a b q c d r a b s c d")], "doc_id INT, text STRING")
    r = repetition_stats(docs).collect()[0]
    assert (r.top_bigram, r.top_bigram_count) == ("c d", 2)


def test_quality_gate_rules_fire_individually(spark):
    """Each gate rule trips on a crafted doc; a healthy doc passes clean.
    (The gate itself is an entry-level composition — __spark_entry__._q_quality_gate —
    so this drives it through the contract surface.)"""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    import tempfile

    healthy = (
        "the quick brown fox jumps over the lazy dog and then the small "
        "bird sings of the morning light in a calm wood for a long while"
    )
    rows = [
        (1, healthy),                               # keep
        (2, "the of and in it"),                    # too_short (5 words)
        (3, "the " + "za " * 30 + "end"),           # word_repetition (za dup)
        (4, ("the big cat " * 12).strip()),         # bigram_repetition
        (5, "der und ist der und ist " + " ".join(f"w{i}" for i in range(20))),  # non_english
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id INT, text STRING"
        ).withColumn("lang", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("en")) \
         .withColumn("source", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("s")) \
         .withColumn("n_chars", __import__("pyspark.sql.functions", fromlist=["length"]).length("text")) \
         .write.parquet(f"{tmp}/documents.parquet")
        out = {r.doc_id: r for r in entry._q_quality_gate(spark, tmp).collect()}
    assert out[1].keep and out[1].reasons == ""
    assert not out[2].keep and "too_short" in out[2].reasons
    assert not out[3].keep and "word_repetition" in out[3].reasons
    assert not out[4].keep and "bigram_repetition" in out[4].reasons
    assert not out[5].keep and "non_english" in out[5].reasons
