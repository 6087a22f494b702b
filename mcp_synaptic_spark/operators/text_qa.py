"""Per-document text hygiene screen (beyond-reference tier).

The encoding-damage complement of the quality tier: text_analysis.py
scores CONTENT (length/stopwords/repetition — Gopher-style), this module
flags TRANSPORT damage — the things a crawler injects before content
quality even applies: control characters from binary mis-sniffs, U+FFFD
replacement characters from charset mis-decodes (mojibake's tombstone),
and pathological line structure (minified blobs arrive as one mile-long
line).  The reference stores documents without any such screen
(reference rag/database/documents.py:add_document accepts raw content).

All flags are per-row column expressions — ONE scan, ZERO shuffles, fully
codegen, streaming-composable (the embedding_qa.embedding_screen
discipline).  Regex patterns use only \\x escapes and explicit classes so
the same pattern text parses identically under Java regex (Spark) and
RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: C0 controls except \t \n \r, plus DEL — the bytes that never belong in text
CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
#: ASCII printable + the three whitespace controls
ASCII_CLASS = "[\\x20-\\x7E\\x09\\x0A\\x0D]"
REPLACEMENT_CHAR = "�"


def suspect_expr(text_col: str = "text", *, max_line: int = 4000):
    """The screen's verdict as ONE reusable column expression (control OR
    replacement OR long-line) — what a streaming front door filters on
    without joining the full screen output back onto the stream."""
    t = F.col(text_col)
    return (
        t.rlike(CONTROL_CLASS)
        | F.contains(t, F.lit(REPLACEMENT_CHAR))
        | (F.array_max(F.transform(F.split(t, "\\n"), F.length)) > max_line)
    )


def text_screen(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line: int = 4000,
) -> DataFrame:
    """One row per document: (id, n_chars, n_lines, max_line_len,
    non_ascii_ratio, has_control, has_replacement, long_line, is_suspect).
    non_ascii_ratio is rounded to 6 (0.0 for empty text); is_suspect =
    control OR replacement OR long_line.  NULL text rows are dropped (the
    add-path rejects them upstream)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    lines = F.split(t, "\\n")
    # stripping the ASCII class leaves exactly the non-ASCII characters
    n_non_ascii = F.length(F.regexp_replace(t, ASCII_CLASS, ""))
    has_control = t.rlike(CONTROL_CLASS)
    has_replacement = F.contains(t, F.lit(REPLACEMENT_CHAR))
    max_line_len = F.array_max(F.transform(lines, F.length))
    out = docs.where(t.isNotNull()).select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.array_size(lines).alias("n_lines"),
        max_line_len.alias("max_line_len"),
        F.round(
            F.when(n_chars > 0, n_non_ascii / n_chars).otherwise(0.0), 6
        ).alias("non_ascii_ratio"),
        has_control.alias("has_control"),
        has_replacement.alias("has_replacement"),
        (max_line_len > max_line).alias("long_line"),
    )
    return out.withColumn(
        "is_suspect",
        F.col("has_control") | F.col("has_replacement") | F.col("long_line"),
    )
