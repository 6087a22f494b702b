"""Text scalar functions (SURVEY.md §2.8 X12–X16) + tokenization helpers.

All pure column expressions (regexp/length/split) — JVM-side, codegen-friendly,
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python str.split() semantics: split on whitespace runs, empty → 0 words
# (reference models/rag.py:40-48; edge cases tests/unit/models/test_rag.py:74-91)


def content_length(content: Column) -> Column:
    """X12 — len(content)."""
    return F.length(content)


def word_count(content: Column) -> Column:
    """X12 — len(content.split()) with Python semantics (empty → 0)."""
    return F.size(whitespace_tokens(content))


def content_hash(content: Column) -> Column:
    """X13 — dedup hash of content (reference models/rag.py:35-38)."""
    return F.md5(content)


def size_bytes(payload: Column) -> Column:
    """X14 — byte size of the JSON payload (documented approximation of the
    reference's sys.getsizeof, models/memory.py:72-76)."""
    return F.octet_length(payload)


def sanitize_string(s: Column, max_length: int = 10000) -> Column:
    """X15 — strip control chars, strip HTML tags, trim, truncate
    (reference utils/validation/common.py:29-52)."""
    no_ctrl = F.regexp_replace(s, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    no_html = F.regexp_replace(no_ctrl, r"<[^>]*>", "")
    return F.substring(F.trim(no_html), 1, max_length)


def is_valid_key(key: Column) -> Column:
    """X16 — non-empty, ≤255 chars, ^[a-zA-Z0-9_\\-\\.]+$
    (reference utils/validation/memory.py:10-23)."""
    return (F.length(key) > 0) & (F.length(key) <= 255) & key.rlike(r"^[a-zA-Z0-9_\-\.]+$")


# --- tokenization (beyond-reference: training-data pipeline ops) -----------

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the usual pre-split a byte-pair encoder sees.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


# Python str.split() delimiter set = Unicode White_Space ∪ U+001C–001F
# (hypothesis found the gap: Java \s is ASCII-only; the reference's
# word_count is Python len(content.split()), models/rag.py:40-48).
PY_WHITESPACE_PATTERN = r"(?U)[\s\x1c-\x1f]+"


def whitespace_tokens(content: Column) -> Column:
    """Python str.split() semantics exactly: split on Unicode-whitespace runs,
    no empty tokens (covers empty strings and leading/trailing whitespace)."""
    return F.filter(F.split(content, PY_WHITESPACE_PATTERN), lambda x: x != "")


def bpe_ish_token_count(content: Column) -> Column:
    return F.size(F.regexp_extract_all(content, F.lit(BPE_TOKEN_PATTERN), 0))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token array.

    `toks` must be a plain column reference, not an expression tree: higher-
    order functions are interpreted, with no common-subexpression elimination
    inside the lambda, so every `element_at(toks, …)` re-evaluates whatever
    expression `toks` is. Passing the raw split-regex expression here made
    shingling ~50× slower than reading a materialized array column.

    Documents shorter than n words contribute their full token string as one
    shingle.
    """
    k = F.size(toks)
    joined = F.array_join(toks, " ")
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), k - (n - 1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]),
    )
    return F.when(k < n, F.array(joined)).otherwise(F.array_distinct(ngrams))


def word_shingles(content: Column, n: int = 3) -> Column:
    """Shingles straight from a content column — convenience for one-off /
    test use. In operator pipelines prefer a two-step projection
    (tokens column, then shingles_from_tokens) so the tokenizer runs once."""
    return shingles_from_tokens(whitespace_tokens(content), n)


def normalize_for_fingerprint(content: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(content), r"\s+", " "))
