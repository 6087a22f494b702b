"""Text-analysis operators for training-data pipelines (beyond-reference
surface called for by the north star: language-ID, quality scoring, token
counting, fingerprinting).

Everything is a narrow per-row projection (no shuffle) except the
distribution aggregates — at 100 TB these run as a single scan with map-side
partial aggregation. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_ish_token_count,
    content_hash,
    normalize_for_fingerprint,
    word_count,
)

# tiny per-language function-word profiles for the n-gram/stopword heuristic;
# deterministic and engine-portable (plain substring counts)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "ist"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "est"),
    "zh": ("de5", "shi4", "le5"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _count_tokens_in(content: Column, vocab: tuple[str, ...]) -> Column:
    """Number of whitespace tokens of lower(content) that are in `vocab`."""
    toks = F.split(F.trim(F.lower(content)), r"\s+")
    member = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(toks, lambda t: F.array_contains(member, t)))


def token_stats(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """Per-doc token counting: whitespace words + BPE-ish regex tokens."""
    c = F.col(content_col)
    return docs.select(
        F.col("doc_id"),
        word_count(c).alias("n_words"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars"),
    )


def quality_score(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score ∈ [0,1].

    Features mirror common pretraining-data filters: length band, mean word
    length, punctuation density, stopword density.
    """
    c = F.col(content_col)
    n_chars = F.length(c)
    n_words = word_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_stop = _count_tokens_in(c, STOPWORDS)
    mean_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0))
    length_ok = ((n_chars >= 50) & (n_chars <= 5000)).cast("double")
    word_len_ok = ((mean_word_len >= 3.0) & (mean_word_len <= 12.0)).cast("double")
    punct_ok = (punct_ratio <= 0.2).cast("double")
    score = F.round(0.3 * length_ok + 0.2 * word_len_ok + 0.2 * punct_ok + 0.3 * F.least(F.lit(1.0), stop_ratio * 5), 6)
    return docs.select(
        F.col("doc_id"),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-word counts,
    deterministic tie-break on language code order."""
    c = F.col(content_col)
    scores = [
        _count_tokens_in(c, words).alias(f"score_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select(F.col("doc_id"), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lo}") for lo in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lo}") == best, F.lit(lo)) for lo in langs]
    )
    return scored.select("doc_id", pred.alias("predicted_lang"), best.alias("marker_hits"))


def fingerprint(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the normalized text (X13 over a
    canonical form) + the normalized length — the exact-dedup key."""
    norm = normalize_for_fingerprint(F.col(content_col))
    return docs.select(
        F.col("doc_id"),
        content_hash(norm).alias("fingerprint"),
        F.length(norm).alias("norm_length"),
    )


# --- repetition filters (Gopher, Rae et al. 2021 arXiv:2112.11446 §A1.1) ---
#
# The metrics below are the word/n-gram repetition signals pretraining
# pipelines use to drop boilerplate and degenerate text. Everything is ONE
# narrow per-row projection — the n-gram lists, run-length scan, and ratios
# are array expressions inside whole-stage codegen, so at 100 TB this is an
# embarrassingly-parallel scan with zero shuffles and zero Python.

_WORDS_SQL = "IF(trim(`{c}`) = '', CAST(array() AS ARRAY<STRING>), split(trim(`{c}`), '\\\\s+'))"

# overlapping word n-grams as array expressions over a projected `w` column
_G2_SQL = (
    "IF(size(w) >= 2, transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1])), "
    "CAST(array() AS ARRAY<STRING>))"
)
_G5_SQL = (
    "IF(size(w) >= 5, transform(sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' ')), "
    "CAST(array() AS ARRAY<STRING>))"
)

# Most-frequent bigram via a single run-length scan over the SORTED gram
# array (equal grams are adjacent after array_sort, so the longest run IS the
# top count). `>=` on the update means a later — lexicographically larger —
# gram wins count ties, matching the oracle's ORDER BY cnt DESC, g DESC.
# One aggregate() pass per doc (O(grams)), not a per-doc groupBy shuffle.
_RUN_SQL = "IF(x <=> acc.prev, acc.run + 1, 1)"
_TOP_G2_SQL = f"""aggregate(
  array_sort({_G2_SQL}),
  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best_c', 0, 'best_g', CAST(NULL AS STRING)),
  (acc, x) -> named_struct(
    'prev', x,
    'run', {_RUN_SQL},
    'best_c', IF({_RUN_SQL} >= acc.best_c, {_RUN_SQL}, acc.best_c),
    'best_g', IF({_RUN_SQL} >= acc.best_c, x, acc.best_g)),
  acc -> named_struct('c', acc.best_c, 'g', acc.best_g))"""


#: default quality-gate rule table (Gopher-family §A1 rule list, thresholds
#: tuned so every rule fires on a real subset of the synthetic corpus —
#: ~70% keep at sf0.01). ONE source of truth: the batch graded query, its
#: DuckDB oracle, and the streaming gate all read this tuple.
GATE_RULES = (
    ("too_short", "n_words < 20"),
    ("low_quality", "quality_score < 0.5"),
    ("word_repetition", "dup_word_frac > 0.7"),
    ("bigram_repetition", "top_bigram_char_frac > 0.2"),
    ("non_english", "predicted_lang != 'en'"),
)


def quality_gate(
    docs: DataFrame,
    *,
    rules=GATE_RULES,
    content_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc keep/drop decision over the filter tier — the row a
    pretraining pipeline materializes. ``reasons`` is a comma-joined,
    fixed-order list of fired rules ('' = keep).

    Single fused pass (r8): every feature the rule table reads —
    repetition_stats' n_words/dup_word_frac/top_bigram_char_frac,
    quality_score's composite, lang_id's argmax — is computed in one chain
    of narrow projections with NO joins, using expression twins of the
    individual operators (equivalence is pinned two ways: the graded
    quality_gate query hashes against an oracle that composes the three
    operators' oracles, and tests/test_streaming.py checks stream==batch).
    Joining the three operator outputs would scan the corpus three times
    and shuffle twice at scale — and would not compose with readStream
    (stream-stream self-joins keep unbounded state). This form is an
    embarrassingly-parallel scan, so it runs unchanged on a streaming
    DataFrame: the on-arrival corpus filter.

    ``keep_cols``: input columns carried through to the output (e.g. the
    text itself for a gate→dedup→chunk pipeline) — joining the verdicts
    back to the input would be the stream-stream self-join this operator
    exists to avoid.
    """
    reserved = {"doc_id", "keep", "reasons"}
    if bad := [c for c in keep_cols if c in reserved]:
        raise ValueError(f"keep_cols collide with gate output columns: {bad}")
    c = F.col(content_col)
    langs = sorted(LANG_MARKERS)
    base = docs.select(
        F.col("doc_id"),
        *keep_cols,
        F.length(c).alias("_n_chars"),
        F.expr(_WORDS_SQL.format(c=content_col)).alias("w"),
        # quality_score twins (word_count, not size(w) — the operators differ
        # in expression and must be mirrored exactly)
        word_count(c).alias("_qnw"),
        F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0)).alias("_n_punct"),
        _count_tokens_in(c, STOPWORDS).alias("_n_stop"),
        *[
            _count_tokens_in(c, LANG_MARKERS[lo]).alias(f"_score_{lo}")
            for lo in langs
        ],
    )
    mean_word_len = F.when(
        F.col("_qnw") > 0, F.col("_n_chars").cast("double") / F.col("_qnw")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("_n_chars") > 0, F.col("_n_punct").cast("double") / F.col("_n_chars")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        F.col("_qnw") > 0, F.col("_n_stop").cast("double") / F.col("_qnw")
    ).otherwise(F.lit(0.0))
    length_ok = ((F.col("_n_chars") >= 50) & (F.col("_n_chars") <= 5000)).cast("double")
    word_len_ok = ((mean_word_len >= 3.0) & (mean_word_len <= 12.0)).cast("double")
    punct_ok = (punct_ratio <= 0.2).cast("double")
    score = F.round(
        0.3 * length_ok
        + 0.2 * word_len_ok
        + 0.2 * punct_ok
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 5),
        6,
    )
    best = F.greatest(*[F.col(f"_score_{lo}") for lo in langs])
    pred = F.coalesce(*[F.when(F.col(f"_score_{lo}") == best, F.lit(lo)) for lo in langs])
    nw = F.expr("size(w)")
    feats = base.select(
        "doc_id",
        *keep_cols,
        nw.alias("n_words"),
        F.round(
            F.when(
                nw > 0, 1.0 - F.expr("size(array_distinct(w))").cast("double") / nw
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_word_frac"),
        F.expr(_TOP_G2_SQL).alias("_top"),
        F.col("_n_chars"),
        score.alias("quality_score"),
        pred.alias("predicted_lang"),
    ).select(
        "doc_id",
        *keep_cols,
        "n_words",
        "dup_word_frac",
        F.round(
            F.when(
                (F.col("_n_chars") > 0) & (F.col("_top.c") > 0),
                F.col("_top.c") * F.length("_top.g").cast("double") / F.col("_n_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_char_frac"),
        "quality_score",
        "predicted_lang",
    )
    reasons = F.concat_ws(
        ",", *[F.when(F.expr(cond), F.lit(name)) for name, cond in rules]
    )
    return feats.select(
        "doc_id", *keep_cols, (reasons == F.lit("")).alias("keep"), reasons.alias("reasons")
    )


def repetition_stats(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """Per-doc repetition metrics in the Gopher family (arXiv:2112.11446
    §A1.1 "repetition removal"; no reference-repo analogue — beyond-reference
    training-pipeline surface):

    - ``dup_word_frac``      1 − distinct/total over whitespace words (the
                             word-granularity duplicate fraction),
    - ``top_bigram`` / ``top_bigram_count`` the most frequent overlapping
                             word 2-gram (ties → lexicographically largest),
    - ``top_bigram_char_frac`` chars covered by its occurrences
                             (count × gram length / doc chars — uncapped, so
                             heavily-overlapping runs can exceed 1.0; the
                             filter consumer thresholds, it doesn't sum),
    - ``dup_5gram_frac``     1 − distinct/total over overlapping 5-grams
                             (Gopher's duplicate-n-gram signal at n=5).

    Docs too short for a gram size report 0 (and a NULL top_bigram).
    """
    words = F.expr(_WORDS_SQL.format(c=content_col))
    base = docs.select(F.col("doc_id"), F.length(content_col).alias("_n_chars"), words.alias("w"))
    sel = base.select(
        "doc_id",
        "_n_chars",
        F.expr("size(w)").alias("n_words"),
        F.expr("size(array_distinct(w))").alias("_ndw"),
        F.expr(f"size({_G5_SQL})").alias("_n5"),
        F.expr(f"size(array_distinct({_G5_SQL}))").alias("_nd5"),
        F.expr(_TOP_G2_SQL).alias("_top"),
    )
    nw = F.col("n_words")
    top_c, top_g = F.col("_top.c"), F.col("_top.g")
    return sel.select(
        "doc_id",
        nw.alias("n_words"),
        F.round(
            F.when(nw > 0, 1.0 - F.col("_ndw").cast("double") / nw).otherwise(F.lit(0.0)), 6
        ).alias("dup_word_frac"),
        top_g.alias("top_bigram"),
        top_c.alias("top_bigram_count"),
        F.round(
            F.when(
                (F.col("_n_chars") > 0) & (top_c > 0),
                top_c * F.length(top_g).cast("double") / F.col("_n_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_char_frac"),
        F.round(
            F.when(F.col("_n5") > 0, 1.0 - F.col("_nd5").cast("double") / F.col("_n5")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("dup_5gram_frac"),
    )


def lang_distribution(docs: DataFrame) -> DataFrame:
    """Corpus language histogram with share-of-corpus.

    The total stays inside the plan (1-row broadcast cross join) — no
    driver-side count action."""
    total = docs.agg(F.count("*").alias("_total"))
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg(F.length("text")), 6).alias("avg_chars"))
        .crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_docs") / F.col("_total"), 6))
        .drop("_total")
    )
