"""Guards on the driver contract surface (__spark_entry__.py): the grading
window, oracle completeness, column-name agreement, and the evidence ledger
are invariants the correctness gate depends on — a refactor that silently
drops an oracle, rotates a stale query out of the window, or edits an
operator file behind a tail query's back should fail HERE, not in the next
round's verdict."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    """Zero rows-only queries: the driver hash-compares whatever oracle_sql
    provides; a queries() entry with no oracle degrades to a rows-only check
    without failing anywhere."""
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) == set(qs), (
        f"missing oracles: {set(qs) - set(osql)}; orphans: {set(osql) - set(qs)}"
    )


def test_graded_window_holds_the_round_targets():
    """The driver grades the FIRST 50 dict entries only. The r11 window must
    hold (a) the two drift queries pending their FIRST driver grade
    (tail-born in r10, pinned by the r10 contract's escape hatch),
    (b) every query whose operator files r11 touches — the rag.py/
    functions/vector.py compiled-dot restructure (whole RAG family), the
    similarity.py cells-sidecar fence (ANN/semantic family), and the
    bm25_index.py fingerprint-fold fix, (c) the entire r8-stamped ledger
    cohort (the oldest rows — after this rotation nothing predates r9)."""
    names = list(entry.queries())
    assert len(names) >= 96
    window = set(names[:50])
    pending_first_grade = ("corpus_drift", "corpus_drift_lang")
    r11_touched = (
        # operators/rag.py + functions/vector.py: threshold-after-top-k
        # restructure, single parsed fixed-dim cosine
        "rag_search", "rag_search_filtered", "find_similar", "batch_topk",
        "pairwise_similarity", "knn_classify", "hybrid_search",
        "assemble_context", "max_score",
        # operators/similarity.py (cells-sidecar fence) + shared vector.py
        "ann_lsh_topk", "ann_mllib_lsh", "ann_ivf_topk",
        "ann_quantized_topk", "ann_ivf_sq8_topk", "dedup_semantic",
        "decontaminate_semantic", "dedup_embedding", "dedup_embedding_lsh",
        # operators/bm25_index.py: multiset-safe corpus fingerprint
        "bm25_search_indexed",
        # operators/dedup.py: minhash exact-dup pre-collapse (PLANS note
        # 108) — the three dedup.py-backed tail rows rotate in; embed_texts
        # / ts_parse_multi / memory_access_replay rotate out (files
        # bit-unchanged since their r9 grade, ledger reset to 9)
        "dedup_rate_by_source", "dedup_incremental", "corpus_prep_pipeline",
    )
    r8_refresh = (
        "token_stats", "quality_score", "lang_id", "lang_distribution",
        "fingerprint", "repetition_stats", "quality_gate", "bm25_search",
        "search_by_metadata", "doc_summary", "doc_change_feed",
        "orders_page", "memory_report", "events_json", "props_keys",
        # hybrid_search / assemble_context / max_score are r8-stamped too,
        # already required via r11_touched above
    )
    for must_grade in pending_first_grade + r11_touched + r8_refresh:
        assert must_grade in window, f"{must_grade} rotated out of the graded window"


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_no_query_left_ungraded_behind_the_window():
    """Every query the ledger marks pending-first-grading (window_round
    null) must sit INSIDE the current 50-slot window — the generalized form
    of the r8 pin that carried dedup_incremental/memory_snapshot_read into
    r9. A query born into the tail is acceptable only until the next
    rotation; this test is what makes the rotation mandatory."""
    import json

    names = list(entry.queries())
    window = set(names[:50])
    with open("/root/repo/EVIDENCE.json") as f:
        ledger = json.load(f)
    pending = [q for q, row in ledger.items() if row.get("window_round") is None]
    # The r8 escape hatch, used once per round at most: queries born AFTER
    # the round's window filled (every slot already required by touched
    # files / first-grade pins / the oldest-ledger refresh order) may wait
    # in the tail ONLY if named here — this list IS the next round's
    # mandatory rotation (dedup_incremental / memory_snapshot_read rode it
    # r8→r9; the seventeen analytics queries rode it r9→r10; the two drift
    # queries rode it r10→r11; all were graded on schedule). r11 births the
    # two LM-perplexity queries AFTER its window froze (every slot already
    # required by touched files / first-grade pins / the r8-cohort
    # refresh), so they ride the hatch into r12 — this pin IS their
    # mandatory first grade next round.
    r12_rotation_pins: set[str] = {"lm_perplexity", "lm_ppl_buckets"}
    out = [q for q in pending if q not in window and q not in r12_rotation_pins]
    assert out == [], f"pending-first-grade queries left in the tail: {out}"


def test_bench_sets_pin_is_consistent():
    """bench_sets.json (r8: the comparable set as data, not code) must refer
    only to real queries, and the comparable set must stay disjoint from the
    write-path skip list."""
    import json

    with open("/root/repo/bench_sets.json") as f:
        sets = json.load(f)
    qs = set(entry.queries())
    comparable = set(sets["comparable_queries"])
    skip = set(sets["skip_write_path"])
    assert comparable <= qs, comparable - qs
    assert skip <= qs, skip - qs
    assert not (comparable & skip)
    # the pinned set is the BENCH_r06 surface: 67 queries, frozen
    assert len(comparable) == 67


def test_evidence_ledger_is_complete_and_fresh():
    """The machine-checkable replacement (r8, VERDICT r7 #3) for the manual
    'green-and-files-unchanged-since' audit: every query has a ledger row in
    EVIDENCE.json, and no query OUTSIDE the current grading window has an
    operator file that drifted past its recorded grading round. An edit that
    invalidates tail evidence fails here until the query is rotated into the
    window and `python tools/evidence.py update <round>` is re-run."""
    from tools.evidence import QUERY_FILES, check

    qs = entry.queries()
    assert set(QUERY_FILES) == set(qs), (
        f"ledger mapping out of sync: missing={set(qs) - set(QUERY_FILES)}, "
        f"orphans={set(QUERY_FILES) - set(qs)}"
    )
    violations = check()
    assert violations == [], "\n".join(violations)
