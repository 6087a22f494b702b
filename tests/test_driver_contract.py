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
    """The driver grades the FIRST 50 dict entries only. The r8 window must
    hold (a) the entire 21-query rotation obligation the r7 contract test
    pinned (the never-driver-graded pipeline tier + the text_analysis
    refreshes), (b) every query whose operator files r8 touches, (c) the
    r8-new queries (graded in their birth round)."""
    names = list(entry.queries())
    assert len(names) >= 88
    window = set(names[:50])
    r7_pipeline_tier = (
        "dedup_clusters", "dedup_apply_clusters", "decontaminate",
        "train_test_split", "pii_redact", "stratified_sample",
        "dedup_within_doc", "corpus_prep_pipeline", "source_cap", "source_mix",
        "repetition_stats", "dedup_substring", "dedup_substring_apply",
        "dedup_semantic", "decontaminate_semantic", "pack_sequences",
        "quality_gate",
        "token_stats", "quality_score", "lang_id", "lang_distribution",
    )
    r8_touched = (
        # dedup.py: embedding auto-switch + substring-apply aliasing
        "dedup_exact", "dedup_keep_first", "dedup_minhash", "dedup_simhash",
        "dedup_simhash_capped", "dedup_embedding", "dedup_embedding_lsh",
        "dedup_ngram_jaccard",
        # similarity.py rides with the dedup/semantic tier
        "ann_lsh_topk", "ann_mllib_lsh", "ann_ivf_topk",
        # text_analysis.py → fingerprint
        "fingerprint",
        # state/txn.py checkpoints
        "memory_upsert_txn",
        # streaming/expiry.py zone-map sweep pruning
        "doc_change_feed",
        # retrieval.py touched (bm25/hybrid appends) — its r7-green tail
        # queries ride the window
        "assemble_context", "search_by_metadata", "doc_summary",
        # tables.py changed in r7 while these sat in the tail with r6 rows —
        # their refresh is an r8 obligation, not a nicety
        "orders_page", "props_keys", "events_json", "max_score",
        # memory.py changed in r7 — same refresh obligation
        "memory_report",
    )
    r8_new = (
        "dedup_clusters_twostar", "memory_upsert_ckpt", "bm25_search",
        "hybrid_search", "ann_quantized_topk", "chunk_documents",
        "ann_ivf_sq8_topk",
    )
    for must_grade in r7_pipeline_tier + r8_touched + r8_new:
        assert must_grade in window, f"{must_grade} rotated out of the graded window"


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_late_r8_tail_queries_registered_for_r9_rotation():
    """Queries born AFTER the r8 window filled (tail-positioned, parity-
    verified locally, EVIDENCE.json window_round=null) MUST move into the
    first 50 when the r9 window rotates. This pin stops the rotation from
    silently dropping them — the single-query version of the r7 pipeline
    tier's obligation."""
    import json

    names = list(entry.queries())
    osql = entry.oracle_sql()
    with open("/root/repo/EVIDENCE.json") as f:
        ledger = json.load(f)
    for q in ("dedup_incremental", "memory_snapshot_read"):
        assert q in names and q in osql, q
        assert ledger[q]["window_round"] is None, (
            f"{q} claims grading evidence it does not have"
        )


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
