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
    """The driver grades the FIRST 50 dict entries only. The r12 window must
    hold (a) the queries pending their FIRST driver grade — the two
    LM-perplexity queries (tail-born in r11, pinned by the r11 contract's
    escape hatch) and the r12-born quality_admit,
    (b) every query whose operator files r12 touches — the note-105
    ensure_parallelism fan-out (pipeline.py / stats.py / terms.py families)
    and the dedup.py rework (pre-collapse on ngram/simhash/index build,
    digest verify joins, rep-grain persisted index; stales every dedup.py/
    clustering.py-backed row), (c) the oldest ledger rows — all remaining
    r9-stamped entries (including the trio evicted un-regraded in r11) and
    seven of the eight oldest r10 rows (the events temporal suite —
    events_conversion_lag yields its slot to quality_admit); after this
    rotation nothing predates r10."""
    names = list(entry.queries())
    assert len(names) >= 96
    window = set(names[:50])
    pending_first_grade = ("lm_perplexity", "lm_ppl_buckets", "quality_admit")
    r12_touched = (
        # operators/pipeline.py (+functions/text.py shared): the fan-out
        "decontaminate", "train_test_split", "pii_redact",
        "stratified_sample", "dedup_within_doc", "source_cap", "source_mix",
        "pack_sequences", "chunk_documents", "token_budget_select",
        "corpus_prep_pipeline",
        # operators/stats.py and operators/terms.py: the fan-out
        "corpus_summary", "tfidf_terms", "source_overlap",
        # operators/dedup.py (+clustering.py consumers): pre-collapse
        # extension, digest verify, rep-grain index, sha2 collapse key
        "dedup_exact", "dedup_keep_first", "dedup_minhash",
        "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_capped",
        "dedup_substring", "dedup_substring_apply", "dedup_clusters",
        "dedup_clusters_twostar", "dedup_apply_clusters",
        "dedup_rate_by_source", "dedup_incremental", "dedup_embedding",
        "dedup_embedding_lsh", "dedup_semantic", "decontaminate_semantic",
    )
    old_refresh = (
        # the last r9-stamped rows (the r11-evicted trio among them)
        "embed_texts", "ts_parse_multi", "memory_access_replay", "sanitize",
        "events_hourly", "events_sliding", "events_sessions", "frame_sample",
        "multimodal_features",
        # the eight oldest r10 rows: the events temporal suite
        # (events_conversion_lag yielded its slot to the r12-born
        # quality_admit's first grade; it keeps valid r10 tail evidence)
        "events_asof_join", "events_range_join", "events_funnel",
        "events_retention", "events_retention_weekly", "events_active_users",
        "events_anomaly",
    )
    for must_grade in pending_first_grade + r12_touched + old_refresh:
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
    # queries rode it r10→r11; the two LM-perplexity queries rode it
    # r11→r12; all were graded on schedule). r12 births ONE tail query
    # after its window froze — dedup_apply_fused (the fused corpus dedup's
    # grade; same oracle as dedup_apply_clusters) — so it rides the hatch
    # into r13: this pin IS its mandatory first grade next round.
    r13_rotation_pins: set[str] = {"dedup_apply_fused"}
    out = [q for q in pending if q not in window and q not in r13_rotation_pins]
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


def test_evidence_stamps_match_actual_driver_grades():
    """VERDICT r12 What's-wrong #1: a `window_round: R` stamp must name a
    round that ACTUALLY graded the query — i.e. the query appears in the
    driver's own `CORRECTNESS_rR.json`. A registry insertion made after
    `evidence.py update` ran can push a stamped query past slot 50; the
    stamp then claims a grade that never happened (events_conversion_lag
    carried a phantom r12 stamp this way — re-stamped to its true r10).
    The current round's stamp is exempt only until its correctness file
    lands; the next round's run of this test retro-checks it."""
    import json
    import os

    with open("/root/repo/EVIDENCE.json") as f:
        ledger = json.load(f)
    phantom = []
    for q, row in ledger.items():
        r = row.get("window_round")
        if r is None:
            continue
        path = f"/root/repo/CORRECTNESS_r{r:02d}.json"
        if not os.path.exists(path):
            continue  # the in-flight round: driver hasn't graded yet
        with open(path) as f:
            graded = set(json.load(f))
        if q not in graded:
            phantom.append(f"{q}: stamped r{r} but absent from {os.path.basename(path)}")
    assert phantom == [], "\n".join(phantom)
