"""Edit-distance similarity join (operators/strings.py).

Both arms are EXACT by construction, so the ground truth is a plain
Python Levenshtein over all pairs — the same naive form the driver's
DuckDB oracle runs (dedup_editdist / dedup_editdist_segment)."""

from __future__ import annotations

import random

import pytest

from mcp_synaptic_spark.operators.strings import (
    AUTO_EXACT_MAX_PAIRS,
    edit_distance_pairs,
    edit_distance_pairs_exact,
    edit_distance_pairs_segment,
)


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for x in range(1, m + 1):
        prev, d[0] = d[0], x
        for y in range(1, n + 1):
            cur = d[y]
            d[y] = min(d[y] + 1, d[y - 1] + 1, prev + (a[x - 1] != b[y - 1]))
            prev = cur
    return d[n]


def _edit(rng, s: str, e: int) -> str:
    alpha = "abcdef"
    for _ in range(e):
        op = rng.choice("ids" if s else "i")
        p = rng.randrange(len(s) + 1 if op == "i" else len(s))
        if op == "i":
            s = s[:p] + rng.choice(alpha) + s[p:]
        elif op == "d":
            s = s[:p] + s[p + 1 :]
        else:
            s = s[:p] + rng.choice(alpha) + s[p + 1 :]
    return s


def _corpus(seed: int = 11, n_base: int = 40):
    """Random strings + planted 1/2/3-edit variants + the short-bucket
    degenerates ('', 1- and 2-char strings) + exact replicas."""
    rng = random.Random(seed)
    alpha = "abcdef"
    rows, i = [], 0
    for _ in range(n_base):
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(4, 28)))
        rows.append((i, b))
        i += 1
        for e in (1, 2, 3):
            rows.append((i, _edit(rng, b, e)))
            i += 1
    rows.append((i, rows[0][1]))  # exact replica
    i += 1
    for s in ("", "a", "ab", "ba", "b"):
        rows.append((i, s))
        i += 1
    return rows


def _truth(rows, k):
    return {
        (ia, ib, _lev(a, b))
        for ia, a in rows
        for ib, b in rows
        if ia < ib and abs(len(a) - len(b)) <= k and _lev(a, b) <= k
    }


@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.volume
def test_both_arms_match_brute_force(spark, k):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = _truth(rows, k)
    exact = set(map(tuple, edit_distance_pairs_exact(df, max_distance=k).collect()))
    seg = set(map(tuple, edit_distance_pairs_segment(df, max_distance=k).collect()))
    assert exact == truth
    assert seg == truth


@pytest.mark.parametrize("k", [0, 2])
def test_replicated_corpus_expands_exactly(spark, k):
    """r10 exact-dup pre-collapse (VERDICT r9 #2): at duplication factor 5
    the heavy stages see each distinct key once and the expansion must
    reproduce the full id-level contract — every intra-group 0-distance
    pair and every cross-group pair — identically to brute force."""
    base = _corpus(seed=7, n_base=6)
    rows = [(rep * 1000 + i, s) for rep in range(5) for i, s in base]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = _truth(rows, k)
    exact = set(map(tuple, edit_distance_pairs_exact(df, max_distance=k).collect()))
    seg = set(map(tuple, edit_distance_pairs_segment(df, max_distance=k).collect()))
    assert exact == truth
    assert seg == truth


def test_key_len_truncates_before_compare(spark):
    # prefixes equal within 32 chars, tails wildly different
    rows = [(1, "x" * 32 + "aaaa"), (2, "x" * 32 + "zzzzzzzzzzzz"), (3, "y" * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = set(map(tuple, edit_distance_pairs_exact(df, key_len=32, max_distance=1).collect()))
    assert got == {(1, 2, 0)}


def test_null_keys_never_match(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "abc")], "doc_id long, text string"
    )
    assert edit_distance_pairs_exact(df, max_distance=2).count() == 0


def test_auto_routes_by_pair_budget(spark):
    rows = _corpus(seed=5, n_base=10)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = _truth(rows, 2)
    # ceiling above N²: exact arm; ceiling of 1: segment arm — same rows
    hi = set(map(tuple, edit_distance_pairs(df, max_distance=2).collect()))
    lo = set(
        map(tuple, edit_distance_pairs(df, max_distance=2, max_exact_pairs=1).collect())
    )
    assert hi == truth
    assert lo == truth
    assert AUTO_EXACT_MAX_PAIRS > len(rows) ** 2  # default grades the audit arm here


def test_auto_routing_decision_is_visible_in_the_plan(spark):
    """The router constant is a measured crossover (strings.py docstring);
    pin the DECISION at both shapes: under the ceiling the pair machinery
    is the broadcast banded join (no segment-key exchange — the only hash
    exchanges are the r10 exact-dup collapse/expansion, which both arms
    share), over it the segment arm's (ilen, i, seg) candidate join
    appears."""
    rows = _corpus(seed=5, n_base=10)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    exact_plan = plan(edit_distance_pairs(df, max_distance=2))
    seg_plan = plan(edit_distance_pairs(df, max_distance=2, max_exact_pairs=1))
    assert "BroadcastExchange" in exact_plan
    assert "ilen" not in exact_plan  # no segment machinery below the ceiling
    assert "ilen" in seg_plan
    # no CartesianProduct in either arm — pairs always ride equi-joins
    assert "CartesianProduct" not in exact_plan
    assert "CartesianProduct" not in seg_plan


def test_method_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, method="nope")
    with pytest.raises(ValueError):
        edit_distance_pairs_exact(df, max_distance=-1)


def test_auto_routes_on_distinct_keys_not_rows(spark):
    """r10: the router budget is distinct-key² (the collapse makes the
    exact arm quadratic in distinct keys only). A corpus whose row count
    blows the ceiling but whose distinct-key count doesn't must take the
    banded audit arm — visible as no segment machinery in the plan."""
    import math

    n_rows = int(math.isqrt(AUTO_EXACT_MAX_PAIRS)) + 500  # rows² > ceiling
    df = (
        spark.range(n_rows)
        .selectExpr("id AS doc_id", "concat('key-', id % 40) AS text")
    )  # 40 distinct keys: distinct² = 1600 << ceiling
    plan = (
        edit_distance_pairs(df, max_distance=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ilen" not in plan  # exact arm chosen
