"""Property-based tests (hypothesis) for the pure column functions.

The reference ships no property/randomized testing (SURVEY §5 "Not present");
these pin the scalar-function semantics against independent pure-Python
models over generated inputs. Each property batches all generated cases into
ONE DataFrame so Spark runs once per example set.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mcp_synaptic_spark.functions import text as TX
from mcp_synaptic_spark.functions import ttl as TTL
from mcp_synaptic_spark.functions.vector import cosine_similarity, cosine_similarity_fixed
import pytest

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_UNIT = {"": 1, "s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def _py_format_duration(s: int) -> str:
    d, h, m, sec = s // 86400, (s % 86400) // 3600, (s % 3600) // 60, s % 60
    if s < 60:
        return f"{sec}s"
    if s < 3600:
        return f"{m}m {sec}s" if sec > 0 else f"{m}m"
    if s < 86400:
        return f"{h}h {m}m" if m > 0 else f"{h}h"
    return f"{d}d {h}h" if h > 0 else f"{d}d"


@PROP
@given(st.lists(st.tuples(st.integers(0, 10**6), st.sampled_from(list(_UNIT))), min_size=1, max_size=50))
def test_parse_ttl_matches_model(spark, cases):
    rows = [(f"{n}{u}",) for n, u in cases]
    out = [
        r.v
        for r in spark.createDataFrame(rows, "s string")
        .select(TTL.parse_ttl(F.col("s")).alias("v"))
        .collect()
    ]
    assert out == [n * _UNIT[u] for n, u in cases]


@PROP
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=30))
def test_parse_ttl_malformed_is_null(spark, texts):
    # anything that isn't <digits><unit?> must yield NULL, never raise
    bad = [t for t in texts if not any(c.isdigit() for c in t)]
    if not bad:
        return
    out = [
        r.v
        for r in spark.createDataFrame([(t,) for t in bad], "s string")
        .select(TTL.parse_ttl(F.col("s")).alias("v"))
        .collect()
    ]
    assert out == [None] * len(bad)


@PROP
@given(st.lists(st.integers(0, 10**7), min_size=1, max_size=50))
def test_format_duration_matches_model(spark, secs):
    out = [
        r.v
        for r in spark.createDataFrame([(s,) for s in secs], "s long")
        .select(TTL.format_duration(F.col("s")).alias("v"))
        .collect()
    ]
    assert out == [_py_format_duration(s) for s in secs]


@PROP
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["never", "sliding", "absolute"]),
            st.one_of(st.none(), st.integers(-100, 10**6)),
            st.integers(0, 10**9),  # created offset seconds
            st.integers(0, 10**9),  # accessed offset seconds
        ),
        min_size=1,
        max_size=50,
    )
)
def test_expiry_for_policy_matches_model(spark, cases):
    epoch = datetime(2024, 1, 1)
    rows = [
        (pol, ttl, epoch + timedelta(seconds=c), epoch + timedelta(seconds=a))
        for pol, ttl, c, a in cases
    ]
    out = [
        r.v
        for r in spark.createDataFrame(
            rows, "policy string, ttl int, created timestamp, accessed timestamp"
        )
        .select(
            TTL.expiry_for_policy(
                F.col("policy"), F.col("ttl"), F.col("created"), F.col("accessed")
            ).alias("v")
        )
        .collect()
    ]

    def model(pol, ttl, created, accessed):
        if pol == "never" or ttl is None or ttl <= 0:
            return None
        base = accessed if pol == "sliding" else created
        return base + timedelta(seconds=ttl)

    assert out == [model(pol, ttl, c, a) for (pol, ttl, _, _), (c, a) in
                   zip(cases, [(r[2], r[3]) for r in rows])]


@PROP
@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(-1e3, 1e3, allow_nan=False, width=32), min_size=8, max_size=8),
            st.lists(st.floats(-1e3, 1e3, allow_nan=False, width=32), min_size=8, max_size=8),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dot_fixed_bit_identical_to_hof(spark, pairs):
    """The unrolled fixed-dim cosine must equal the HOF fold BIT-FOR-BIT —
    the oracle hashes depend on it."""
    df = spark.createDataFrame(pairs, "a array<float>, b array<float>")
    out = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("hof"),
        cosine_similarity_fixed(F.col("a"), F.col("b"), 8).alias("fixed"),
    ).collect()
    for r in out:
        assert r.hof == r.fixed  # exact equality, not approx


@PROP
@given(st.lists(st.text(max_size=60), min_size=1, max_size=40))
def test_word_count_matches_python_split(spark, texts):
    out = [
        r.v
        for r in spark.createDataFrame([(t,) for t in texts], "t string")
        .select(TX.word_count(F.col("t")).alias("v"))
        .collect()
    ]
    assert out == [len(t.split()) for t in texts]


# --- connected components vs driver-side union-find model -------------------

def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference model: classic union-find, component label = min member."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from mcp_synaptic_spark.operators.clustering import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(df, max_iters=50).collect()}
    assert got == _uf_components(edges)


# --- hash split totality / determinism --------------------------------------

@PROP
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True))
def test_hash_split_partitions_every_row_exactly_once(spark, ids):
    from mcp_synaptic_spark.operators.pipeline import hash_split

    df = spark.createDataFrame([(i, "t") for i in ids], "doc_id long, text string")
    rows = hash_split(df).collect()
    assert len(rows) == len(ids)
    assert all(r.split in ("train", "val", "test") for r in rows)
    again = hash_split(df).collect()
    assert {r.doc_id: r.split for r in rows} == {r.doc_id: r.split for r in again}


# --- stratified exact sample: per-stratum ceil invariant --------------------

@PROP
@given(
    st.lists(st.tuples(st.integers(0, 500), st.sampled_from(["en", "fr", "de"])),
             min_size=1, max_size=60, unique_by=lambda t: t[0]),
    st.floats(0.05, 1.0),
)
def test_stratified_sample_exact_hits_ceil_per_stratum(spark, rows, frac):
    import math

    from mcp_synaptic_spark.operators.pipeline import stratified_sample_exact

    df = spark.createDataFrame([(i, "t", lang) for i, lang in rows],
                               "doc_id long, text string, lang string")
    totals: dict[str, int] = {}
    for _, lang in rows:
        totals[lang] = totals.get(lang, 0) + 1
    out = stratified_sample_exact(df, frac=frac, by="lang").collect()
    got: dict[str, int] = {}
    for r in out:
        got[r.lang] = got.get(r.lang, 0) + 1
    assert got == {lang: math.ceil(frac * n) for lang, n in totals.items()}


_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=30
)


def _py_repetition(words: list[str]) -> tuple[float, str | None, int, float]:
    """Pure-Python model of repetition_stats' gram metrics."""
    nw = len(words)
    dup_word = 0.0 if nw == 0 else round(1.0 - len(set(words)) / nw, 6)
    g2 = [f"{words[i]} {words[i+1]}" for i in range(nw - 1)]
    if g2:
        from collections import Counter

        cnt = Counter(g2)
        best_c = max(cnt.values())
        best_g = max(g for g, c in cnt.items() if c == best_c)  # lexicographically largest
    else:
        best_c, best_g = 0, None
    g5 = [" ".join(words[i : i + 5]) for i in range(nw - 4)]
    dup5 = 0.0 if not g5 else round(1.0 - len(set(g5)) / len(g5), 6)
    return dup_word, best_g, best_c, dup5


@PROP
@given(st.lists(_WORDS, min_size=1, max_size=15))
def test_repetition_stats_matches_model(spark, docs):
    from mcp_synaptic_spark.operators.text_analysis import repetition_stats

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    out = {
        r.doc_id: (r.dup_word_frac, r.top_bigram, r.top_bigram_count, r.dup_5gram_frac)
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id INT, text STRING")
        ).collect()
    }
    for i, w in enumerate(docs):
        assert out[i] == _py_repetition(w), (i, w)


@PROP
@given(st.lists(_WORDS, min_size=1, max_size=10))
@pytest.mark.volume
def test_substring_stats_and_apply_agree_with_model(spark, docs):
    """Model windowed substring dedup in pure Python (n=3 keeps examples
    interesting at hypothesis sizes) and check BOTH halves against it."""
    from mcp_synaptic_spark.operators.dedup import substring_dedup_apply, substring_dup_stats

    n = 3
    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")

    # model: windows per doc, df per window string, keeper per dup window
    wins = {
        i: [" ".join(w[p : p + n]) for p in range(len(w) - n + 1)] for i, w in enumerate(docs)
    }
    from collections import defaultdict

    docs_per_win = defaultdict(set)
    for i, ws in wins.items():
        for s in ws:
            docs_per_win[s].add(i)
    dup_wins = {s for s, d in docs_per_win.items() if len(d) >= 2}
    keeper: dict[str, tuple[int, int]] = {}
    for i in sorted(wins):
        for p, s in enumerate(wins[i]):
            if s in dup_wins and s not in keeper:
                keeper[s] = (i, p)

    stats = {r.doc_id: r for r in substring_dup_stats(df, n=n).collect()}
    for i, w in enumerate(docs):
        exp_total = len(wins[i])
        exp_dup = sum(1 for s in wins[i] if s in dup_wins)
        assert (stats[i].n_windows, stats[i].n_dup_windows) == (exp_total, exp_dup), (i, w)

    applied = {r.doc_id: r for r in substring_dedup_apply(df, n=n).collect()}
    for i, w in enumerate(docs):
        covered = set()
        for p, s in enumerate(wins[i]):
            if s in dup_wins and keeper[s] != (i, p):
                covered.update(range(p, p + n))
        kept = [wd for p, wd in enumerate(w) if p not in covered]
        a = applied[i]
        assert a.clean_text == " ".join(kept), (i, w)
        assert (a.n_words_kept, a.n_words_dropped) == (len(kept), len(w) - len(kept))


@PROP
@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=40, unique=True),
    st.integers(1, 20),
)
def test_pack_sequences_matches_model(spark, ids, window):
    from mcp_synaptic_spark.operators.pipeline import pack_sequences

    rows = [(i, "w " * ((i % 7) + 1)) for i in ids]
    out = {
        r.doc_id: r
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id INT, text STRING"),
            window_tokens=window,
            n_shards=3,
        ).collect()
    }
    # model: group by reported shard (a pure id hash), order by id, cumsum
    from collections import defaultdict

    by_shard = defaultdict(list)
    for i in ids:
        by_shard[out[i].shard].append(i)
    for shard, members in by_shard.items():
        off = 0
        for i in sorted(members):
            ntok = (i % 7) + 1
            assert out[i].n_tokens == ntok
            assert out[i].start_offset == off and out[i].seq_id == off // window, (i, shard)
            off += ntok


@PROP
@given(
    st.lists(st.integers(1, 60), min_size=1, max_size=12),
    st.integers(2, 12),
    st.integers(0, 6),
)
def test_chunk_documents_matches_model(spark, word_counts, chunk, over):
    """Chunk layout vs a pure-Python model: stride arithmetic, tail chunk,
    single-chunk docs, and exact text reconstruction per chunk."""
    from mcp_synaptic_spark.operators.pipeline import chunk_documents

    over = min(over, chunk - 1)
    stride = chunk - over
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(nw))) for i, nw in enumerate(word_counts)]
    out = {}
    for r in chunk_documents(
        spark.createDataFrame(rows, "doc_id LONG, text STRING"),
        chunk_words=chunk,
        overlap=over,
    ).collect():
        out[(r.doc_id, r.chunk_idx)] = r
    for i, nw in enumerate(word_counts):
        words = [f"d{i}w{j}" for j in range(nw)]
        n_chunks = 1 if nw <= chunk else 1 + -(-(nw - chunk) // stride)
        got_idx = sorted(ci for (d, ci) in out if d == i)
        assert got_idx == list(range(n_chunks)), (i, nw)
        for ci in range(n_chunks):
            piece = words[ci * stride : ci * stride + chunk]
            r = out[(i, ci)]
            assert r.chunk_text == " ".join(piece)
            assert r.n_chunk_words == len(piece) and r.start_word == ci * stride


@PROP
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=8),
        min_size=1,
        max_size=15,
    ),
    st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=3, unique=True),
)
def test_bm25_matches_model(spark, docs_tokens, query_terms):
    """BM25 scores vs a pure-Python model with the identical formula and
    term-index summation order."""
    import math

    from mcp_synaptic_spark.operators.retrieval import bm25_search

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    terms = sorted(set(query_terms))
    out = {
        r.doc_id: (r.bm25, r.n_terms_matched)
        for r in bm25_search(
            spark.createDataFrame(rows, "doc_id LONG, text STRING"),
            " ".join(terms),
            k=len(rows),
        ).collect()
    }
    n_docs = float(len(docs_tokens))
    avgdl = sum(len(t) for t in docs_tokens) / n_docs
    df = {t: float(sum(1 for toks in docs_tokens if t in toks)) for t in terms}
    for i, toks in enumerate(docs_tokens):
        score, matched = 0.0, 0
        for t in terms:
            tf = float(toks.count(t))
            if tf > 0:
                matched += 1
                idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                score += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl))
        if matched == 0:
            assert i not in out
        else:
            got = out[i]
            assert got[1] == matched
            assert abs(got[0] - round(score, 6)) <= 1e-6, (i, got, score)


@PROP
@given(
    st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_quantize_matches_model(spark, vecs):
    """SQ8 codes vs a pure-Python model: same floor-round recipe, code
    bounds, and constant-vector edge."""
    import math

    from mcp_synaptic_spark.operators.similarity import quantize_embeddings

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    out = {
        r.vec_id: r
        for r in quantize_embeddings(
            spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
        ).collect()
    }
    for i, v in rows:
        vmin, vmax = min(v), max(v)
        scale = (vmax - vmin) / 255.0
        want = [0] * len(v) if scale == 0 else [int(math.floor((x - vmin) / scale + 0.5)) for x in v]
        r = out[i]
        assert r.qvec == want and r.vmin == vmin
        assert all(0 <= q <= 255 for q in r.qvec)


# --- r10: edit-distance collapse/expansion vs brute force -------------------


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.text(alphabet="abc", min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.integers(0, 2),
)
@pytest.mark.volume
def test_editdist_collapse_expansion_matches_brute_force(spark, rows, k):
    """Duplication-heavy random corpora (a 3-letter alphabet over short
    strings collides constantly): the r10 exact-dup pre-collapse plus
    expansion must reproduce the naive all-pairs result on both arms."""
    from mcp_synaptic_spark.operators.strings import (
        edit_distance_pairs_exact,
        edit_distance_pairs_segment,
    )

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for x in range(1, m + 1):
            prev, d[0] = d[0], x
            for y in range(1, n + 1):
                cur = d[y]
                d[y] = min(d[y] + 1, d[y - 1] + 1, prev + (a[x - 1] != b[y - 1]))
                prev = cur
        return d[n]

    truth = {
        (ia, ib, lev(a, b))
        for ia, a in rows
        for ib, b in rows
        if ia < ib and lev(a, b) <= k
    }
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = set(map(tuple, edit_distance_pairs_exact(df, max_distance=k).collect()))
    seg = set(map(tuple, edit_distance_pairs_segment(df, max_distance=k).collect()))
    assert exact == truth
    assert seg == truth


# --- r10: PSI drift vs textbook model ---------------------------------------


@PROP
@given(
    st.lists(st.one_of(st.none(), st.floats(0, 100, allow_nan=False)), max_size=30),
    st.lists(st.one_of(st.none(), st.floats(0, 100, allow_nan=False)), min_size=1, max_size=30),
)
def test_distribution_drift_matches_textbook_psi(spark, a_vals, b_vals):
    import math

    from mcp_synaptic_spark.operators.drift import EPS, NULL_BUCKET, distribution_drift

    bounds = [20.0, 50.0, 80.0]
    a = spark.createDataFrame([(v,) for v in a_vals], "x double")
    b = spark.createDataFrame([(v,) for v in b_vals], "x double")
    out = {
        r.bucket: (r.n_a, r.n_b, r.psi)
        for r in distribution_drift(a, b, value_col="x", boundaries=bounds).collect()
    }

    def bucket(v):
        if v is None:
            return NULL_BUCKET
        for lo, hi, name in (
            (None, 20.0, "(-inf, 20)"),
            (20.0, 50.0, "[20, 50)"),
            (50.0, 80.0, "[50, 80)"),
        ):
            if v < hi:
                return name
        return "[80, inf)"

    from collections import Counter

    ca, cb = Counter(map(bucket, a_vals)), Counter(map(bucket, b_vals))
    ta, tb = len(a_vals), len(b_vals)
    expect = {}
    for bk in set(ca) | set(cb):
        fa = max(ca[bk] / ta, EPS) if ta else EPS
        fb = max(cb[bk] / tb, EPS) if tb else EPS
        expect[bk] = (ca[bk], cb[bk], round((fa - fb) * math.log(fa / fb), 6))
    assert out == expect
