"""TF-IDF characteristic terms (operators/terms.py)."""

import math
import re
from collections import Counter

import pytest

from mcp_synaptic_spark.operators import terms as TM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _naive_tfidf(rows, top_k):
    toks = {
        i: [t for t in re.split(TM.TOKEN_SPLIT, (txt or "").lower()) if len(t) >= 2]
        for i, txt, _ in rows
        if txt is not None
    }
    n = len(toks)
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    tf = Counter()
    for i, txt, g in rows:
        if txt is None:
            continue
        for t in toks[i]:
            tf[(g, t)] += 1
    scored = [
        (g, t, c, df[t], round(c * (math.log((n + 1) / (df[t] + 1)) + 1), 6))
        for (g, t), c in tf.items()
    ]
    out = {}
    for g in {g for g, *_ in scored}:
        rows_g = sorted(
            (r for r in scored if r[0] == g), key=lambda r: (-r[4], r[1])
        )[:top_k]
        out.update({(g, r[1]): (r[2], r[3], r[4], rank + 1) for rank, r in enumerate(rows_g)})
    return out


def test_tfidf_matches_naive(spark):
    rows = [
        (1, "spark shuffle join Spark JOIN partition", "en"),
        (2, "join join table scan", "en"),
        (3, "fenêtre jointure table spark", "fr"),
        (4, "jointure fenêtre fenêtre spark spark", "fr"),
        (5, None, "en"),
        (6, "a b c x1 yy", "en"),
    ]
    got = {
        (r.lang, r.term): (r.tf, r.df, r.score, r.rank)
        for r in TM.tfidf_terms(_docs(spark, rows), top_k=3).collect()
    }
    assert got == _naive_tfidf(rows, 3)


def test_tfidf_topk_and_guard(spark):
    rows = [(i, "common unique%d" % i, "en") for i in range(6)]
    df = _docs(spark, rows)
    out = TM.tfidf_terms(df, top_k=2).collect()
    assert len(out) == 2 and all(r.rank <= 2 for r in out)
    # 'common' appears in every doc: highest tf but lowest idf
    by_term = {r.term: r for r in TM.tfidf_terms(df, top_k=100).collect()}
    assert by_term["common"].tf == 6 and by_term["common"].df == 6
    assert all(v.df == 1 for t, v in by_term.items() if t != "common")
    with pytest.raises(ValueError):
        TM.tfidf_terms(df, top_k=0)


def test_tokens_min_length_and_case(spark):
    df = _docs(spark, [(1, "Ab, b!! x9 C", "en")])
    got = sorted(r.term for r in TM.tokens(df).collect())
    assert got == ["ab", "x9"]


def test_vocab_overlap_matches_naive(spark):
    rows = [
        (1, "spark join shuffle", "s1"),
        (2, "join table", "s1"),
        (3, "spark table scan", "s2"),
        (4, "completely different words", "s3"),
        (5, None, "s4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.group_a, r.group_b): (r.vocab_a, r.vocab_b, r.n_common, r.jaccard)
        for r in TM.group_vocab_overlap(df).collect()
    }
    vocab = {}
    for _, txt, s in rows:
        if txt is not None:
            vocab.setdefault(s, set()).update(
                t for t in re.split(TM.TOKEN_SPLIT, txt.lower()) if len(t) >= 2
            )
    naive = {}
    for a in vocab:
        for b in vocab:
            if a < b and vocab[a] & vocab[b]:
                i = len(vocab[a] & vocab[b])
                u = len(vocab[a] | vocab[b])
                naive[(a, b)] = (len(vocab[a]), len(vocab[b]), i, round(i / u, 6))
    assert out == naive
    # disjoint pair (s3) and empty group (s4) produce no rows
    assert not any("s3" in k or "s4" in k for k in out)
