"""Dedup operator tests with planted duplicates: exact groups, MinHash-LSH
recall vs exact Jaccard ground truth, SimHash on identical docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import dedup as D
import pytest

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"  # 1-word diff
OTHER = "completely different words about spark query engines and big data systems"


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),        # exact dup of 1
        (3, NEAR),        # near dup of 1/2
        (4, OTHER),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = D.exact_dedup_groups(_docs(spark)).collect()
    assert len(out) == 1
    assert out[0].n_copies == 2 and out[0].keep_id == 1


def test_exact_dedup_keeps_min_id(spark):
    out = D.exact_dedup(_docs(spark))
    assert out.count() == 4
    assert out.where("doc_id = 2").count() == 0  # dup dropped, min id kept


def test_minhash_lsh_finds_planted_pairs(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_lsh_pairs(_docs(spark), threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup ⇒ jaccard 1
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0  # near dup
    assert all(4 not in p and 5 not in p for p in pairs)  # unrelated docs not paired


def test_minhash_matches_exact_jaccard_on_candidates(spark):
    docs = _docs(spark)
    lsh = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_lsh_pairs(docs, threshold=0.3).collect()}
    exact = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    for pair, j in lsh.items():
        assert abs(exact[pair] - j) < 1e-9  # verify step reports true jaccard


def test_simhash_identical_docs_distance_zero(spark):
    out = {(r.id_a, r.id_b): r.hamming for r in D.simhash_pairs(_docs(spark), max_hamming=32).collect()}
    assert out[(1, 2)] == 0  # identical text ⇒ identical signature
    assert out[(1, 3)] <= 6  # near dup ⇒ small distance
    assert out[(1, 4)] > 6  # unrelated ⇒ large distance


def test_embedding_near_dup(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = [(r.id_a, r.id_b) for r in D.embedding_near_dup_pairs(emb, threshold=0.95).collect()]
    assert out == [(1, 2)]


def test_ngram_jaccard_max_df_prunes_hot_shingles(spark):
    from mcp_synaptic_spark.operators.dedup import ngram_jaccard_pairs

    # docs 1/2 share a distinctive shingle-set; every doc shares boilerplate
    boiler = "lorem ipsum dolor sit amet"
    rows = [
        (1, f"alpha beta gamma delta {boiler}"),
        (2, f"alpha beta gamma delta epsilon {boiler}"),
        (3, f"totally different content here {boiler}"),
        (4, f"yet another unrelated doc text {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()}
    # boilerplate links every pair at low threshold
    assert (3, 4) in full and (1, 2) in full

    capped = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.05, max_df=2).collect()
    }
    # hot shingles (df=4) pruned: boilerplate-only pairs disappear,
    # genuinely-similar pair survives via its rare shared shingles
    assert (1, 2) in capped and (3, 4) not in capped


def test_embedding_lsh_recall_and_exactness(spark, sf_dir):
    """The LSH-bucketed near-dup path: every emitted pair is exact-verified
    (subset of the exhaustive result) and recall matches the banding theory
    1−(1−p^k)^L for the chosen (k, L)."""
    from mcp_synaptic_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            emb, threshold=0.4, n_planes=3, n_tables=9
        ).collect()
    }
    assert approx <= exact  # verification is exact — no false positives
    assert len(exact) > 0
    assert len(approx & exact) / len(exact) >= 0.6  # theory ≈0.86 at θ≈0.45


@pytest.mark.volume
def test_embedding_lsh_crossover_beats_exact(spark):
    """The LSH scale path must BEAT the exact N² baseline somewhere
    measurable (VERDICT r5 #5) — with auto-sized n_planes (None → derived
    from corpus count), not a hand-tuned constant.

    Duplicate-heavy corpus: the sf0.1 embeddings replicated 2× with offset
    ids (4 000 vectors, every vector has exactly one identical twin), the
    shape a dedup pass exists for. Ground truth is exact: R·(R−1)/2 · 2 000
    identical pairs at cos=1, and the near-orthogonal base corpus adds none
    at θ=0.9. Identical vectors always share every bucket, so LSH recall is
    1.0 here regardless of the derived plane count.

    Measured on this box (min of 1, local[32]), same code path:
      N= 4 000: exact 21.8 s | lsh 10.2 s  (2.1×)
      N= 8 000: exact 87.0 s | lsh  8.2 s  (10.6×)
      N=16 000: exact 347  s | lsh  9.3 s  (37×)
    The test pins the N=4 000 point (suite-budget-friendly); the curve is
    recorded in PLANS.md round-6 notes.
    """
    import time

    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )
    from mcp_synaptic_spark.sources.tables import load_table

    R = 2
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select("vec_id", "embedding")
    reps = spark.range(R).select(F.col("id").alias("rep"))
    corpus = (
        emb.crossJoin(F.broadcast(reps))
        .select((F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding")
        .cache()
    )
    n = corpus.count()
    assert n == 2000 * R

    t0 = time.perf_counter()
    n_exact = embedding_near_dup_pairs(corpus, threshold=0.9, dim=64).count()
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_lsh = embedding_near_dup_pairs_lsh(corpus, threshold=0.9, dim=64).count()
    t_lsh = time.perf_counter() - t0
    corpus.unpersist()

    assert n_exact == 2000 * R * (R - 1) // 2
    assert n_lsh == n_exact  # recall 1.0 on identical twins
    # Measured margin at N=4000 is ~2.1x (curve above: 10.6x at 8k, 37x at
    # 16k). The locally-observed ordering is strict, but JVM warmup/GC noise
    # on a contended box could flip a 2.1x margin — so the timing gate is
    # generous (catches catastrophic regressions, not 20% swings) while the
    # pair-count assertions stay exact.
    assert t_lsh < 2 * t_exact, (
        f"LSH ({t_lsh:.1f}s) should be sub-quadratic vs exact ({t_exact:.1f}s) at N={n}"
    )


def test_max_bucket_caps_degenerate_bucket_fanout(spark):
    """VERDICT r6 item 5: one degenerate bucket (hundreds of identical short
    docs sharing every block/band) must not go quadratic when max_bucket is
    set — and pairs living in small buckets must survive the cap."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import (
        _cap_bucket_occupancy,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    # 300 identical boilerplate docs (the degenerate bucket) + one planted
    # near-dup pair of longer distinct docs + filler singletons
    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(300)]
    planted = [
        (1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1001, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    ]
    filler = [(2000 + i, f"unique document number {i} with words w{i} x{i} y{i} z{i}") for i in range(20)]
    docs = spark.createDataFrame(boiler + planted + filler, "doc_id long, text string")

    # uncapped: the degenerate cluster dominates — 300*299/2 pairs from it
    uncapped = simhash_pairs(docs, max_hamming=3).count()
    assert uncapped >= 300 * 299 // 2

    # capped: degenerate-bucket pairs are dropped, planted pair survives
    capped = simhash_pairs(docs, max_hamming=3, max_bucket=50).collect()
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert (1000, 1001) in capped_pairs
    assert not any(a < 300 and b < 300 for a, b in capped_pairs)

    capped_mh = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=50).collect()
    mh_pairs = {(r.id_a, r.id_b) for r in capped_mh}
    assert (1000, 1001) in mh_pairs
    assert not any(a < 300 and b < 300 for a, b in mh_pairs)

    # the cap bounds join fan-out directly: no surviving key holds > cap rows
    keyed = docs.select(
        F.col("doc_id").alias("id"), F.md5("text").alias("blk"), F.lit(0).alias("val")
    )
    surv = _cap_bucket_occupancy(keyed, ["blk", "val"], 50)
    max_occ = surv.groupBy("blk", "val").count().agg(F.max("count")).first()[0]
    assert max_occ is not None and max_occ <= 50


def test_max_bucket_caps_embedding_lsh(spark):
    """Same cap on the hyperplane-LSH embedding path: a pile of identical
    vectors shares a bucket in EVERY table; capped runs drop those pairs and
    keep a planted near-identical pair elsewhere."""
    import math

    from mcp_synaptic_spark.operators.dedup import embedding_near_dup_pairs_lsh

    dim = 8
    base = [1.0 if i == 0 else 0.0 for i in range(dim)]
    rot = [math.cos(0.05) if i == 0 else (math.sin(0.05) if i == 1 else 0.0) for i in range(dim)]
    other = [1.0 if i == 3 else 0.0 for i in range(dim)]
    rows = (
        [(i, base) for i in range(200)]                      # degenerate pile
        + [(1000, other), (1001, [x * 0.999 + (0.001 if i == 4 else 0.0) for i, x in enumerate(other)])]
        + [(1500, rot)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uncapped = embedding_near_dup_pairs_lsh(emb, dim=dim, n_planes=4, threshold=0.9).count()
    assert uncapped >= 200 * 199 // 2

    capped = embedding_near_dup_pairs_lsh(
        emb, dim=dim, n_planes=4, threshold=0.9, max_bucket=50
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in capped}
    assert (1000, 1001) in pairs
    assert not any(a < 200 and b < 200 for a, b in pairs)


# --- substring_dup_stats (windowed substring dedup, arXiv:2107.06499) ------


def test_substring_dup_stats_cross_doc_only(spark):
    from mcp_synaptic_spark.operators.dedup import substring_dup_stats

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),            # 3 windows, 1 shared
            (2, "head " + shared),                    # 2 windows, 1 shared
            (3, "completely different words " + " ".join(f"w{i}" for i in range(10))),
            (4, "short doc"),                         # < 10 words → 0 windows
        ],
        "doc_id INT, text STRING",
    )
    out = {r.doc_id: r for r in substring_dup_stats(docs, n=10).collect()}
    assert (out[1].n_windows, out[1].n_dup_windows) == (3, 1)
    assert (out[2].n_windows, out[2].n_dup_windows) == (2, 1)
    assert out[1].dup_window_frac == round(1 / 3, 6)
    assert out[3].n_dup_windows == 0
    assert (out[4].n_windows, out[4].dup_window_frac) == (0, 0.0)


def test_substring_dup_stats_within_doc_repeat_is_not_cross_doc(spark):
    from mcp_synaptic_spark.operators.dedup import substring_dup_stats

    ten = " ".join(f"t{i}" for i in range(10))
    # the same 10-word window occurs twice inside ONE doc — df counts
    # DISTINCT docs, so nothing is flagged
    docs = spark.createDataFrame([(1, ten + " mid " + ten)], "doc_id INT, text STRING")
    r = substring_dup_stats(docs, n=10).collect()[0]
    assert r.n_windows == 12 and r.n_dup_windows == 0


def test_substring_dup_stats_max_df_drops_boilerplate(spark):
    from mcp_synaptic_spark.operators.dedup import substring_dup_stats

    boiler = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1, 5)], "doc_id INT, text STRING"
    )
    # df=4 for the lone window; max_df=3 excludes it from BOTH counts
    out = {r.doc_id: r for r in substring_dup_stats(docs, n=10, max_df=3).collect()}
    assert all(r.n_windows == 0 and r.n_dup_windows == 0 for r in out.values())
    uncapped = {r.doc_id: r for r in substring_dup_stats(docs, n=10).collect()}
    assert all(r.n_dup_windows == 1 for r in uncapped.values())


def test_substring_dedup_apply_keeps_canonical_drops_copies(spark):
    from mcp_synaptic_spark.operators.dedup import substring_dedup_apply

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),  # canonical (min doc_id, pos) — intact
            (2, "head " + shared),         # later occurrence — span dropped
            (3, shared),                   # verbatim copy — collapses to empty
            (4, "short doc"),              # < n words — untouched
        ],
        "doc_id INT, text STRING",
    )
    out = {r.doc_id: r for r in substring_dedup_apply(docs, n=10).collect()}
    assert out[1].clean_text == shared + " tail1 tail2" and out[1].n_words_dropped == 0
    assert out[2].clean_text == "head" and out[2].n_words_dropped == 10
    assert out[3].clean_text == "" and out[3].n_words_kept == 0
    assert out[4].clean_text == "short doc" and out[4].n_words_dropped == 0


def test_substring_dedup_apply_within_doc_second_occurrence_dropped(spark):
    from mcp_synaptic_spark.operators.dedup import substring_dedup_apply

    ten = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, ten), (2, ten + " mid " + ten)], "doc_id INT, text STRING"
    )
    out = {r.doc_id: r for r in substring_dedup_apply(docs, n=10).collect()}
    # doc 1 holds the canonical copy; BOTH of doc 2's occurrences (and the
    # windows straddling "mid") are non-keepers — doc 2 empties entirely
    # because even "mid" sits inside a duplicated straddling window? No:
    # straddling windows ("...t9 mid t0...") are unique to doc 2 (df=1),
    # so "mid" survives.
    assert out[1].n_words_dropped == 0
    assert out[2].clean_text == "mid" and out[2].n_words_dropped == 20


def test_substring_apply_keeper_split_collapse_byte_identical(spark):
    """r13 (note 117a / VERDICT r12 next-round #4): the keeper-split
    exact-dup pre-collapse must reproduce the member-level pass exactly on
    a corpus with heavy verbatim duplication — the one dedup operator where
    group members have DIFFERENT outputs (the globally-first occurrence
    keeps its spans, every other copy loses them). The reference below is
    the pre-r13 member-grain algorithm verbatim; exercised with and
    without max_df, plus sub-window docs, empty docs, and within-doc
    repeats inside multi-member groups."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import substring_dedup_apply

    w10 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    # a 9-member group of 12-word docs (every 10-window duplicated): rep 100
    # keeps everything, shadows collapse to empty
    for i in range(9):
        rows.append((100 + i, w10 + " lambda mu"))
    # a 6-member group sharing a window with the group above via a common
    # prefix — cross-group keeper competition
    for i in range(6):
        rows.append((200 + i, w10 + " nu xi omicron"))
    # within-doc repeat inside a 4-member group
    for i in range(4):
        rows.append((300 + i, w10 + " " + w10))
    # sub-window and empty docs, replicated
    for i in range(3):
        rows.append((400 + i, "too short to window"))
        rows.append((500 + i, ""))
    # a singleton doc sharing no windows
    rows.append((600, "completely different words one two three four five six seven"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def member_level(docs, n, max_df=None):
        w = F.expr(
            "IF(trim(`text`) = '', CAST(array() AS ARRAY<STRING>), "
            "split(trim(`text`), '\\\\s+'))"
        )
        base = docs.select(F.col("doc_id").alias("id"), w.alias("w")).cache()
        occ = base.select(
            "id",
            F.posexplode(
                F.expr(
                    f"IF(size(w) >= {n}, "
                    f"transform(sequence(1, size(w) - {n - 1}), i -> xxhash64(array_join(slice(w, i, {n}), ' '))), "
                    "CAST(array() AS ARRAY<BIGINT>))"
                )
            ).alias("pos", "h"),
        )
        per_hash = occ.groupBy("h").agg(
            F.count_distinct("id").alias("df"),
            F.min(F.struct("id", "pos")).alias("keeper"),
        )
        dup = per_hash.where(F.col("df") >= 2)
        if max_df is not None:
            dup = dup.where(F.col("df") <= max_df)
        nonkeep = (
            occ.join(dup, "h")
            .where(~((F.col("id") == F.col("keeper.id")) & (F.col("pos") == F.col("keeper.pos"))))
            .select("id", "pos")
        )
        covered = nonkeep.select(
            "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))).alias("widx")
        ).distinct()
        word_pos = base.select("id", F.posexplode("w").alias("pos", "word"))
        kept = word_pos.alias("wp").join(
            covered.alias("cv"),
            (F.col("wp.id") == F.col("cv.id")) & (F.col("wp.pos") == F.col("cv.widx")),
            "left_anti",
        )
        rebuilt = kept.groupBy("id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))), lambda s: s["word"]
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_words_kept"),
        )
        totals = base.select("id", F.size("w").alias("_nw"))
        return (
            totals.join(rebuilt, "id", "left")
            .select(
                F.col("id").alias("doc_id"),
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                F.coalesce("n_words_kept", F.lit(0)).alias("n_words_kept"),
                (F.col("_nw") - F.coalesce("n_words_kept", F.lit(0))).alias("n_words_dropped"),
            )
        )

    for max_df in (None, 14):
        want = {
            r.doc_id: (r.clean_text, r.n_words_kept, r.n_words_dropped)
            for r in member_level(docs, 10, max_df).collect()
        }
        got = {
            r.doc_id: (r.clean_text, r.n_words_kept, r.n_words_dropped)
            for r in substring_dedup_apply(docs, n=10, max_df=max_df).collect()
        }
        assert got == want, f"max_df={max_df}: " + str(
            {k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)}
        )
    # semantics spot-checks: rep of group 100 keeps everything (it is the
    # global keeper for every one of its windows), its shadows are emptied
    out = {r.doc_id: r for r in substring_dedup_apply(docs, n=10).collect()}
    assert out[100].n_words_dropped == 0 and out[100].clean_text.startswith("alpha")
    assert all(out[100 + i].clean_text == "" for i in range(1, 9))
    assert out[600].n_words_dropped == 0  # singleton untouched


def test_substring_dedup_apply_conserves_words_against_stats(spark, sf_dir):
    """Cross-check the two halves: per doc, words dropped by apply can be
    nonzero only if stats reported duplicated windows, and fully-duplicated
    docs (dup_window_frac == 1, non-keeper for every window) lose all words
    unless they hold a keeper occurrence."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import substring_dedup_apply, substring_dup_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = {r.doc_id: r for r in substring_dup_stats(docs, n=10).collect()}
    applied = {r.doc_id: r for r in substring_dedup_apply(docs, n=10).collect()}
    assert set(stats) == set(applied)
    for did, a in applied.items():
        if a.n_words_dropped > 0:
            assert stats[did].n_dup_windows > 0, did


def test_embedding_auto_switch_pins_crossover(spark, sf_dir):
    """r8 default flip (VERDICT r7 #2): embedding_near_dup_pairs auto-routes
    to the LSH twin above AUTO_EXACT_MAX_PAIRS candidate pairs. Pins (a) the
    ceiling calibration — every graded SF stays on the bit-exact path, the
    10x scale shape crosses over — and (b) that the routed result IS the
    LSH twin's output (and a subset of exact)."""
    from mcp_synaptic_spark.operators.dedup import (
        AUTO_EXACT_MAX_PAIRS,
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    # calibration: graded corpora (<= 2000 vectors at sf0.1) sit below the
    # ceiling; the 10x-replicated scale corpus (20k vectors) sits above it
    assert 2_000 * 2_000 <= AUTO_EXACT_MAX_PAIRS < 20_000 * 20_000

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.4, auto_lsh=False).collect()
    }
    # default auto on a small corpus: identical to the exact audit path
    auto_small = {
        (r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert auto_small == exact
    # force the switch: result must be exactly the LSH twin's, subset of exact
    routed = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.4, max_exact_pairs=0).collect()
    }
    twin = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(emb, threshold=0.4).collect()
    }
    assert routed == twin and routed <= exact


def test_dedup_incremental_verdicts(spark):
    """Incremental screen: exact copy → exact_dup (min corpus match), one
    word changed → near_dup with the argmax-jaccard corpus match, unrelated
    text → admitted."""
    from mcp_synaptic_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # corpus-internal dup
            (3, "one two three four five six seven eight"),
        ],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta eta theta"),        # exact
            (102, "alpha beta gamma delta epsilon zeta eta NINE"),         # near
            (103, "red orange yellow green blue indigo violet ultraviolet"),  # novel
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in dedup_incremental(corpus, batch, threshold=0.3).collect()}
    assert out[101].verdict == "exact_dup" and out[101].match_id == 1 and out[101].jaccard == 1.0
    assert out[102].verdict == "near_dup" and out[102].match_id in (1, 2)
    assert 0.3 <= out[102].jaccard < 1.0
    assert out[103].verdict == "admitted" and out[103].match_id is None and out[103].jaccard is None


def test_dedup_incremental_is_screen_only_not_batch_internal(spark):
    """Two identical batch docs both get the same verdict vs the corpus —
    batch-internal dedup is deliberately out of scope (composition)."""
    from mcp_synaptic_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame([(1, "x y z q r s")], "doc_id LONG, text STRING")
    batch = spark.createDataFrame(
        [(10, "fresh words entirely new here now"), (11, "fresh words entirely new here now")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r.verdict for r in dedup_incremental(corpus, batch).collect()}
    assert out == {10: "admitted", 11: "admitted"}


def test_dedup_index_probe_equals_direct_screen(spark, sf_dir, tmp_path):
    """The persisted dedup index (build/probe split): screening a batch via
    dedup_index_load must produce byte-identical verdicts to the direct
    corpus screen, and parameter mismatches are rejected at probe time."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import (
        dedup_incremental,
        dedup_index_load,
        dedup_index_write,
    )

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = corpus.limit(8).select((F.col("doc_id") + 70_000).alias("doc_id"), "text").unionAll(
        spark.createDataFrame([(80_001, "wholly new arrival text")], "doc_id LONG, text STRING")
    )
    path = str(tmp_path / "dedup_index")
    dedup_index_write(corpus, path)
    idx = dedup_index_load(spark, path)

    direct = {
        r.doc_id: (r.verdict, r.match_id, r.jaccard)
        for r in dedup_incremental(corpus, batch).collect()
    }
    probed = {
        r.doc_id: (r.verdict, r.match_id, r.jaccard)
        for r in dedup_incremental(None, batch, index=idx).collect()
    }
    assert probed == direct and len(direct) == 9
    assert sum(1 for v, _, _ in direct.values() if v == "exact_dup") == 8

    import pytest

    with pytest.raises(ValueError, match="index parameters"):
        dedup_incremental(None, batch, index=idx, bands=4)
    with pytest.raises(ValueError, match="corpus DataFrame or index"):
        dedup_incremental(None, batch)


def test_dedup_index_append_closes_the_lifecycle(spark, sf_dir, tmp_path):
    """screen → admit → append → the next identical arrival is caught: a
    doc admitted yesterday must flag exact_dup today."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import (
        dedup_incremental,
        dedup_index_append,
        dedup_index_load,
        dedup_index_write,
    )

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "idx")
    dedup_index_write(corpus, path)

    novel = spark.createDataFrame(
        [(90_001, "a genuinely new arrival that nothing matches")],
        "doc_id LONG, text STRING",
    )
    first = dedup_incremental(None, novel, index=dedup_index_load(spark, path)).collect()
    assert first[0].verdict == "admitted"

    dedup_index_append(novel, path)
    again = novel.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    second = dedup_incremental(None, again, index=dedup_index_load(spark, path)).collect()
    assert second[0].verdict == "exact_dup" and second[0].match_id == 90_001

    # r14 replay idempotence: foreachBatch is at-least-once, so re-appending
    # the same admitted batch must be a fingerprint no-op — no new parquet
    # rows, no file churn (the ivf_index_append contract)
    import os

    def _files(p):
        out = {}
        for root, _dirs, names in os.walk(p):
            for nm in names:
                fp = os.path.join(root, nm)
                out[fp] = os.path.getmtime(fp)
        return out

    n_hashes = spark.read.parquet(os.path.join(path, "hashes")).count()
    snap = _files(path)
    dedup_index_append(novel, path)
    assert _files(path) == snap
    assert spark.read.parquet(os.path.join(path, "hashes")).count() == n_hashes


def test_index_append_merged_probe_gate_matches_inline(spark, tmp_path):
    """r16: dedup_index_append threads (n, approx-distinct) from its replay-
    fingerprint aggregate into _exact_collapse via stats= — one batch pass
    instead of two. The gate decision must be IDENTICAL to the inline probe
    on both sides of the collapse threshold, and a high-duplication append
    (gate fires → rep-grain rows with grp_n>1) must still produce the same
    probe verdicts as a full rebuild over the union corpus."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import (
        _collapse_stats,
        _should_collapse,
        dedup_incremental,
        dedup_index_append,
        dedup_index_load,
        dedup_index_write,
    )

    base = spark.createDataFrame(
        [(i, f"base document number {i} entirely distinct words") for i in range(50)],
        "doc_id LONG, text STRING",
    )
    path = str(tmp_path / "idx")
    dedup_index_write(base, path)

    # high-dup batch: 40 rows, 4 distinct texts -> the auto gate FIRES
    dup_batch = spark.createDataFrame(
        [(1000 + i, f"novel duplicated arrival text {i % 4}") for i in range(40)],
        "doc_id LONG, text STRING",
    )
    stats_inline = _collapse_stats(
        dup_batch.select(F.sha2(F.col("text"), 256).alias("_ch")), "_ch"
    )
    assert _should_collapse(*stats_inline)  # the scenario exercises the fired gate
    dedup_index_append(dup_batch, path)

    rebuilt = str(tmp_path / "rebuilt")
    dedup_index_write(base.unionByName(dup_batch), rebuilt)
    probe = spark.createDataFrame(
        [(5000, "novel duplicated arrival text 2"), (5001, "base document number 7 entirely distinct words"), (5002, "nothing like anything")],
        "doc_id LONG, text STRING",
    )
    via_append = sorted(
        tuple(r)
        for r in dedup_incremental(None, probe, index=dedup_index_load(spark, path)).collect()
    )
    via_rebuild = sorted(
        tuple(r)
        for r in dedup_incremental(None, probe, index=dedup_index_load(spark, rebuilt)).collect()
    )
    assert via_append == via_rebuild
    # verdicts: the duplicated text matches its min appended id, the base
    # text its base id, the novel text admits
    by_id = {r[0]: r[1:] for r in via_append}
    assert by_id[5000][0] == "exact_dup" and by_id[5000][1] == 1002
    assert by_id[5001][0] == "exact_dup" and by_id[5001][1] == 7
    assert by_id[5002][0] == "admitted"


def test_dedup_index_legacy_layout_rejected(spark, tmp_path):
    """ADVICE r12: a pre-r12 index (shingles/ layout, no format marker) must
    be REFUSED loudly by load and append — the new code reading a legacy
    manifest used to silently drop every legacy corpus doc from the
    near-dup screen (append) or fail with an opaque missing-path error
    (load)."""
    import json

    import pytest

    from mcp_synaptic_spark.operators.dedup import (
        INDEX_FORMAT,
        dedup_index_append,
        dedup_index_load,
        dedup_index_write,
    )

    path = str(tmp_path / "legacy_idx")
    corpus = spark.createDataFrame([(1, "a b c d e f")], "doc_id LONG, text STRING")
    dedup_index_write(corpus, path)
    meta_path = tmp_path / "legacy_idx" / "_meta.json"
    meta = json.loads(meta_path.read_text())
    assert meta["index_format"] == INDEX_FORMAT
    del meta["index_format"]  # what a pre-r12 manifest looks like
    meta_path.write_text(json.dumps(meta))

    with pytest.raises(ValueError, match="legacy .*rebuild"):
        dedup_index_load(spark, path)
    with pytest.raises(ValueError, match="legacy .*rebuild"):
        dedup_index_append(corpus, path)


def test_auto_max_bucket_sizing_and_default_equivalence(spark):
    """r9 (VERDICT r8 #4): the capped-by-default path. auto_max_bucket is
    ⌈4·√N⌉ floored at 1024 — any single bucket bounded at 16·N candidate
    pairs — and below the floor the auto default is provably identical to
    uncapped (occupancy can never exceed N ≤ floor), which is what keeps
    the uncapped SQL twins valid at graded scale."""
    from mcp_synaptic_spark.operators.dedup import (
        auto_max_bucket,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    # sizing at the measured harness shapes
    assert auto_max_bucket(500) == 1024        # sf0.01: floor, cap can't bite
    assert auto_max_bucket(50_000) == 1024     # 10x: floor still rules
    assert auto_max_bucket(500_000) == 2829    # 100x: 4·√N; 16·N pair bound
    assert auto_max_bucket(500_000) ** 2 <= 16 * 500_000 * 1.01
    # the r8-measured cliff: 1.3e9 pairs from one bucket becomes ≤ 8e6
    assert auto_max_bucket(500_000) ** 2 < 1.3e9 / 100

    docs = _docs(spark)
    assert [tuple(r) for r in simhash_pairs(docs, max_hamming=3).sort("id_a", "id_b").collect()] == [
        tuple(r) for r in simhash_pairs(docs, max_hamming=3, max_bucket=None).sort("id_a", "id_b").collect()
    ]
    assert [tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.3).sort("id_a", "id_b").collect()] == [
        tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.3, max_bucket=None).sort("id_a", "id_b").collect()
    ]


def test_auto_cap_bites_on_degenerate_corpus_above_floor(spark):
    """Above the floor the auto cap must actually bound the degenerate
    bucket: 1100 identical docs (> 1024 floor) share every block, so the
    auto default drops that bucket's quadratic fan-out while a planted
    distinct near-dup pair survives."""
    from mcp_synaptic_spark.operators.dedup import simhash_pairs

    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(1100)]
    planted = [
        (10_000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (10_001, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    ]
    docs = spark.createDataFrame(boiler + planted, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert (10_000, 10_001) in got
    assert not any(a < 1100 and b < 1100 for a, b in got), (
        "auto cap failed to drop the >floor degenerate bucket"
    )


def test_index_append_meta_write_is_atomic_and_replay_noop(spark, tmp_path):
    """r9 (ADVICE r8), contract updated r14: every manifest write — the
    overwrite-mode build AND the append's fingerprint record — goes through
    temp+os.replace (no .tmp leftovers, a concurrent load never sees a
    truncated/partial file; the r9 hazard was the truncating in-place
    rewrite, not the rewrite itself). An append preserves the index
    parameters verbatim and only extends `appended_fps`; replaying the
    SAME batch is a fingerprint no-op that touches nothing, manifest
    included."""
    import json
    import os

    from mcp_synaptic_spark.operators.dedup import dedup_index_append, dedup_index_write

    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "five six seven eight")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    dedup_index_write(docs, path, shingle_n=2, num_hashes=8, bands=4)
    meta_path = os.path.join(path, "_meta.json")
    with open(meta_path) as f:
        meta_before = json.load(f)
    batch = spark.createDataFrame(
        [(3, "nine ten eleven twelve")], "doc_id long, text string"
    )
    dedup_index_append(batch, path)
    with open(meta_path) as f:
        meta_after = json.load(f)
    params = ("index_format", "shingle_n", "num_hashes", "bands")
    assert {k: meta_after[k] for k in params} == {k: meta_before[k] for k in params}
    assert len(meta_after["appended_fps"]) == 1
    assert not [p for p in os.listdir(path) if p.startswith("_meta.json.tmp")]
    # replay: same batch again → fingerprint no-op, manifest untouched
    before_ns = os.stat(meta_path).st_mtime_ns
    dedup_index_append(batch, path)
    assert os.stat(meta_path).st_mtime_ns == before_ns
    with open(meta_path) as f:
        assert json.load(f) == meta_after


def test_index_append_txn_race_exactly_one_admission(spark, tmp_path):
    """r9 (VERDICT r8 #3): two admitters screening the SAME batch against
    the same index snapshot both see it as novel; the TxnTable admissions
    ledger lets exactly ONE append it, and the loser's returned winners
    frame excludes the contested doc — so racing streaming queries cannot
    both admit the same near-dup."""
    import threading

    from mcp_synaptic_spark.operators.dedup import (
        dedup_incremental,
        dedup_index_append_txn,
        dedup_index_load,
        dedup_index_write,
    )

    corpus = spark.createDataFrame(
        [(1, "an old corpus document about spark shuffles")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    dedup_index_write(corpus, path)

    batch = spark.createDataFrame(
        [(100, "a brand new arrival that nothing in the corpus matches")],
        "doc_id long, text string",
    )
    # both admitters screened the same snapshot: both verdicts say admitted
    idx = dedup_index_load(spark, path)
    for _ in range(2):
        v = dedup_incremental(None, batch, index=idx).collect()
        assert v[0].verdict == "admitted"

    results = {}

    def admitter(tag):
        won = dedup_index_append_txn(batch, path)
        results[tag] = {r.id for r in won.collect()}

    th = [threading.Thread(target=admitter, args=(t,)) for t in ("A", "B")]
    [t.start() for t in th]
    [t.join() for t in th]
    winners = [t for t, ids in results.items() if 100 in ids]
    assert len(winners) == 1, results

    # the index holds EXACTLY ONE copy: a re-arrival flags exact_dup with a
    # single match, and the hashes part has one row for the content
    again = dedup_incremental(
        None, batch.select((F.col("doc_id") + 1).alias("doc_id"), "text"),
        index=dedup_index_load(spark, path),
    ).collect()
    assert again[0].verdict == "exact_dup" and again[0].match_id == 100
    hashes = spark.read.parquet(f"{path}/hashes")
    assert hashes.where(F.col("cid") == 100).count() == 1
    assert hashes.count() == 2  # corpus doc + exactly one admitted copy


def test_dedup_rate_by_group(spark):
    from mcp_synaptic_spark.operators.dedup import dedup_rate_by_group

    docs = spark.createDataFrame(
        [
            (1, "aaa", "s1"), (2, "aaa", "s1"), (3, "bbb", "s1"), (4, "aaa", "s1"),
            (5, "x", "s2"), (6, "y", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["group"]: r for r in dedup_rate_by_group(docs).collect()}
    assert out["s1"].n_docs == 4 and out["s1"].n_unique == 2
    assert out["s1"].dup_rate == 0.5
    assert out["s2"].dup_rate == 0.0 and out["s2"].n_unique == 2


@pytest.mark.volume
def test_minhash_collapse_byte_identical_to_uncollapsed(spark):
    """r11 exact-dup pre-collapse: the collapsed pipeline must reproduce the
    UNCOLLAPSED pipeline's output row set exactly — cross-group pairs,
    intra-group (jaccard 1.0) pairs, and the occupancy cap counted in
    DOCUMENTS — on a corpus with heavy duplication, both uncapped and with
    a cap small enough to actually drop buckets."""
    from pyspark.sql import functions as F

    base = [
        "spark shuffle join partition exchange codegen whole stage",
        "spark shuffle join partition exchange codegen whole stage tungsten",
        "completely different words about cats and dogs and fish",
        "boilerplate header lorem ipsum dolor sit amet consectetur",
    ]
    rows = [(g * 100 + i, t) for g, t in enumerate(base) for i in range(4 if g < 2 else 7)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def uncollapsed(max_bucket):
        sh = D.shingle_sets(docs)
        sig = D.minhash_signatures(sh, 16)
        band_structs = F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("-", *[F.col(f"mh{b*2+r}").cast("string") for r in range(2)]).alias("band_key"))
            for b in range(8)])
        buckets = sig.select("id", F.explode(band_structs).alias("bk")).select(
            "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
        buckets = D._cap_bucket_occupancy(buckets, ["band", "band_key"], max_bucket)
        left = buckets.select("band", "band_key", F.col("id").alias("id_a"))
        right = buckets.select("band", "band_key", F.col("id").alias("id_b"))
        cand = (left.join(right, ["band", "band_key"]).where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
        # r12: verify over shingle digests, mirroring the operator's recipe
        dg = sh.select("id", F.array_distinct(F.transform("shingles", D._h)).alias("dg"))
        return (cand
                .join(dg.select(F.col("id").alias("id_a"), F.col("dg").alias("dg_a")), "id_a")
                .join(dg.select(F.col("id").alias("id_b"), F.col("dg").alias("dg_b")), "id_b")
                .select("id_a", "id_b", F.round(D._jaccard(F.col("dg_a"), F.col("dg_b")), 6).alias("jaccard"))
                .where(F.col("jaccard") >= 0.3))

    for cap in (None, 5):
        want = {(r.id_a, r.id_b): r.jaccard for r in uncollapsed(cap).collect()}
        got = {(r.id_a, r.id_b): r.jaccard
               for r in D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=cap).collect()}
        assert got == want, f"cap={cap}: diff={set(got.items()) ^ set(want.items())}"
    # sanity: the cap=5 arm must actually differ from uncapped (the cap binds)
    uncapped = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=None).collect()}
    capped = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=5).collect()}
    assert capped < uncapped


@pytest.mark.volume
def test_ngram_collapse_byte_identical_to_uncollapsed(spark):
    """r12 exact-dup pre-collapse on the inverted-index Jaccard tier: the
    collapsed pipeline must reproduce the UNCOLLAPSED pipeline's row set
    exactly — cross-group pairs, intra-group pairs under a binding max_df
    (jaccard s/(2n−s), NOT a blanket 1.0), and document-grain df counts."""
    from pyspark.sql import functions as F

    base = [
        "spark shuffle join partition exchange codegen whole stage",
        "spark shuffle join partition exchange codegen whole stage tungsten",
        "completely different words about cats and dogs and fish",
        "boilerplate header lorem ipsum dolor sit amet consectetur",
    ]
    rows = [(g * 100 + i, t) for g, t in enumerate(base) for i in range(4 if g < 2 else 7)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def uncollapsed(max_df):
        sh = D.shingle_sets(docs)
        sized = sh.select(
            "id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("sh")
        )
        if max_df is not None:
            rare = (
                sized.groupBy("sh").agg(F.count("*").alias("_df"))
                .where(F.col("_df") <= max_df).select("sh")
            )
            sized = sized.join(rare, "sh")
        a = sized.select("sh", F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
        b = sized.select("sh", F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
        inter = (
            a.join(b, "sh").where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "n_a", "n_b").agg(F.count("*").alias("inter"))
        )
        jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        return (
            inter.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= 0.3)
        )

    # max_df=6 binds: group-2/3 shingles (7 copies each) get dropped entirely,
    # so their intra pairs must VANISH (s=0), and the 4-copy groups keep s=n
    for max_df in (None, 10, 6):
        want = {(r.id_a, r.id_b): r.jaccard for r in uncollapsed(max_df).collect()}
        got = {(r.id_a, r.id_b): r.jaccard
               for r in D.ngram_jaccard_pairs(docs, threshold=0.3, max_df=max_df).collect()}
        assert got == want, f"max_df={max_df}: diff={set(got.items()) ^ set(want.items())}"
    # sanity: the max_df=6 arm differs from unfiltered (the dial binds)
    full = {(r.id_a, r.id_b) for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    capped = {(r.id_a, r.id_b) for r in D.ngram_jaccard_pairs(docs, threshold=0.3, max_df=6).collect()}
    assert capped < full


@pytest.mark.volume
def test_simhash_collapse_byte_identical_to_uncollapsed(spark):
    """r12 exact-dup pre-collapse on the SimHash pigeonhole tier: collapsed
    output == uncollapsed output exactly, uncapped AND with a binding
    occupancy cap counted in DOCUMENTS."""
    from pyspark.sql import functions as F

    base = [
        "spark shuffle join partition exchange codegen whole stage",
        "spark shuffle join partition exchange codegen whole stage tungsten",
        "completely different words about cats and dogs and fish",
        "boilerplate header lorem ipsum dolor sit amet consectetur",
    ]
    rows = [(g * 100 + i, t) for g, t in enumerate(base) for i in range(4 if g < 2 else 7)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bits, max_hamming = 32, 3
    n_blocks = max_hamming + 1

    def uncollapsed(max_bucket):
        sig = D.simhash_signatures(docs, bits=bits)
        widths = [bits // n_blocks] * n_blocks
        widths[-1] += bits % n_blocks
        offsets = [sum(widths[:i]) for i in range(n_blocks)]
        block_structs = F.array(*[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("val"),
            )
            for i in range(n_blocks)
        ])
        keyed = sig.select("id", "simhash", F.explode(block_structs).alias("bk")).select(
            "id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val")
        )
        keyed = D._cap_bucket_occupancy(keyed, ["blk", "val"], max_bucket)
        a = keyed.select("blk", "val", F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
        b = keyed.select("blk", "val", F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
        ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        return (
            a.join(b, ["blk", "val"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming).distinct()
        )

    for cap in (None, 5):
        want = {(r.id_a, r.id_b): r.hamming for r in uncollapsed(cap).collect()}
        got = {(r.id_a, r.id_b): r.hamming
               for r in D.simhash_pairs(docs, max_bucket=cap).collect()}
        assert got == want, f"cap={cap}: diff={set(got.items()) ^ set(want.items())}"
    # sanity: the cap=5 arm must actually differ from uncapped
    uncapped = {(r.id_a, r.id_b) for r in D.simhash_pairs(docs, max_bucket=None).collect()}
    capped = {(r.id_a, r.id_b) for r in D.simhash_pairs(docs, max_bucket=5).collect()}
    assert capped < uncapped


@pytest.mark.volume
def test_embedding_collapse_byte_identical_to_uncollapsed(spark):
    """r12 exact-dup pre-collapse on the embedding near-dup family
    (_exact_collapse_vec): both the exact N² arm and the LSH arm must
    reproduce the uncollapsed pipelines' row sets exactly on a corpus with
    heavy vector duplication — cross-group pairs, intra-group (cosine 1.0)
    pairs, zero-vector groups (cos defined 0.0, threshold-filtered), and a
    binding occupancy cap counted in DOCUMENTS."""
    import math

    from pyspark.sql import functions as F

    from mcp_synaptic_spark.functions.vector import as_double, dot_fixed, norm
    from mcp_synaptic_spark.operators.similarity import _hyperplanes, hyperplane_bucket

    dim = 4
    base_vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.999, 0.01, 0.0, 0.0],   # near-dup of the first
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],      # zero vector — cos defined 0.0
    ]
    rows = [
        (g * 100 + i, v)
        for g, v in enumerate(base_vecs)
        for i in range(5 if g < 2 else 8)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    thr = 0.9

    def uncollapsed_exact():
        b = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
            norm(as_double(F.col("embedding"))).alias("nrm"),
        )
        a = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
        c = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
        cos = F.when((F.col("na") == 0.0) | (F.col("nb") == 0.0), F.lit(0.0)).otherwise(
            dot_fixed("va", "vb", dim) / (F.col("na") * F.col("nb"))
        )
        return (
            a.crossJoin(c).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
            .where(F.col("cosine") >= thr)
        )

    want = {(r.id_a, r.id_b): r.cosine for r in uncollapsed_exact().collect()}
    got = {(r.id_a, r.id_b): r.cosine
           for r in D.embedding_near_dup_pairs(emb, threshold=thr, dim=dim, auto_lsh=False).collect()}
    assert got == want, f"exact arm diff: {set(got.items()) ^ set(want.items())}"
    # the planted intra pairs are present with cosine exactly 1.0
    assert got[(0, 1)] == 1.0 and (300, 301) not in got  # zero-vector group filtered

    def uncollapsed_lsh(max_bucket, n_planes=2, n_tables=3, seed=42):
        b = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
            norm(as_double(F.col("embedding"))).alias("nrm"),
        )
        bucket_arr = F.array(*[
            hyperplane_bucket("v", _hyperplanes(dim, n_planes, seed + t))
            for t in range(n_tables)
        ])
        bucketed = b.select("id", bucket_arr.alias("bks"))
        buckets = bucketed.select("id", F.posexplode("bks").alias("tbl", "bucket"))
        buckets = D._cap_bucket_occupancy(buckets, ["tbl", "bucket"], max_bucket)
        left = buckets.select("tbl", "bucket", F.col("id").alias("id_a"))
        right = buckets.select("tbl", "bucket", F.col("id").alias("id_b"))
        cand = (left.join(right, ["tbl", "bucket"]).where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
        cos = F.when((F.col("na") == 0.0) | (F.col("nb") == 0.0), F.lit(0.0)).otherwise(
            dot_fixed("va", "vb", dim) / (F.col("na") * F.col("nb"))
        )
        return (
            cand.join(b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")), "id_a")
            .join(b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")), "id_b")
            .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
            .where(F.col("cosine") >= thr)
        )

    for cap in (None, 8):
        want = {(r.id_a, r.id_b): r.cosine for r in uncollapsed_lsh(cap).collect()}
        got = {(r.id_a, r.id_b): r.cosine
               for r in D.embedding_near_dup_pairs_lsh(
                   emb, threshold=thr, dim=dim, n_planes=2, n_tables=3, max_bucket=cap
               ).collect()}
        assert got == want, f"lsh cap={cap}: diff={set(got.items()) ^ set(want.items())}"
    # sanity: the cap=8 arm must actually differ from uncapped
    uncapped = {(r.id_a, r.id_b) for r in D.embedding_near_dup_pairs_lsh(
        emb, threshold=thr, dim=dim, n_planes=2, n_tables=3, max_bucket=None).collect()}
    capped = {(r.id_a, r.id_b) for r in D.embedding_near_dup_pairs_lsh(
        emb, threshold=thr, dim=dim, n_planes=2, n_tables=3, max_bucket=8).collect()}
    assert capped < uncapped


@pytest.mark.volume
def test_dedup_index_probe_cap_counts_documents(spark, tmp_path):
    """r12 rep-grain index: with a BINDING occupancy cap, the persisted
    probe (grp_n-weighted cap over stored rep rows) must equal the inline
    screen (weighted cap over freshly collapsed reps) verdict-for-verdict
    on a heavily duplicated corpus — the cap counts DOCUMENTS either way."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import (
        dedup_incremental,
        dedup_index_load,
        dedup_index_write,
    )

    base = [
        "spark shuffle join partition exchange codegen whole stage",
        "spark shuffle join partition exchange codegen whole stage tungsten",
        "completely different words about cats and dogs and fish",
    ]
    rows = [(g * 100 + i, t) for g, t in enumerate(base) for i in range(12)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (9001, base[0]),                                # exact dup
            (9002, base[1] + " extra trailing words here"), # near-ish
            (9003, "entirely novel arrival content words"), # admitted
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    dedup_index_write(corpus, path)
    # cap=10 binds: every group holds 12 documents, so every corpus bucket
    # is over-occupied and near-dup candidates must vanish identically on
    # both paths (exact arm is cap-independent)
    for cap in (None, 10):
        direct = {r.doc_id: (r.verdict, r.match_id) for r in dedup_incremental(
            corpus, batch, threshold=0.3, max_bucket=cap).collect()}
        probed = {r.doc_id: (r.verdict, r.match_id) for r in dedup_incremental(
            None, batch, index=dedup_index_load(spark, path),
            threshold=0.3, max_bucket=cap).collect()}
        assert direct == probed, f"cap={cap}: {direct} != {probed}"
    uncapped = {r.doc_id: r.verdict for r in dedup_incremental(
        corpus, batch, threshold=0.3).collect()}
    capped = {r.doc_id: r.verdict for r in dedup_incremental(
        corpus, batch, threshold=0.3, max_bucket=10).collect()}
    assert uncapped[9001] == "exact_dup" and capped[9001] == "exact_dup"
    assert uncapped[9002] == "near_dup" and capped[9002] == "admitted"  # cap bites
    assert uncapped[9003] == "admitted"


def test_collapse_auto_gate_fires_on_duplication_only(spark):
    """r12 auto gate: the exact-dup collapse must engage on a dup-heavy
    corpus and SKIP (identity, members=None) on a dup-free one — outputs
    are byte-identical either way (the byte-identity tests cover both
    corpora shapes); this pins the physical decision itself."""
    heavy = spark.createDataFrame(
        [(i, "same text for everyone") for i in range(20)]
        + [(100 + i, f"unique text number {i}") for i in range(5)],
        "doc_id long, text string",
    )
    light = spark.createDataFrame(
        [(i, f"unique text number {i}") for i in range(25)],
        "doc_id long, text string",
    )
    _, members_h, n_h = D._exact_collapse(heavy, "text", "doc_id")
    _, members_l, n_l = D._exact_collapse(light, "text", "doc_id")
    assert members_h is not None and n_h == 25
    assert members_l is None and n_l == 25
    ve = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(20)] + [(100 + i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    vl = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(25)],
        "vec_id long, embedding array<float>",
    )
    assert D._exact_collapse_vec(ve, "embedding", "vec_id")[1] is not None
    assert D._exact_collapse_vec(vl, "embedding", "vec_id")[1] is None
