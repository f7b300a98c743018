"""Behavioral tests for text-analysis operators."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox, and the lazy dog. It is fine."),
        (2, "le chat est sur la table et le chien est la"),
        (3, "1234 5678 90"),
        (4, "x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_stats(docs):
    from yamr_spark.operators.text import token_stats

    by_id = {r.doc_id: r for r in token_stats(docs).collect()}
    assert by_id[1].n_tokens == 11
    assert by_id[1].n_ws_tokens == 11
    assert by_id[3].n_tokens == 3
    assert by_id[4].n_tokens == 1 and by_id[4].avg_token_len == 1.0


def test_quality_score_ranges(docs):
    from yamr_spark.operators.text import quality_score

    by_id = {r.doc_id: r for r in quality_score(docs).collect()}
    for r in by_id.values():
        assert 0.0 <= r.quality <= 1.0
    assert by_id[1].quality > by_id[3].quality  # prose beats digit soup
    assert by_id[3].digit_ratio > 0.8
    assert by_id[1].stopword_ratio > 0.3


def test_lang_id(docs):
    from yamr_spark.operators.text import lang_id

    by_id = {r.doc_id: r for r in lang_id(docs).collect()}
    assert by_id[1].pred_lang == "en"
    assert by_id[2].pred_lang == "fr"
    assert by_id[4].pred_lang == "und"  # no profile hits


def test_doc_fingerprint_stability(spark):
    from yamr_spark.operators.text import doc_fingerprint

    a = spark.createDataFrame([(1, "hello world this is a document")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "hello world this is a document")], ["doc_id", "text"])
    fa = doc_fingerprint(a).collect()[0]
    fb = doc_fingerprint(b).collect()[0]
    assert (fa.fp_min, fa.fp_max) == (fb.fp_min, fb.fp_max)  # content-addressed
    # min/max-gram fingerprints tolerate small edits (that's the point of
    # winnowing-style fingerprints); only a fully different text must move
    # both extremes with near-certainty
    c = doc_fingerprint(
        spark.createDataFrame(
            [(3, "zebra quartz vortex jumble frantic wizard oxygen")],
            ["doc_id", "text"],
        )
    ).collect()[0]
    assert (fa.fp_min, fa.fp_max) != (c.fp_min, c.fp_max)


def test_kmv_exact_below_k_and_bounded_above_k(spark):
    """KMV: when distinct < k the sketch IS exact; when distinct >> k the
    estimate lands within the 3-sigma KMV error band (~3/sqrt(k))."""
    from yamr_spark.operators.text import kmv_distinct

    small = spark.range(0, 100).selectExpr("CAST(id AS STRING) AS v")
    r = kmv_distinct(small, "v", k=256).collect()[0]
    assert r.n_hashes == 100 and r.estimate == 100.0

    big = spark.range(0, 50_000).selectExpr("CAST(id AS STRING) AS v")
    r = kmv_distinct(big, "v", k=256).collect()[0]
    assert r.n_hashes == 256
    rel_err = abs(r.estimate - 50_000) / 50_000
    assert rel_err < 3.0 / (256 ** 0.5), f"estimate {r.estimate} off by {rel_err:.3f}"

    # determinism: identical on re-evaluation
    r2 = kmv_distinct(big, "v", k=256).collect()[0]
    assert (r.kth_min, r.estimate) == (r2.kth_min, r2.estimate)


def test_bpe_learns_sane_merges(spark, sf_dir):
    """BPE training: 3 ranked merges, distinct pairs, positive
    frequencies, and round 2+ can merge a symbol PRODUCED by round 1
    (the multi-char test is vacuous only if no learned pair chains —
    assert structure, not chaining)."""
    from yamr_spark.operators.text import bpe_learn_merges
    from yamr_spark.tables import table

    rows = bpe_learn_merges(table(spark, sf_dir, "documents")).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert all(r.freq > 0 for r in rows)
    pairs = {(r.sym_a, r.sym_b) for r in rows}
    assert len(pairs) == 3
    # determinism
    rows2 = bpe_learn_merges(table(spark, sf_dir, "documents")).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_bpe_merge_chains_on_synthetic(spark):
    """On a corpus of one repeated word, round 2 must merge the symbol
    round 1 produced (chaining through the merge table)."""
    from yamr_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(i, "abc abc abc") for i in range(5)], "doc_id long, text string"
    )
    rows = {r.rank: (r.sym_a, r.sym_b) for r in bpe_learn_merges(docs, n_merges=2).collect()}
    assert rows[1] == ("a", "b")
    assert rows[2] == ("ab", "c")


def test_bpe_batched_cand1_equals_strict(spark, sf_dir):
    """cand_k=1 batched BPE must BE strict BPE (same merges, order,
    freqs) — the equivalence that justifies calling batching a scale
    optimization rather than a different algorithm."""
    from yamr_spark.operators.text import bpe_learn_merges, bpe_learn_merges_batched
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    seq = bpe_learn_merges(docs, n_merges=3).collect()
    b1 = sorted(
        bpe_learn_merges_batched(docs, n_rounds=3, cand_k=1).collect(),
        key=lambda r: (r.round, r.rank),
    )
    assert [(r.sym_a, r.sym_b, r.freq) for r in seq] == [
        (r.sym_a, r.sym_b, r.freq) for r in b1
    ]
    assert all(r.rank == 1 for r in b1)


def test_bpe_batched_selection_is_independent(spark, sf_dir):
    """Within a round, selected merges must have pairwise-disjoint
    extended symbol sets {a, b, a||b} — the invariant that makes the
    one-pass fold order-insensitive — and batching must learn more
    merges per round than strict BPE."""
    from yamr_spark.operators.text import bpe_learn_merges_batched
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    rows = bpe_learn_merges_batched(docs, n_rounds=2, cand_k=6).collect()
    assert len(rows) > 2  # strictly more than one merge per round
    by_round = {}
    for r in rows:
        by_round.setdefault(r.round, []).append(r)
    for sel in by_round.values():
        exts = [{r.sym_a, r.sym_b, r.sym_a + r.sym_b} for r in sel]
        for i in range(len(exts)):
            for j in range(i + 1, len(exts)):
                assert not (exts[i] & exts[j]), (exts[i], exts[j])


def test_ngram_repetition_profile_golden(spark):
    """Golden: a degenerate looping doc fails, a diverse doc passes;
    fractions follow the documented char-mass definition."""
    from yamr_spark.operators.text import ngram_repetition_profile

    docs = spark.createDataFrame(
        [
            # 'spam ham' repeated 6x: top bigram 'spam ham' dominates,
            # every 5-gram duplicated
            (1, ("spam ham " * 6).strip()),
            # all-distinct tokens: every bigram unique, no dup 5-grams
            (2, "one two three four five six seven eight"),
            # shorter than 5 tokens: defined zeros for the 5-gram side
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ngram_repetition_profile(docs).collect()}
    assert rows[1].pass_repetition is False
    assert rows[1].dup_ngram_frac == 1.0
    assert rows[1].top_bigram in ("ham spam", "spam ham")
    assert rows[2].pass_repetition is False or rows[2].dup_ngram_frac == 0.0
    # doc 2: 7 distinct bigrams of 8 tokens -> top frac = len(top)/sum(lens)
    assert rows[2].dup_ngram_frac == 0.0
    assert rows[3].dup_ngram_frac == 0.0
    assert rows[3].top_bigram == "tiny doc"


def test_phrase_search_three_word_golden(spark):
    """Multi-word adjacency: overlapping/non-adjacent word hits must not
    count; only exact consecutive runs do."""
    from yamr_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),     # two exact runs
            (2, "a c b a b x c"),   # words present, never consecutive
            (3, "x a b c y"),       # one run mid-doc
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_occurrences for r in
           phrase_search(docs, ["a", "b", "c"]).collect()}
    assert got == {1: 2, 3: 1}


def test_phrase_search_rejects_single_word(spark):
    import pytest

    from yamr_spark.operators.text import phrase_search

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(docs, ["a"])


def test_hashed_doc_embeddings_unit_norm_and_determinism(spark, sf_dir):
    """Feature-hashed embeddings: every doc's sparse vector is unit-L2
    (to rounding), dims stay in [0, d), and the map is deterministic
    across invocations (hashing, no randomness)."""
    from yamr_spark.operators.text import hashed_doc_embeddings
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(40)
    rows = hashed_doc_embeddings(docs, d=32).collect()
    assert rows
    by_doc = {}
    for r in rows:
        assert 0 <= r.dim < 32
        by_doc.setdefault(r.doc_id, []).append(r.weight)
    for did, ws in by_doc.items():
        assert abs(sum(w * w for w in ws) - 1.0) < 1e-4, did
    again = sorted((r.doc_id, r.dim, r.weight) for r in hashed_doc_embeddings(docs, d=32).collect())
    assert again == sorted((r.doc_id, r.dim, r.weight) for r in rows)
