"""Unit pins for the r11-continuation additions: full MOSS winnowing
(selection rule vs a brute-force reference, the shared-substring
guarantee, density bounds), MinHash estimator-quality certification
(zero error on exact duplicates), CCNet tertile bucketing (exact
rank-tertile laws) and the DoReMi-lite epoch allocator (budget laws).

Each has a registered driver query with an exact DuckDB oracle; these
tests pin the semantic invariants the oracle hash alone doesn't
explain.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from yamr_spark.operators import curation as C
from yamr_spark.operators import dedup as D
from yamr_spark.operators import text as T
from yamr_spark.tables import table


def _winnow_ref(text: str, k: int, w: int) -> set[tuple[str, int]]:
    """Brute-force winnowing reference: rightmost-minimum rule,
    1-based positions, matching the operator's definition."""
    n_grams = max(len(text) - (k - 1), 1)
    hashes = [
        hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()
        for i in range(n_grams)
    ]
    out: set[tuple[str, int]] = set()
    n_starts = max(n_grams - (w - 1), 1)
    for s in range(n_starts):
        win = hashes[s : s + w]
        m = min(win)
        # rightmost occurrence of the minimum
        j = len(win) - 1 - win[::-1].index(m)
        out.add((m, s + j + 1))
    return out


def test_winnowing_matches_bruteforce(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    texts = {r.doc_id: r.text for r in docs.collect()}
    got: dict[int, set[tuple[str, int]]] = {}
    for r in T.winnowing_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add((r.fp, r.sel_pos))
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == _winnow_ref(text, T.WINNOW_K, T.WINNOW_W), doc_id


def test_winnowing_shared_substring_guarantee(spark):
    """Any shared substring of length >= k + w - 1 must yield at least
    one shared fingerprint (the winnowing theorem)."""
    shared = "zqxwvukjyhbn etaoin shrdlu cmfwyp"  # len 33 >= 12+8-1
    a = "left context entirely unlike " + shared + " first tail words"
    b = "completely different opening here " + shared + " other ending"
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = T.winnowing_fingerprints(docs).select("doc_id", "fp").collect()
    fa = {r.fp for r in fps if r.doc_id == 1}
    fb = {r.fp for r in fps if r.doc_id == 2}
    assert fa & fb, "shared 33-char substring produced no shared fingerprint"


def test_winnowing_density_bounds(spark, sf_dir):
    """Each selected fingerprint covers at most w windows, so
    n_windows / w <= n_fp <= n_windows."""
    docs = table(spark, sf_dir, "documents")
    rows = (
        T.winnowing_fingerprints(docs)
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").alias("n_fp"))
        .collect()
    )
    assert rows
    for r in rows:
        n_windows = max(r.n_grams - (T.WINNOW_W - 1), 1)
        assert n_windows / T.WINNOW_W <= r.n_fp <= n_windows, r


def test_winnow_near_dup_finds_planted_duplicate(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang quietly on a crumbling garden wall near "
        "the old observatory that nobody visits in november anymore"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " with a tiny appended suffix"),
            (3, "entirely unrelated content about spark physical plans "
                "and shuffle partition sizing at large scale factors"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in T.winnow_near_dup(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_estimate_exact_duplicates_have_zero_error(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    c = "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, c), (4, c)], "doc_id long, text string"
    )
    rows = D.minhash_estimate_vs_exact(docs).collect()
    # disjoint-vocab corpora: only the two identical pairs are candidates
    assert len(rows) == 1 and rows[0].bucket == 3
    assert rows[0].n_pairs == 2
    assert rows[0].mean_est == 1.0 and rows[0].mean_exact == 1.0
    assert rows[0].mean_abs_err == 0.0 and rows[0].max_abs_err == 0.0


def test_minhash_estimate_quality_on_fixture(spark, sf_dir):
    """The k=16 estimator's per-bucket mean |error| should sit within a
    few theoretical standard deviations (sd <= 0.125 = sqrt(.25/16))."""
    rows = D.minhash_estimate_vs_exact(
        table(spark, sf_dir, "documents")
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_abs_err <= 3 * 0.125, r


def test_lm_quality_buckets_tertile_laws(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    lang_counts = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    from yamr_spark.queries_text import q_lm_quality_buckets

    rows = q_lm_quality_buckets(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        n = lang_counts[lang]
        assert sum(b.n_docs for b in buckets.values()) == n
        for b in buckets.values():
            assert b.n_docs in (math.floor(n / 3), math.ceil(n / 3))
        # rank-ordered: tail scores <= middle scores <= head scores
        if {"tail", "middle", "head"} <= set(buckets):
            assert buckets["tail"].max_score <= buckets["middle"].min_score
            assert buckets["middle"].max_score <= buckets["head"].min_score


def test_domain_epoch_allocation_budget_laws(spark, sf_dir):
    rows = C.domain_epoch_allocation(
        table(spark, sf_dir, "documents")
    ).collect()
    assert rows
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-5
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert 0.0 < r.epochs <= 4.0
        assert r.alloc_tokens <= 4 * r.n_tokens
    # allocation never exceeds the budget (caps only ever shrink it)
    assert sum(r.alloc_tokens for r in rows) <= 2.0 * total + len(rows)


def test_llm_prep_pipeline_v5_funnel_laws(spark, sf_dir):
    """Stage monotonicity: docs/tokens shrink through dedup and gate;
    allocation stays within [1x, 4x] of the gated corpus (epochs are
    clamped to that range)."""
    from yamr_spark.queries_curation import q_llm_prep_pipeline_v5

    rows = {r.stage: r for r in q_llm_prep_pipeline_v5(spark, sf_dir).collect()}
    assert set(rows) == {"00_raw", "01_winnow_dedup", "02_lm_gate", "03_alloc"}
    assert rows["00_raw"].n_docs >= rows["01_winnow_dedup"].n_docs
    assert rows["01_winnow_dedup"].n_docs >= rows["02_lm_gate"].n_docs
    assert rows["00_raw"].n_tokens >= rows["01_winnow_dedup"].n_tokens
    assert rows["01_winnow_dedup"].n_tokens >= rows["02_lm_gate"].n_tokens
    gated = rows["02_lm_gate"].n_tokens
    assert rows["03_alloc"].n_docs == rows["02_lm_gate"].n_docs
    # floor() per domain can undershoot by at most |domains| tokens
    assert gated - 64 <= rows["03_alloc"].n_tokens <= 4 * gated


def test_normalization_dedup_catches_case_ws_variants(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello   World\tfoo"),
            (2, "  hello world foo  "),
            (3, "entirely different text"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.normalization_dedup_stats(docs).collect()}
    assert rows[1].norm_hash == rows[2].norm_hash
    assert rows[1].norm_dups == 2 and rows[2].norm_dups == 2
    assert rows[3].norm_dups == 1
    assert rows[1].ws_delta == 2  # '   ' -> ' ' (tab swaps 1:1 for space)
    assert rows[2].ws_delta == 4  # 2 leading + 2 trailing trimmed


def test_simhash_calibration_low_hamming_means_high_cosine(spark, sf_dir):
    """The signature's promise, measured: E[hamming] = 60*theta/pi, so
    hamming <= 3 of 60 implies cos(theta) >= cos(3*pi/60) ~ 0.988 in
    expectation — every candidate bin must sit near that bound."""
    rows = D.simhash_estimate_vs_exact(table(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 3
        # expectation bound, not per-pair: short docs have high-variance
        # signatures (sf0.001 has a hamming=3 pair at cos 0.77)
        assert r.min_cos >= 0.5, r
        assert r.mean_cos >= 0.9, r


def test_kmv_estimate_error_within_theory(spark, sf_dir):
    """k=256 KMV: relative error should sit within a few theoretical
    standard errors (1/sqrt(256) = 6.25%); when the sketch saw every
    distinct value (n_hashes < k) the estimate is exact."""
    from yamr_spark.queries_analytics import q_kmv_estimate_error

    r = q_kmv_estimate_error(spark, sf_dir).collect()[0]
    if r.n_hashes < 256:
        assert r.estimate == float(r.exact_distinct) and r.rel_err == 0.0
    else:
        assert r.rel_err <= 4 * 0.0625, r


def test_winnow_incremental_flags_planted_batch_dup(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang quietly on a crumbling garden wall near "
        "the old observatory that nobody visits in november anymore"
    )
    docs = spark.createDataFrame(
        [
            (2, base),                                  # index (even)
            (4, "other indexed content about winnowing fingerprints "
                "and rolling hashes across documents at corpus scale"),
            (1, base + " and one appended clause"),     # batch (odd): dup of 2
            (3, "novel batch document with fully original phrasing "
                "that matches nothing in the standing index at all"),
        ],
        "doc_id long, text string",
    )
    from yamr_spark.operators.text import winnowing_fingerprints

    fps = winnowing_fingerprints(docs).select("doc_id", "fp").distinct()
    out = {
        r.doc_id: r
        for r in T.winnow_incremental(
            fps.where(F.col("doc_id") % 2 == 1),
            fps.where(F.col("doc_id") % 2 == 0),
        ).collect()
    }
    assert 1 in out and out[1].match_id == 2
    assert 3 not in out


def test_srp_calibration_monotone_in_hamming(spark, sf_dir):
    """The certifiable SRP law on candidate pairs: mean exact cosine is
    (weakly) monotone DECREASING in signature hamming. The Charikar
    point prediction cos(pi*h/bits) does NOT hold on candidates —
    pigeonhole candidacy selects lucky one-block collisions, so on a
    corpus without true near-dups low-hamming bins hold near-orthogonal
    pairs. That gap is exactly why srp_near_dup exact-verifies."""
    from yamr_spark.operators import similarity as S

    rows = sorted(
        S.srp_estimate_vs_exact(table(spark, sf_dir, "embeddings")).collect(),
        key=lambda r: r.hamming,
    )
    assert rows
    solid = [r for r in rows if r.n_pairs >= 5]
    for lo, hi in zip(solid, solid[1:]):
        assert lo.mean_cos >= hi.mean_cos - 0.05, (lo, hi)
    for r in rows:
        assert abs(r.pred_cos - round(math.cos(math.pi * r.hamming / 32), 6)) < 1e-9
