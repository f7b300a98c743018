"""Unit semantics for exact substring dedup (operators/curation.py):
keep-lowest-doc ownership, alignment-free detection, span merging, and
text-verified duplication (the property span_dup_stats lacks)."""

from __future__ import annotations

from yamr_spark.operators.curation import (
    substring_dedup_docs,
    substring_dedup_spans,
)

# 12 shared tokens (one duplicated substring > width) with different
# surrounding context and OFFSETS in each doc — alignment-free case.
_SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def _docs(spark):
    rows = [
        # doc 1 owns the shared run (lowest id containing it)
        (1, f"{_SHARED} tail one two three"),
        # doc 2 repeats it at a different offset -> dropped there
        (2, f"lead in words here {_SHARED} and more after"),
        # doc 3 has no duplication
        (3, "completely different content with nothing shared at all here ok"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spans_drop_only_non_owner(spark):
    spans = substring_dedup_spans(_docs(spark), width=8).collect()
    assert {r["doc_id"] for r in spans} == {2}
    (s,) = spans
    # doc 2: shared run starts at token 5 (after 4 lead tokens), 12 long
    assert s["span_start"] == 5
    assert s["span_end"] == 16
    assert s["span_tokens"] == 12


def test_docs_ledger(spark):
    out = {r["doc_id"]: r for r in substring_dedup_docs(_docs(spark), width=8).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["dropped_tokens"] == 0 and out[1]["kept_frac"] == 1.0
    assert out[3]["dropped_tokens"] == 0
    assert out[2]["n_tokens"] == 19
    assert out[2]["dropped_tokens"] == 12
    assert out[2]["kept_tokens"] == 7
    assert abs(out[2]["kept_frac"] - round(7 / 19, 6)) < 1e-9


def test_within_doc_repeat_not_duplicated(spark):
    """A run repeated only WITHIN one doc is not cross-document
    duplication — nothing drops."""
    df = spark.createDataFrame(
        [(1, f"{_SHARED} {_SHARED}"), (2, "other words " * 10)],
        "doc_id bigint, text string",
    )
    assert substring_dedup_spans(df, width=8).count() == 0


def test_owner_keeps_even_with_many_copies(spark):
    """Three docs share the run; only the lowest id keeps it."""
    df = spark.createDataFrame(
        [
            (7, f"x y z {_SHARED}"),
            (5, f"{_SHARED} p q"),
            (9, f"a b {_SHARED} c d"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup_docs(df, width=8).collect()}
    assert out[5]["dropped_tokens"] == 0
    assert out[7]["dropped_tokens"] == 12
    assert out[9]["dropped_tokens"] == 12


def test_dedup_ladder_rungs(spark):
    """Each rung removes exactly what the previous cannot see."""
    from yamr_spark.operators.curation import dedup_ladder

    rows = [
        (1, f"{_SHARED} unique tail"),
        (2, f"{_SHARED} unique tail"),          # byte-exact dup of 1
        (3, f"  {_SHARED}   UNIQUE\ttail "),    # normalized dup of 1
        (4, f"prefix words {_SHARED} suffix"),  # span-level overlap only
        (5, "nothing shared here at all in this one document"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["stage"]: r for r in dedup_ladder(df, width=8).collect()}
    assert out["00_raw"]["n_docs"] == 5
    assert out["01_exact"]["n_docs"] == 4      # doc 2 gone
    assert out["02_normalized"]["n_docs"] == 3  # doc 3 gone
    assert out["03_substring"]["n_docs"] == 3   # docs stay
    # doc 4 loses the 12 shared tokens to doc 1 at the substring rung
    assert (
        out["02_normalized"]["n_tokens"] - out["03_substring"]["n_tokens"] == 12
    )


def test_incremental_index_owns(spark):
    """The standing corpus owns by definition: a new doc repeating an
    index run drops it; new-only runs survive; cross-NEW duplication is
    NOT dropped (it is the batch's own content until ingested)."""
    from yamr_spark.operators.curation import substring_dedup_incremental

    idx = spark.createDataFrame(
        [(100, f"standing corpus holds {_SHARED} forever")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (1, f"fresh intro {_SHARED} fresh outro"),
            (3, "entirely novel content with no overlap whatsoever here"),
            # docs 5 and 7 share a run ONLY with each other, not the index
            (5, "pp qq rr ss tt uu vv ww xx yy zz one"),
            (7, "pp qq rr ss tt uu vv ww xx yy zz two"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in substring_dedup_incremental(new, idx, width=8).collect()
    }
    assert set(out) == {1, 3, 5, 7}
    assert out[1]["dropped_tokens"] == 12
    assert out[3]["dropped_tokens"] == 0
    assert out[5]["dropped_tokens"] == 0 and out[7]["dropped_tokens"] == 0


def test_char_granularity_catches_boundary_straddle(spark):
    """A duplicate that tokenizes differently (punctuation variant)
    is invisible to word windows but caught at char granularity."""
    from yamr_spark.operators.curation import substring_dedup_chars

    run = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, f"{run} plus unique content here"),
            # same byte run embedded elsewhere
            (2, f"INTRO>>{run}<<OUTRO"),
            (3, "completely different text with no shared character runs"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup_chars(df, length=40).collect()}
    assert out[1]["dropped_chars"] == 0  # owner keeps
    assert out[2]["dropped_chars"] == len(run)  # maximal merged span
    assert out[2]["n_dropped_spans"] == 1
    assert out[3]["dropped_chars"] == 0


def test_minimized_guarantee_and_exactness(spark):
    """Minimizer-anchored form: any >= w+k-1 = 40-char cross-doc
    duplicate MUST flag in the non-owner (winnowing guarantee), every
    flagged span must lie inside a true shared byte run (text-verified,
    zero false positives), and unique docs flag nothing."""
    from yamr_spark.operators.curation import substring_dedup_minimized

    run = "the quick brown fox jumps over the lazy dog again and again"
    assert len(run) >= 40
    df = spark.createDataFrame(
        [
            (1, f"{run} plus unique content here"),
            (2, f"INTRO>>{run}<<OUTRO"),
            (3, "completely different text with no shared character runs"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r for r in substring_dedup_minimized(df).collect()
    }
    assert out[1]["flagged_chars"] == 0  # owner keeps
    assert out[3]["flagged_chars"] == 0  # unique doc untouched
    # guarantee: the >=40-char duplicate flags in doc 2 ...
    assert out[2]["n_flagged_spans"] >= 1
    # ... and exactness: flagged coverage never exceeds the true shared
    # run (anchors verify by text; doc 2's only shared bytes are `run`)
    assert 0 < out[2]["flagged_chars"] <= len(run)


def test_minimized_subguarantee_duplicates_may_skip(spark):
    """Below k chars a shared run can never verify (no shared 16-gram
    exists when contexts differ right at the boundary): flags stay 0."""
    from yamr_spark.operators.curation import substring_dedup_minimized

    short = "tiny shared bit"  # 15 chars < k=16
    df = spark.createDataFrame(
        [
            (1, f"aaaa {short} bbbb unique left context padding words"),
            (2, f"cccc {short} dddd other right context padding words"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r for r in substring_dedup_minimized(df).collect()
    }
    assert out[1]["flagged_chars"] == 0
    assert out[2]["flagged_chars"] == 0


def test_minimized_flags_all_non_owners(spark):
    """Three copies of a long run: lowest doc owns, both others flag."""
    from yamr_spark.operators.curation import substring_dedup_minimized

    run = "x " + "shared payload sentence repeated verbatim across docs " * 2
    df = spark.createDataFrame(
        [
            (7, f"noise alpha {run} noise beta"),
            (3, f"{run} trailing"),
            (9, f"prefix text {run}"),
            (5, "nothing in common with the others at all in this one"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r for r in substring_dedup_minimized(df).collect()
    }
    assert out[3]["flagged_chars"] == 0  # owner = lowest doc_id
    assert out[7]["flagged_chars"] > 0
    assert out[9]["flagged_chars"] > 0
    assert out[5]["flagged_chars"] == 0


def test_minimizer_chunked_selection_equals_dense(spark, sf_dir):
    """The outlier-document window-block path must select EXACTLY the
    dense projection's (doc_id, s, h) set: force chunk far below every
    document's window count so ALL real corpus docs route through the
    chunked path, and compare against the default (all-dense) run.
    This is the guard's exactness law on real data, not a toy doc."""
    from pyspark.sql import functions as F

    from yamr_spark.operators.curation import (
        MINIMIZER_K,
        MINIMIZER_W,
        _minimizer_anchors,
    )
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(120)
    eligible = docs.select("doc_id", "text").filter(
        F.length("text") >= MINIMIZER_K
    )
    dense = {
        (r.doc_id, r.s, r.h)
        for r in _minimizer_anchors(eligible, MINIMIZER_K, MINIMIZER_W).collect()
    }
    chunked = {
        (r.doc_id, r.s, r.h)
        for r in _minimizer_anchors(
            eligible, MINIMIZER_K, MINIMIZER_W, chunk=7
        ).collect()
    }
    assert dense and chunked == dense


def test_minimized_outlier_doc_guard(spark):
    """A document beyond the chunk threshold routes through the
    window-block path INSIDE the public operator (bounded per-row
    state) and still honors the >= 40-char winnowing guarantee across
    a block boundary: the planted duplicate straddles the first/second
    block and must flag in the long non-owner doc."""
    import random

    from yamr_spark.operators.curation import substring_dedup_minimized

    rng = random.Random(42)
    alpha = "abcdefghij "
    # ~30k-char outlier with a 60-char run planted right at the block
    # boundary (chunk=5000 windows), owned by short doc 1
    run = "the quick brown fox jumps over the lazy dog again and again"
    body = "".join(rng.choice(alpha) for _ in range(30_000))
    long_text = body[:4_980] + run + body[4_980:]
    df = spark.createDataFrame(
        [(1, f"archive {run} copy"), (2, long_text)],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in substring_dedup_minimized(df, chunk=5_000).collect()
    }
    assert out[1]["flagged_chars"] == 0  # owner keeps
    assert out[2]["n_flagged_spans"] >= 1
    assert 0 < out[2]["flagged_chars"] <= len(run)
    # and the ledger is identical to the unchunked computation
    ref = {
        r["doc_id"]: r for r in substring_dedup_minimized(df).collect()
    }
    for d in (1, 2):
        assert out[d]["flagged_chars"] == ref[d]["flagged_chars"]
        assert out[d]["n_flagged_spans"] == ref[d]["n_flagged_spans"]


def test_minimized_incremental_index_owns(spark):
    """Incremental minimized form: a new doc sharing a >=40-char run
    with the INDEX flags it; sharing only with another NEW doc does
    not (the standing corpus owns by definition, new-vs-new waits for
    the next batch roll-in); unique new docs flag nothing."""
    from yamr_spark.operators.curation import (
        substring_dedup_minimized_incremental,
    )

    run = "the quick brown fox jumps over the lazy dog again and again"
    new_run = "entirely different payload repeated across two new docs!!"
    assert len(run) >= 40 and len(new_run) >= 40
    index = spark.createDataFrame(
        [(2, f"archive copy {run} stored earlier")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (11, f"INTRO>>{run}<<OUTRO"),          # dup vs index -> flags
            (13, f"alpha {new_run} omega"),         # dup vs new 15 only
            (15, f"start {new_run} finish"),        # dup vs new 13 only
            (17, "nothing shared with anyone here in this document"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in substring_dedup_minimized_incremental(new, index).collect()
    }
    assert set(out) == {11, 13, 15, 17}  # ledger covers ALL new docs
    assert out[11]["n_flagged_spans"] >= 1
    assert 0 < out[11]["flagged_chars"] <= len(run)
    assert out[13]["flagged_chars"] == 0
    assert out[15]["flagged_chars"] == 0
    assert out[17]["flagged_chars"] == 0
