"""Golden + invariant tests for the round-6 latecomer queries
(containment dedup, PSI drift, purchase cadence, median trend,
ship latency, basket lift). Each is oracle-gated in the registry;
these pin the SEMANTICS with hand-checkable cases and structural
invariants so a plan refactor that silently changes meaning fails
here before it reaches the driver."""

from __future__ import annotations

import pyspark.sql.functions as F

from yamr_spark.registry import all_queries
from yamr_spark.tables import table


def test_containment_directed_golden(spark):
    """A is a strict prefix of B: every A-shingle appears in B, so
    containment(A→B) = 1.0 while containment(B→A) = |A|/|B| < 1 —
    the asymmetry Jaccard can't express. C shares nothing → no rows."""
    from yamr_spark.operators.dedup import containment_pairs

    a_text = "the quick brown fox jumps over the lazy dog today"
    b_text = a_text + " extra"
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, "completely unrelated words here now")],
        ["doc_id", "text"],
    )
    rows = {
        (r.src, r.dst): r.containment
        for r in containment_pairs(docs, threshold=0.5, n=3).collect()
    }
    assert rows[(1, 2)] == 1.0
    # B has 9 shingles (11 words, n=3), A's 8 are all contained.
    assert 0.5 < rows[(2, 1)] < 1.0
    assert not any(3 in k for k in rows)


def test_containment_threshold_filters_direction(spark):
    """With a threshold above |A|/|B| only the subset direction
    survives — the directed output contract."""
    from yamr_spark.operators.dedup import containment_pairs

    a_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b_text = a_text + " lambda mu"
    docs = spark.createDataFrame([(1, a_text), (2, b_text)], ["doc_id", "text"])
    rows = {
        (r.src, r.dst): r.containment
        for r in containment_pairs(docs, threshold=0.95, n=3).collect()
    }
    assert (1, 2) in rows and rows[(1, 2)] == 1.0
    assert (2, 1) not in rows


def test_psi_terms_nonnegative(spark, sf_dir):
    """(c-p)·ln(c/p) has matching signs in both factors, so every PSI
    term is ≥ 0; proportions are valid probabilities; bins clamped."""
    rows = all_queries()["quality_drift_psi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bin <= 7
        assert 0 < r.ref_prop <= 1 and 0 < r.cur_prop <= 1
        assert r.psi_term >= 0


def test_repeat_purchase_gap_invariants(spark, sf_dir):
    """n_gaps is exactly n_purchases − 1 per user (LAG over a single
    partition-ordered pass), and min ≤ avg when gaps exist."""
    rows = all_queries()["repeat_purchase_interval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps == r.n_purchases - 1
        if r.n_gaps:
            assert r.min_gap_hours <= r.avg_gap_hours
            assert r.min_gap_hours >= 0
        else:
            assert r.avg_gap_hours is None


def test_daily_median_trend_delta_chain(spark, sf_dir):
    """Day-over-day deltas recompose: delta_d = p50_d − p50_{d−1} with
    the first day NULL; n_events partitions the events table."""
    rows = sorted(
        all_queries()["daily_value_median_trend"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert sum(r.n_events for r in rows) == table(spark, sf_dir, "events").count()
    assert rows[0].p50_delta is None
    for prev, cur in zip(rows, rows[1:]):
        assert abs(cur.p50_delta - round(cur.p50 - prev.p50, 6)) < 1e-6


def test_supplier_ship_latency_partitions_lineitem(spark, sf_dir):
    """Every lineitem has an order (FK), so n_items sums to |lineitem|;
    the max gap bounds the average."""
    rows = all_queries()["supplier_ship_latency"](spark, sf_dir).collect()
    assert sum(r.n_items for r in rows) == table(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r.avg_ship_days <= r.max_ship_days


def test_basket_lift_support_and_symmetry_bounds(spark, sf_dir):
    """Pairs are canonical (cat_a < cat_b), supported (≥5 co-orders),
    and lift is positive with pair support bounded by either margin."""
    out = all_queries()["basket_type_lift"](spark, sf_dir)
    items = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "l_orderkey", F.substring_index("p_type", " ", 1).alias("cat")
        )
        .distinct()
    )
    freq = {r.cat: r.n for r in items.groupBy("cat").agg(F.count("*").alias("n")).collect()}
    for r in out.collect():
        assert r.cat_a < r.cat_b
        assert r.pair_cnt >= 5
        assert r.lift > 0
        assert r.pair_cnt <= min(freq[r.cat_a], freq[r.cat_b])


# ---- differential property: containment values recomputed in Python

def _shingles(text: str, n: int = 3) -> set[str]:
    import re

    toks = [t for t in re.split(r"[^\w]+", text.lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_containment_values_match_python_recompute(spark):
    """Differential check: every (src, dst, containment) row the
    operator emits must equal |S(src) ∩ S(dst)| / |S(src)| computed
    from first principles. Candidate RECALL is the LSH band policy's
    business (documented in the operator); the VALUES must be exact."""
    from yamr_spark.operators.dedup import containment_pairs

    texts = {
        1: "one two three four five six seven eight nine ten",
        2: "one two three four five six seven eight nine ten eleven twelve",
        3: "zero one two three four five six seven eight nine ten extra",
        4: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        5: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = containment_pairs(docs, threshold=0.1, n=3).collect()
    assert out, "expected at least the duplicate pair 4<->5"
    for r in out:
        s_src, s_dst = _shingles(texts[r.src]), _shingles(texts[r.dst])
        expect = round(len(s_src & s_dst) / len(s_src), 6)
        assert abs(r.containment - expect) < 1e-9, (r.src, r.dst)
    pairs = {(r.src, r.dst) for r in out}
    assert (4, 5) in pairs and (5, 4) in pairs


def test_dedup_operators_tolerate_sub_shingle_docs(spark):
    """Crawl corpora contain empty and sub-shingle-width documents;
    every near-dup operator must exclude them without NULL-poisoning
    or crashing, while still finding the real duplicate pair."""
    from yamr_spark.operators.dedup import (
        containment_pairs,
        minhash_near_dup,
        ngram_jaccard_pairs,
        simhash_near_dup,
    )

    docs = spark.createDataFrame(
        [
            (1, "hi"),
            (2, "two words"),
            (3, ""),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    assert sorted((r[0], r[1]) for r in minhash_near_dup(docs).collect()) == [(4, 5)]
    assert sorted((r[0], r[1]) for r in ngram_jaccard_pairs(docs).collect()) == [(4, 5)]
    assert sorted((r[0], r[1]) for r in simhash_near_dup(docs).collect()) == [(4, 5)]
    got = sorted((r.src, r.dst) for r in containment_pairs(docs).collect())
    assert got == [(4, 5), (5, 4)]


def test_null_text_and_null_embeddings_are_safe(spark):
    """Crawl corpora contain NULL text and NULL embeddings. Pinned
    behavior: exact_dedup collapses all NULL-text docs into ONE group
    (SQL NULL-equality grouping — documented in the operator); the
    fuzzy dedup operators exclude NULL docs entirely; ANN scorers give
    NULL vectors NULL cosines so they never outrank a real neighbor
    and never appear in thresholded pairs."""
    from pyspark.sql import types as T

    from yamr_spark.operators.dedup import exact_dedup, minhash_near_dup
    from yamr_spark.operators.similarity import brute_force_topk, embedding_near_dup

    dschema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    docs = spark.createDataFrame(
        [
            (1, None),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, None),
        ],
        dschema,
    )
    groups = {r.keep_id: r.dup_cnt for r in exact_dedup(docs).collect()}
    assert groups == {1: 2, 2: 2}
    assert [(r.doc_a, r.doc_b) for r in minhash_near_dup(docs).collect()] == [(2, 3)]

    eschema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.9, 0.1, 0.0], 0),
            (2, None, 1),
            (3, [0.0, 1.0, 0.0], 1),
        ],
        eschema,
    )
    brute = brute_force_topk(emb, k=2, num_queries=4).collect()
    assert all(r.cosine is None for r in brute if 2 in (r.query_id, r.neighbor_id))
    pairs = embedding_near_dup(emb, threshold=0.1).collect()
    assert not any(2 in (r.vec_a, r.vec_b) for r in pairs)


def test_unicode_text_dedups_correctly(spark):
    """CJK, Arabic, emoji and control characters through the
    tokenizer-driven operators: the \\p{L}\\p{N} word-break class keeps
    non-Latin scripts tokenizable, so identical CJK docs and identical
    emoji-bearing docs are still found as duplicates."""
    from yamr_spark.operators.dedup import minhash_near_dup

    docs = spark.createDataFrame(
        [
            (1, "这是一个测试文档 它包含中文字符"),
            (2, "这是一个测试文档 它包含中文字符"),
            (3, "مرحبا بالعالم هذا نص عربي تجريبي"),
            (4, "emoji test 🎉🎊 mixed with ascii words"),
            (5, "emoji test 🎉🎊 mixed with ascii words"),
            (6, "ASCII control \x00\x01 chars inside text here"),
        ],
        ["doc_id", "text"],
    )
    pairs = sorted((r.doc_a, r.doc_b) for r in minhash_near_dup(docs, n=2).collect())
    assert pairs == [(1, 2), (4, 5)]
