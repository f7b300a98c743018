"""Unit pins for the round-9 additions. Each operator also has a
registered driver query with an exact DuckDB oracle; these tests pin
the semantic invariants the oracle hash alone doesn't explain
(deflation orthogonality, sketch-union idempotence, span-merge laws).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yamr_spark.operators.similarity import pca_top_component, pca_top_components
from yamr_spark.tables import table


def test_pca_components_first_equals_single(spark, sf_dir):
    """Component 1 of the deflation variant must be bit-identical to
    pca_top_component (same helper, same matrix, same rounds)."""
    emb = table(spark, sf_dir, "embeddings")
    single = {
        r.i: (r.loading, r.eigenvalue) for r in pca_top_component(emb).collect()
    }
    multi = pca_top_components(emb, n_components=2).collect()
    first = {r.i: (r.loading, r.eigenvalue) for r in multi if r.component == 1}
    # the components query canonicalizes -0.0 → +0.0; normalize both
    norm = lambda d: {k: (v[0] + 0.0, v[1] + 0.0) for k, v in d.items()}
    assert norm(first) == norm(single)


def test_pca_components_decreasing_unit_norm(spark, sf_dir):
    """On real (near-flat-spectrum) data the fixed-round estimate still
    guarantees: unit-norm iterates and non-increasing eigenvalues."""
    emb = table(spark, sf_dir, "embeddings")
    rows = pca_top_components(emb, n_components=2).collect()
    v1 = {r.i: r.loading for r in rows if r.component == 1}
    v2 = {r.i: r.loading for r in rows if r.component == 2}
    lam1 = next(r.eigenvalue for r in rows if r.component == 1)
    lam2 = next(r.eigenvalue for r in rows if r.component == 2)
    n1 = sum(x * x for x in v1.values()) ** 0.5
    n2 = sum(x * x for x in v2.values()) ** 0.5
    assert abs(n1 - 1.0) < 1e-6 and abs(n2 - 1.0) < 1e-6
    assert lam1 >= lam2 - 1e-8


def test_pca_components_orthogonal_on_separated_spectrum(spark):
    """Power iteration converges at rate (λ2/λ1)^rounds, so the
    orthogonality/accuracy contract is only tight when the spectrum is
    separated — pin it on a synthetic corpus with variances ~16:4:1 in
    three axes: v1 ≈ e0, v2 ≈ e1, v1·v2 ≈ 0, λ1 > λ2."""
    import math

    rows = []
    for t in range(200):
        a = 4.0 * math.sin(t * 1.7)  # axis 0: dominant variance
        b = 2.0 * math.sin(t * 2.3 + 1.0)  # axis 1: second
        c = 1.0 * math.sin(t * 3.1 + 2.0)  # axis 2: smallest
        rows.append((t, [a, b, c, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pca_top_components(emb, max_dim=4, n_components=2, n_rounds=3).collect()
    v1 = {r.i: r.loading for r in out if r.component == 1}
    v2 = {r.i: r.loading for r in out if r.component == 2}
    lam1 = next(r.eigenvalue for r in out if r.component == 1)
    lam2 = next(r.eigenvalue for r in out if r.component == 2)
    assert abs(v1[0]) > 0.95 and abs(v2[1]) > 0.95
    assert abs(sum(v1[i] * v2[i] for i in v1)) < 0.05
    assert lam1 > lam2 > 0


def test_streaming_kmv_store_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Bottom-k over the union of per-batch bottom-k partitions must
    equal the one-shot kmv_distinct sketch: run the store twice (replay
    must be a no-op), compare all three numbers."""
    from yamr_spark.operators.text import kmv_distinct
    from yamr_spark.streaming.events import stream_events
    from yamr_spark.streaming.kmv import read_kmv_store, stream_kmv_to_store

    store = os.path.join(str(tmp_path), "store")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    for _ in range(2):  # restart against committed checkpoint: no-op
        stream_kmv_to_store(
            stream_events(spark, sf_dir), "user_id", store, ckpt, k=32
        )
    served = read_kmv_store(spark, store, k=32).collect()[0]
    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    batch = kmv_distinct(ev, "user_id", k=32).collect()[0]
    assert (served.n_hashes, served.kth_min, served.estimate) == (
        batch.n_hashes,
        batch.kth_min,
        batch.estimate,
    )


def test_kmv_store_partitions_bounded(spark, sf_dir, tmp_path):
    """Every batch partition holds <= k rows (TakeOrdered per batch,
    bounded state shipped to the store regardless of batch size)."""
    from yamr_spark.streaming.events import stream_events
    from yamr_spark.streaming.kmv import stream_kmv_to_store

    store = os.path.join(str(tmp_path), "store")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    stream_kmv_to_store(stream_events(spark, sf_dir), "user_id", store, ckpt, k=16)
    per_batch = (
        spark.read.parquet(store).groupBy("batch_id").count().collect()
    )
    assert per_batch and all(r["count"] <= 16 for r in per_batch)


def test_span_dup_detects_unaligned_duplicate(spark):
    """A 10-token span shared at DIFFERENT offsets is found (the chunk
    grid misses straddling duplicates); unique docs are absent; the two
    overlapping dup windows inside each doc merge into ONE span."""
    from yamr_spark.operators.curation import span_dup_stats

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [
        (1, "one two three " + shared + " x1 y1 z1"),
        (2, "p q " + shared + " r s t u v"),
        (3, "totally unrelated words only here nothing shared at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_dup_stats(docs, width=8).collect()}
    assert set(got) == {1, 2}
    for doc_id in (1, 2):
        r = got[doc_id]
        # 10 shared tokens -> three 8-token dup windows -> ONE merged
        # span of exactly 10 tokens
        assert r.n_dup_spans == 1, r
        assert r.dup_tokens == 10, r


def test_span_dup_within_doc_repeat_not_flagged(spark):
    """Duplication is CROSS-document (>=2 distinct docs): a doc that
    repeats its own phrase twice but shares nothing is absent."""
    from yamr_spark.operators.curation import span_dup_stats

    phrase = "m n o p q r s t"
    rows = [
        (1, phrase + " filler " + phrase),
        (2, "different text with no overlap whatsoever in this doc here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert span_dup_stats(docs, width=8).collect() == []


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    """THE invariant: both endpoints of every near-dup pair get the
    same split. Checked over the real banded pair table."""
    from yamr_spark.operators.curation import leakage_safe_split_assign
    from yamr_spark.queries_dedup import _near_dup_pairs_shared

    docs = table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_shared(spark, sf_dir)
    assign = leakage_safe_split_assign(docs, pairs)
    leaked = (
        pairs.join(
            assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaked == 0
    # and the pairs actually exercise the invariant (non-empty graph)
    assert pairs.count() > 0


def test_heavy_hitters_equals_brute_force(spark):
    """Candidate/recheck == brute-force counts+filter on a skewed
    synthetic corpus (one term above N/k, tail below)."""
    from yamr_spark.operators.text import heavy_hitters_exact

    rows = [(i, "hot " * 30 + f"cold{i} " * 2) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    got = {r.term: r.cnt for r in heavy_hitters_exact(docs, k=20).collect()}
    # N = 50*32 = 1600; threshold N/20 = 80; 'hot'=1500 passes, each
    # cold term = 2 fails
    assert got == {"hot": 1500}


def test_bloom_semi_join_exact_under_collisions(spark):
    """m=2 forces heavy bucket collisions; the recheck must still give
    exactly the plain semi-join result."""
    from yamr_spark.operators.relational import bloom_prefiltered_semi_join

    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    build = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "bk long")
    got = sorted(
        r.k for r in bloom_prefiltered_semi_join(probe, build, "k", "bk", m=2).collect()
    )
    assert got == list(range(0, 100, 7))


def test_heavy_hitters_no_forced_corpus_broadcast(spark, sf_dir):
    """The candidate TERM table is corpus-derived (slices x k) and must
    never be force-broadcast (the LM-scorer rule). The two hints in the
    plan are both structurally bounded: the <= m candidate BUCKET set
    and the 1-row total — nothing data-sized carries a hint."""
    from yamr_spark.plans import forced_broadcast_hint_count
    from yamr_spark.registry import all_queries

    df = all_queries()["heavy_hitter_terms"](spark, sf_dir)
    assert forced_broadcast_hint_count(df) == 2


def test_bloom_semi_join_hints_only_bounded_bucket_set(spark, sf_dir):
    """Exactly one forced hint: the <= m-row bucket set (structurally
    bounded by the constant m, never by data). The recheck semi-join is
    unhinted. The BUILDING filter reaches the customer scan."""
    from yamr_spark.plans import forced_broadcast_hint_count, pushed_filters
    from yamr_spark.registry import all_queries

    df = all_queries()["bloom_semi_join_orders"](spark, sf_dir)
    assert forced_broadcast_hint_count(df) == 1
    assert "c_mktsegment" in pushed_filters(df)


def test_span_dup_no_forced_hints_partial_agg(spark, sf_dir):
    """Every table in span_dup_stats is corpus-sized: zero forced
    broadcast hints; the doc-frequency aggregate must partial-aggregate
    map-side (8-byte hash keys, not window text, cross the wire)."""
    from yamr_spark.operators.curation import span_dup_stats
    from yamr_spark.plans import forced_broadcast_hint_count, has_partial_aggregate

    df = span_dup_stats(table(spark, sf_dir, "documents"))
    assert forced_broadcast_hint_count(df) == 0
    assert has_partial_aggregate(df)


def test_weighted_per_group_consistent_with_global(spark, sf_dir):
    """Per-group A-ES uses the same priorities as the global sampler:
    restricting the global ranking to one group and cutting at k must
    equal the per-group winners for that group."""
    from yamr_spark.operators.curation import (
        weighted_sample,
        weighted_sample_per_group,
    )

    docs = table(spark, sf_dir, "documents")
    per = weighted_sample_per_group(
        docs, group_col="lang", id_col="doc_id", weight_col="n_chars", k=5
    ).collect()
    langs = {r.lang for r in per}
    assert per and all(
        sum(1 for r in per if r.lang == lang) <= 5 for lang in langs
    )
    for lang in list(langs)[:2]:
        glob = weighted_sample(
            docs.where(F.col("lang") == lang),
            id_col="doc_id", weight_col="n_chars", k=5,
        ).collect()
        want = sorted((r.doc_id, r.sample_key) for r in glob)
        got = sorted(
            (r.doc_id, r.sample_key) for r in per if r.lang == lang
        )
        assert got == want, lang


def test_llm_prep_v4_budget_and_monotonicity(spark, sf_dir):
    """v4's packing report respects the budget per lang, and removing
    the high-span-dup docs + non-train splits can only shrink each
    lang's totals vs the plain pack over the full corpus."""
    from yamr_spark.operators.curation import token_budget_pack
    from yamr_spark.registry import all_queries

    v4 = {r.lang: r for r in
          all_queries()["llm_prep_pipeline_v4"](spark, sf_dir).collect()}
    full = {r.lang: r for r in
            token_budget_pack(table(spark, sf_dir, "documents"), 2000).collect()}
    assert v4
    for lang, r in v4.items():
        assert r.tokens_selected <= 2000
        assert r.docs_selected <= r.docs_total
        assert r.docs_total <= full[lang].docs_total
        assert r.tokens_total <= full[lang].tokens_total
