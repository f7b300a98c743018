"""exact_global_rank: the distributed rank must equal the naive
single-partition global window bit-for-bit — under every materialize
mode, on real data and on adversarial tie-heavy fixtures — and the
rank-based quartile bucketing built on it must split ties
deterministically by doc_id (VERDICT r09 #1 golden)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from yamr_spark.materialize import set_mode
from yamr_spark.operators.ranking import exact_global_rank


def _naive(df, order_cols):
    w = Window.orderBy(*order_cols)
    return df.withColumn("rnk", F.row_number().over(w).cast("long"))


def _as_sorted(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("mode", ["local", "disk", "parquet"])
def test_exact_global_rank_matches_naive_window(spark, sf_dir, mode):
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    set_mode(mode)
    try:
        got = _as_sorted(exact_global_rank(docs, ["n_chars", "doc_id"]))
    finally:
        set_mode(None)
    want = _as_sorted(_naive(docs, ["n_chars", "doc_id"]))
    assert got == want


def test_exact_global_rank_tie_heavy_and_skewed(spark):
    # every value duplicated many times; one value holds half the rows —
    # range boundaries MUST fall inside tie runs and inside the hot key
    rows = [(i, i % 3 if i % 2 else 7) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = _as_sorted(exact_global_rank(df, ["v", "id"], n_parts=13))
    want = _as_sorted(_naive(df, ["v", "id"]))
    assert got == want


def test_exact_global_rank_small_and_empty(spark):
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    assert _as_sorted(exact_global_rank(df, ["v", "id"])) == [(1, 10, 1)]
    empty = spark.createDataFrame([], "id long, v long")
    assert exact_global_rank(empty, ["v", "id"]).count() == 0


def test_quality_stratified_tie_golden(spark):
    """8 docs, two distinct texts → 4-way lm_score ties straddling every
    quartile boundary. Rank buckets must split ties by doc_id into
    exact n/4 groups — the deterministic behavior the rank-based form
    guarantees and the old value-edge form could not."""
    from yamr_spark.operators.curation import quality_stratified_sample

    rows = [(i, "aa aa aa" if i < 4 else "bb cc dd") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bucket: r for r in quality_stratified_sample(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert [out[b].n_docs for b in (1, 2, 3, 4)] == [2, 2, 2, 2]
    assert [out[b].rate_pct for b in (1, 2, 3, 4)] == [5, 15, 40, 80]
    # ties split by doc_id: buckets 1-2 hold the aa docs (higher-prob
    # tokens score higher? no — pinned empirically below), and the two
    # buckets sharing a text have IDENTICAL integer-micros means
    assert out[1].mean_lm == out[2].mean_lm
    assert out[3].mean_lm == out[4].mean_lm
    assert out[1].mean_lm < out[3].mean_lm


def test_percentile_approx_exact_regime_rank_formula(spark):
    """quality_stratified_sample_approx's oracle replays
    percentile_approx as the order statistic at 1-based rank ceil(p·n);
    pin that contract directly against Spark across sizes that exercise
    every ceil/floor disagreement (n ≡ 0..3 mod 4)."""
    import math
    import random

    from pyspark.sql import functions as F

    random.seed(11)
    for n in (7, 8, 9, 10, 101, 250):
        vals = [round(random.uniform(-20.0, -5.0), 6) for _ in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(
            F.percentile_approx(
                "v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(100000)
            ).alias("e")
        ).collect()[0].e
        s = sorted(vals)
        want = [s[math.ceil(p * n) - 1] for p in (0.25, 0.5, 0.75)]
        assert got == want, (n, got, want)


def test_quality_stratified_approx_report(spark, sf_dir):
    """The approx twin covers the corpus, keeps the rate ladder, and in
    the sketch's exact regime its edges equal the exact order
    statistics (value-edge semantics: ties bunch into lower buckets)."""
    from yamr_spark.operators.curation import quality_stratified_sample_approx
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    rows = {r.bucket: r for r in quality_stratified_sample_approx(docs).collect()}
    assert sum(r.n_docs for r in rows.values()) == docs.count()
    for b, r in rows.items():
        assert r.rate_pct == (5, 15, 40, 80)[b - 1]
        assert 0 <= r.n_sampled <= r.n_docs
    means = [rows[b].mean_lm for b in sorted(rows)]
    assert means == sorted(means)
