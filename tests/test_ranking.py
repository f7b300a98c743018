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
