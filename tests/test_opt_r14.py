"""Round-14 optimization regression tests.

Pins the two plan transformations this round introduced so a later
change can't silently undo them:

- batch 1a: ``spread_scan`` gives a single-row-group scan the session's
  default parallelism before map-heavy work (and is a no-op when the
  scan already has enough splits);
- batch 1b/2: multi-consumer subtrees are materialized once, so the
  plans that used to replay a TF-IDF pass (sparse cosine) or a
  join+distinct (basket lift) per consumer now reference a truncated
  lineage. The Exchange counts asserted here were 62 / 38 before the
  barriers — bounds are generous so AQE/planner drift doesn't flake.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.plans import shuffle_count
from yamr_spark.registry import all_queries
from yamr_spark.tables import spread_scan, table


def test_spread_scan_reaches_default_parallelism(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    spread = spread_scan(docs)
    assert (
        spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_spread_scan_noop_when_scan_has_enough_splits(spark, sf_dir):
    """The check is file-metadata-based (ceil(Σ(size+openCost) /
    maxPartitionBytes) vs defaultParallelism) — with a tiny split size
    the same file estimates as many splits and the helper must return
    the frame untouched."""
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        assert spread_scan(docs) is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_spread_scan_noop_on_materialized_frame(spark, sf_dir):
    """A non-scan root (no input files) keeps its upstream
    partitioning."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    lc = docs.localCheckpoint(eager=False)
    assert spread_scan(lc) is lc


def test_spread_scan_preserves_rows(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    a = sorted(r.doc_id for r in docs.collect())
    b = sorted(r.doc_id for r in spread_scan(docs).collect())
    assert a == b


def test_word_count_keeps_single_shuffle(spark, sf_dir):
    """The round-14 A/B removed the root spread from tokenize→aggregate
    DAGs (measured 0.40 s → 1.22 s WITH the spread at sf0.1): word_count
    must stay scan → explode → partial agg → ONE exchange."""
    df = all_queries()["word_count"](spark, sf_dir)
    assert shuffle_count(df) == 1, shuffle_count(df)


def test_sparse_cosine_materializes_vector_table(spark, sf_dir):
    """vec (a full TF-IDF pass) has three consumers and norms two; with
    the barriers the final plan replays neither — before the fix the
    physical plan carried 62 Exchanges, now the posting join + pair
    aggregate alone."""
    from yamr_spark.operators.text import sparse_cosine_pairs

    df = sparse_cosine_pairs(table(spark, sf_dir, "documents"))
    assert shuffle_count(df) <= 10, shuffle_count(df)


def test_basket_lift_materializes_item_table(spark, sf_dir):
    """items (scan + broadcast join + distinct) has four consumers; the
    barrier cuts the 19-Exchange replay plan to the self-join +
    aggregate over the materialized table (measured 10 after)."""
    df = all_queries()["basket_type_lift"](spark, sf_dir)
    assert shuffle_count(df) <= 12, shuffle_count(df)


def test_tfidf_materializes_tf(spark, sf_dir):
    """tf feeds both the df aggregate and the scored join — one
    tokenize+tf pass, so at most the df agg, window, and join exchanges
    remain (14 Exchanges before)."""
    from yamr_spark.operators.text import tfidf_top_terms

    df = tfidf_top_terms(table(spark, sf_dir, "documents"))
    assert shuffle_count(df) <= 6, shuffle_count(df)


def test_sparse_cosine_values_unchanged(spark, sf_dir):
    """The barriers are pure plan surgery — spot-pin the values against
    a hand-checked invariant: cosine similarities are in [threshold, 1]
    and pairs are distinct."""
    from yamr_spark.operators.text import sparse_cosine_pairs

    rows = sparse_cosine_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5
    ).collect()
    seen = set()
    for r in rows:
        assert 0.5 <= r.cosine <= 1.0 + 1e-9
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))
