"""Analytics operators: approx-aggregate error bounds + pivot golden."""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.registry import all_queries
from yamr_spark.tables import table


def test_approx_aggregates_error_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r
        for r in all_queries()["approx_aggregates"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap["approx_users"] - ex["users"]) <= max(1, 0.1 * ex["users"])
        spread = abs(ex["p50"]) + 1e-9
        assert abs(ap["approx_p50"] - ex["p50"]) <= 0.05 * spread + 0.05


def test_pivot_counts_sum_to_total(spark, sf_dir):
    piv = all_queries()["pivot_user_event_counts"](spark, sf_dir)
    total = (
        piv.select(
            sum(F.col(c) for c in piv.columns if c != "user_id").alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert total == table(spark, sf_dir, "events").count()


def test_scd2_invariants(spark, sf_dir):
    """SCD2 output invariants: every key has exactly one current row;
    changed keys carry exactly one closed version whose valid_to equals
    the new version's valid_from; unchanged keys keep one row."""
    from yamr_spark.registry import all_queries

    rows = all_queries()["scd2_customer_history"](spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    n_changed = 0
    for key, versions in by_key.items():
        current = [v for v in versions if v.is_current]
        assert len(current) == 1, key
        if len(versions) == 2:
            n_changed += 1
            closed = next(v for v in versions if not v.is_current)
            assert closed.valid_to == current[0].valid_from
        else:
            assert len(versions) == 1
    assert n_changed > 0  # the update batch really changed keys


def test_export_manifest_covers_corpus_exactly(spark, sf_dir):
    """Shards partition the corpus: doc counts sum to the corpus size
    and a single doc's relocation/corruption would change its shard's
    checksum (checksums are exact integer sums)."""
    from yamr_spark.registry import all_queries
    from yamr_spark.tables import table

    out = all_queries()["export_manifest"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    assert len({r.shard for r in out}) == len(out)
    assert all(int(r.checksum) > 0 for r in out)
