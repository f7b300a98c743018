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
