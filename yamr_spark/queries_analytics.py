"""Analytics coverage: pivot, GROUPING SETS, exact percentiles, and
approximate aggregates (SURVEY.md §2.4 gap fills beyond rollup/cube).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.registry import register
from yamr_spark.tables import table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_user_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
               for t in EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_user_event_counts(spark, sf_dir):
    """Pivot: one column per event type, counts per user. The explicit
    value list keeps the plan a single pass (no distinct-scan to discover
    columns) and matches the oracle's conditional-aggregation rewrite."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


@register(
    "grouping_sets_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets_pricing(spark, sf_dir):
    """Explicit GROUPING SETS (finer control than rollup/cube) via the
    SQL surface — one shuffle, the expand operator replays each row per
    set."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS cnt
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def q_value_percentiles(spark, sf_dir):
    """EXACT interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). The exact form needs the full value set
    per group; percentile_approx (below) is the sketch that scales."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
    )


@register("approx_aggregates")
def q_approx_aggregates(spark, sf_dir):
    """Sketch aggregates: HLL distinct + KLL-style quantile. Rows-only in
    the gate (approximation is engine-specific by construction); the unit
    test asserts error bounds against the exact answers instead."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        )
    )
