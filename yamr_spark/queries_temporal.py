"""Temporal-join and skew-mitigation queries (operators/temporal.py,
operators/skew.py) over the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.operators.skew import salted_sum
from yamr_spark.operators.temporal import asof_join, range_join_bucketed
from yamr_spark.registry import register
from yamr_spark.tables import table


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events")


@register(
    "asof_click_purchase",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts_asof, p.value AS purchase_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_click_purchase(spark, sf_dir):
    """As-of join: every click annotated with the user's latest purchase
    at-or-before the click (union + single window pass, one shuffle)."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("value").alias("purchase_value"), F.col("ts").alias("purchase_ts"))
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_ts", "purchase_value"],
    )


@register(
    "range_click_near_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.click_id, c.ts AS ts_r
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id AS click_id, user_id, ts FROM events
          WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch(c.ts) >= epoch(p.ts) - 3600
     AND epoch(c.ts) <= epoch(p.ts)
    """,
)
def q_range_click_near_purchase(spark, sf_dir):
    """Range join: (purchase, click) pairs where the click happened in the
    hour before the purchase — bucketed equi-join, not a theta join."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return range_join_bucketed(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_s=-3600, upper_s=0, bucket_s=3600,
    )


@register(
    "salted_value_sum",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY event_type
    """,
)
def q_salted_value_sum(spark, sf_dir):
    """Two-phase salted aggregation — result identical to a plain
    groupBy sum (the oracle), plan spreads each key over 16 salts."""
    return salted_sum(_events(spark, sf_dir), key="event_type", value="value", buckets=16)


@register(
    "salted_dim_join",
    oracle="""
    SELECT e.event_type,
           CAST(length(e.event_type) AS INTEGER) AS type_len,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
    FROM events e
    GROUP BY e.event_type
    """,
)
def q_salted_dim_join(spark, sf_dir):
    """Manually salted skew join under the content hash: events carry
    only 5 distinct event_type keys (maximal key skew — every key is
    hot), the dim side replicates across 16 salts, the fact side salts
    deterministically per row, and the joined rollup must equal the
    plain join the oracle computes. This is the pre-AQE skew lever;
    tests/test_plans.py pins the AQE runtime path separately."""
    from yamr_spark.operators.skew import salted_join

    events = _events(spark, sf_dir).select("event_type", "value")
    dim = (
        _events(spark, sf_dir)
        .select("event_type")
        .distinct()
        .withColumn("type_len", F.length("event_type").cast("int"))
    )
    return (
        salted_join(events, dim, on=["event_type"], buckets=16)
        .groupBy("event_type", "type_len")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("value_sum"),
        )
    )


@register(
    "ewma_user_value",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           ROUND(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
    FROM ordered
    """,
)
def q_ewma_user_value(spark, sf_dir):
    """Per-user event-time EWMA (alpha=0.3) — the sequential fold SQL
    windows can't express, as a JVM aggregate() over the per-user list;
    the oracle replays the identical recurrence with list_reduce, and
    the applyInPandas twin is test-pinned equal."""
    from yamr_spark.operators.temporal import ewma_user_value

    return ewma_user_value(_events(spark, sf_dir))


@register(
    "daily_resample_ffill",
    oracle="""
    WITH daily AS (
      SELECT user_id, day, value AS day_value FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT g.user_id, CAST(g.day AS VARCHAR) AS day,
           last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           d.day_value IS NULL AS gap_filled
    FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    """,
)
def q_daily_resample_ffill(spark, sf_dir):
    """Time-series regularization: resample each user's event stream to
    a DAILY grid (their min..max day) and forward-fill gaps with the
    day's last observed value — the feed-the-model-a-regular-grid pass
    every time-series pipeline runs before windowed features.

    Plan: per-(user, day) last value via max_by (partial-aggregated —
    no sort of the raw events), per-user spans via one more tiny
    aggregate, the grid generated MAP-SIDE with sequence() (no driver
    loop, no cross join with a calendar table), and one user-partitioned
    window for the forward fill. All keyed stages co-partition on
    user_id."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("day_value")
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # ISO string: Spark DateType and DuckDB DATE reach pandas as
            # different dtypes (date objects vs datetime64) — string is
            # the stable cross-engine representation for the hash
            F.col("day").cast("string").alias("day"),
            F.last("day_value", ignorenulls=True).over(w).alias("value"),
            F.col("day_value").isNull().alias("gap_filled"),
        )
    )
