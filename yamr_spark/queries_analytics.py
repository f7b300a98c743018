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


@register(
    "approx_aggregates",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_within_5pct,
           TRUE AS p50_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_aggregates(spark, sf_dir):
    """Sketch aggregates: HLL distinct + KLL-style quantile. The sketch
    VALUES are engine-specific by construction, so the oracle-checkable
    contract is the ERROR BAND (VERDICT r05 #6): the query computes both
    sketch and exact in one aggregation pass and returns booleans
    |approx−exact|/exact ≤ rtol; the oracle derives the same booleans
    from exact aggregates, where they are identically TRUE — so a sketch
    drifting out of its advertised band turns the row red. Exact
    n_events/exact_users ride along as value-checked columns. (At scale
    you keep ONLY the sketch side — the exact twin here is the
    certification harness, not the production plan.)"""
    agg = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
            F.percentile_approx("value", 0.5, 10000).alias("ap50"),
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("percentile(value, 0.5)").alias("ep50"),
        )
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("au") - F.col("exact_users"))
            / F.greatest(F.col("exact_users"), F.lit(1))
            <= 0.05
        ).alias("users_within_5pct"),
        (
            F.abs(F.col("ap50") - F.col("ep50"))
            / F.greatest(F.abs(F.col("ep50")), F.lit(1e-9))
            <= 0.05
        ).alias("p50_within_5pct"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTH_VALUE(c_custkey, 2) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS runner_up
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_rank_family(spark, sf_dir):
    """The remaining rank-family window functions in one pass: ntile,
    percent_rank, cume_dist over the default ordered frame, nth_value
    over the full partition frame (explicit UNBOUNDED FOLLOWING — the
    default frame would freeze nth_value at the current row). One
    window partitioning serves all four, so the plan is a single
    shuffle+sort on c_nationkey; (acctbal desc, custkey) is a total
    order, making percent_rank/cume_dist exact same-formula doubles on
    both engines."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_custkey", 2).over(wfull).alias("runner_up"),
    )


@register(
    "kmv_distinct_orders",
    oracle="""
    WITH hashes AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM lineitem
    ),
    bottom AS (SELECT h FROM hashes ORDER BY h LIMIT 256)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
           MAX(h) AS kth_min,
           ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                 ELSE 255.0 / (CAST(MAX(h) AS DOUBLE) / 1152921504606846976.0)
                 END, 4) AS estimate
    FROM bottom
    """,
)
def q_kmv_distinct_orders(spark, sf_dir):
    """Deterministic approximate COUNT DISTINCT: the KMV bottom-k sketch
    over l_orderkey. hash60 placement is md5-exact on both engines, so
    — unlike HLL — the approximate answer itself is content-hash
    checkable. TakeOrdered bottom-k, no global sort."""
    from yamr_spark.operators.text import kmv_distinct

    return kmv_distinct(table(spark, sf_dir, "lineitem"), "l_orderkey", k=256)


@register(
    "kmv_distinct_users_per_type",
    oracle="""
    WITH hashes AS (
      SELECT DISTINCT event_type AS grp,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    bottom AS (
      SELECT grp, h FROM (
        SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashes
      ) WHERE rn <= 64
    )
    SELECT grp AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hashes,
           ROUND(CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                 ELSE 63.0 / (CAST(MAX(h) AS DOUBLE) / 1152921504606846976.0)
                 END, 4) AS estimate
    FROM bottom GROUP BY grp
    """,
)
def q_kmv_distinct_users_per_type(spark, sf_dir):
    """GROUP BY approximate distinct: per-event-type user cardinality
    from per-group bottom-64 KMV sketches — the per-key form that
    completes the sketch family (global / set-ops / grouped), with the
    same deterministic md5 arithmetic under the exact content hash.
    Groups whose sketch never filled report the EXACT count."""
    from yamr_spark.operators.text import kmv_distinct_per_group

    return kmv_distinct_per_group(
        table(spark, sf_dir, "events"), "event_type", "user_id", k=64
    )


@register(
    "stats_moments",
    oracle="""
    SELECT event_type,
           ROUND(stddev_samp(value), 6) AS sd,
           ROUND(var_samp(value), 6) AS vr,
           ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS cv,
           ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS cr,
           ROUND(median(value), 6) AS md
    FROM events
    GROUP BY event_type
    """,
)
def q_stats_moments(spark, sf_dir):
    """Second-moment aggregate surface: sample stddev/variance,
    covariance, Pearson correlation, exact median — the subset whose
    definitions agree bit-for-bit (at 6 dp) across engines (skewness/
    kurtosis are deliberately excluded: Spark computes population
    moments, DuckDB bias-corrected sample moments). One
    partial-aggregated shuffle; median is the exact interpolating
    percentile both engines define identically."""
    ev = table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("vr"),
        F.round(F.covar_samp("value", u), 6).alias("cv"),
        F.round(F.corr("value", u), 6).alias("cr"),
        F.round(F.median("value"), 6).alias("md"),
    )


@register(
    "funnel_stages",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_order,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM s
    UNION ALL
    SELECT 'click_after_signup', CAST(2 AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'purchase_after_click', CAST(3 AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM p
    """,
)
def q_funnel_stages(spark, sf_dir):
    """Ordered-event funnel (signup -> first later click -> first later
    purchase): the classic product-analytics sequence query. Each stage
    is one filtered aggregate joined to the previous stage's first-hit
    time — three partial-aggregated shuffles on user_id, no window over
    the full event stream and no per-user event sort, so stage cost
    stays O(events of that type). At 100 TB the three stage aggregates
    share the user_id hash partitioning (co-located joins)."""
    from yamr_spark.materialize import materialize as _mat

    ev = table(spark, sf_dir, "events")
    # each stage frame has TWO consumers (the next stage's join and its
    # own count leg) — barrier them so each filtered event scan +
    # aggregate runs once, not once per consumer (guide §2.4; the
    # unbarriered plan scanned events 6×, barriered 3×)
    s = _mat(
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = _mat(
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df, name, order):
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(order).cast("long").alias("stage_order"),
            F.count("*").alias("n_users"),
        )

    return (
        stage(s, "signup", 1)
        .unionAll(stage(c, "click_after_signup", 2))
        .unionAll(stage(p, "purchase_after_click", 3))
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', f.cohort_week, a.activity_week) / 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen ISO week,
    counted per activity-week offset. Two aggregates (first-seen, the
    distinct user-week activity set) and one user_id-co-partitioned
    join — the distinct collapses the event stream to user x week
    BEFORE the join, so the join input is bounded by users x weeks,
    not by raw events, which is what survives 100 TB of events."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("activity_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            # ISO string, not DATE: the driver hashes rendered values,
            # and DATE renders engine-dependently
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "table_profile",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_v,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_orderkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE)
    FROM orders
    """,
)
def q_table_profile(spark, sf_dir):
    """Column profiling (the data-quality report every ingestion run
    emits): row/non-null/distinct counts and min/max per profiled
    column, one row per column. ONE aggregation pass computes every
    column's stats simultaneously (count/count(col)/count-distinct/
    min/max are all partial-aggregable) — then a literal unpivot; no
    per-column scans. At 100 TB swap count-distinct for
    approx_count_distinct and keep the single-pass shape."""
    o = table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nonnull, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col, n_rows, n_nonnull, n_distinct, min_v, max_v)"
    )


@register(
    "constraint_check_report",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) FROM
                 (SELECT o_orderkey FROM orders GROUP BY o_orderkey
                  HAVING COUNT(*) > 1)) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    """,
)
def q_constraint_check_report(spark, sf_dir):
    """Declarative data-quality constraints (the dbt-tests / Deequ
    shape): primary-key uniqueness, two referential-integrity checks
    (anti-joins — broadcast when the parent's keys fit, shuffle
    otherwise), and a range rule — one violation count per named
    check. Each check is its own aggregate; Spark runs the four small
    DAGs in one job via the union."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check_name"), F.col("n").alias("n_violations")
        )

    pk_dupes = (
        o.groupBy("o_orderkey")
        .count()
        .where(F.col("count") > 1)
        .agg(F.count("*").alias("n"))
    )
    fk_cust = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(F.count("*").alias("n"))
    )
    fk_order = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
            F.count("*").alias("n")
        )
    )
    qty_range = li.where(
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    ).agg(F.count("*").alias("n"))
    return (
        one("orders_pk_unique", pk_dupes)
        .unionAll(one("orders_custkey_fk", fk_cust))
        .unionAll(one("lineitem_orderkey_fk", fk_order))
        .unionAll(one("lineitem_qty_range", qty_range))
    )


@register(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, bin
    """,
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram per event type (bin = floor(value/25)) —
    one partial-aggregated shuffle; the distribution report behind
    threshold tuning."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 25.0).cast("long").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "incremental_agg_refresh",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS value_sum
    FROM events
    GROUP BY event_type
    """,
)
def q_incremental_agg_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: the standing aggregate
    state (count, decimal value-sum) built from yesterday's partition
    (even event_ids) is REFRESHED by merging the delta partition's
    state (odd event_ids) — state merge is the same associative
    aggregate, so the refreshed view must hash-equal the full
    recompute the oracle runs. Decimal sums make the merge independent
    of partition order; at 100 TB this is the pattern that turns a
    daily full-corpus rollup into a delta-sized job."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round("value", 6).cast("decimal(18,6)").alias("v6"),
    )

    def state(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("cnt"), F.sum("v6").alias("vsum")
        )

    base = state(ev.where(F.col("event_id") % 2 == 0))
    delta = state(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("n_events"), F.sum("vsum").alias("vs"))
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("vs").cast("double"), 6).alias("value_sum"),
    )


@register(
    "top_event_paths",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT 10
    """,
)
def q_top_event_paths(spark, sf_dir):
    """User-journey analysis: each user's first-3 event-type path
    (event-time order, event_id tiebreak), ranked by user count — the
    onboarding-funnel shape product analytics asks first.

    Plan: one user_id window shuffle (per-user frames), ordered path
    assembly via array_sort(collect_list(struct(rn, type))) — NOT bare
    collect_list, whose order is partition-dependent — then a partial-
    aggregated path count and a TakeOrdered top-10 (per-partition heaps,
    no global sort). Total order (n_users desc, path) makes the cut
    deterministic."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )
    per_user = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        per_user.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(10)
    )


@register(
    "event_zscore_anomalies",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             AVG(value) OVER tw AS m,
             STDDEV_SAMP(value) OVER tw AS s,
             COUNT(*) OVER tw AS c
      FROM events
      WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value, ROUND((value - m) / s, 6) AS z
    FROM w
    WHERE c >= 5 AND s > 0 AND abs(ROUND((value - m) / s, 6)) > 3.0
    """,
)
def q_event_zscore_anomalies(spark, sf_dir):
    """Streaming-shaped anomaly detection on a batch surface: each
    event scored against its user's TRAILING 10-event mean/std (the
    current row excluded — no self-leakage), flagged at |z| > 3 with a
    5-event warm-up. One user_id window shuffle serves all three frame
    aggregates; the rounded z enters the threshold compare so the
    boundary decision is identical in both engines."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    tw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(tw).alias("m"),
        F.stddev_samp("value").over(tw).alias("s"),
        F.count("*").over(tw).alias("c"),
    )
    # try_divide, not a bare /: the s > 0 conjunct below does NOT
    # guarantee evaluation order under Catalyst, so an all-constant
    # trailing window (s = 0) could still hit the division under ANSI
    z = F.round(F.try_divide(F.col("value") - F.col("m"), F.col("s")), 6)
    return (
        scored.where((F.col("c") >= 5) & (F.col("s") > 0) & (F.abs(z) > 3.0))
        .select("event_id", "user_id", "value", z.alias("z"))
    )


@register(
    "recency_weighted_user_score",
    oracle="""
    WITH tmax AS (SELECT MAX(ts) AS tmax FROM events)
    SELECT user_id,
           ROUND(CAST(SUM(CAST(ROUND(
             value / (1 + date_diff('day', CAST(ts AS DATE),
                                    CAST(tmax AS DATE))), 9)
             AS DECIMAL(28,9))) AS DOUBLE), 6) AS recency_score,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events CROSS JOIN tmax
    GROUP BY user_id
    """,
)
def q_recency_weighted_user_score(spark, sf_dir):
    """Harmonic recency-decay engagement score per user — division
    instead of exp() so the decay is IEEE-identical across engines;
    9dp-rounded terms summed through decimal for order independence."""
    from yamr_spark.operators.text import recency_weighted_user_score

    return recency_weighted_user_score(table(spark, sf_dir, "events"))


@register(
    "equidepth_histogram",
    oracle="""
    WITH e AS (
      SELECT list_transform(
               quantile_cont(value, [0.125, 0.25, 0.375, 0.5,
                                     0.625, 0.75, 0.875]),
               x -> round(x, 6)) AS e
      FROM events
    ),
    binned AS (
      SELECT value,
             1 + len(list_filter(e, x -> value > x)) AS bin
      FROM events CROSS JOIN e
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MIN(value), 6) AS vmin,
           ROUND(MAX(value), 6) AS vmax
    FROM binned GROUP BY bin
    """,
)
def q_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (8 bins of ~equal population) — the
    selectivity-estimation statistic. Bin edges come from ONE exact
    interpolated-percentile aggregate broadcast back over the stream
    (same-count-per-bin via a global NTILE would be a single-partition
    total sort — the anti-pattern); assignment compares against
    6dp-rounded edges so the boundary decision is identical in both
    engines."""
    ev = table(spark, sf_dir, "events")
    edges = ev.agg(
        F.expr(
            "transform(percentile(value, array(0.125D, 0.25D, 0.375D, 0.5D,"
            " 0.625D, 0.75D, 0.875D)), x -> round(x, 6))"
        ).alias("e")
    )
    binned = ev.crossJoin(F.broadcast(edges)).select(
        "value",
        (
            F.lit(1)
            + F.expr(
                "aggregate(e, 0, (acc, x) ->"
                " acc + CASE WHEN value > x THEN 1 ELSE 0 END)"
            )
        ).alias("bin"),
    )
    return binned.groupBy(F.col("bin").cast("long").alias("bin")).agg(
        F.count("*").alias("n_events"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


_KMV_H = "('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "kmv_set_ops_customers",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT {_KMV_H} AS h FROM orders
      WHERE o_orderdate < DATE '1995-01-01'
    ),
    hb AS (
      SELECT DISTINCT {_KMV_H} AS h FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
    ),
    sa AS (SELECT COUNT(*) AS n, MAX(h) AS kth
           FROM (SELECT h FROM ha ORDER BY h LIMIT 256) t),
    sb AS (SELECT COUNT(*) AS n, MAX(h) AS kth
           FROM (SELECT h FROM hb ORDER BY h LIMIT 256) t),
    su AS (SELECT COUNT(*) AS n, MAX(h) AS kth
           FROM (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) u
                 ORDER BY h LIMIT 256) t),
    e AS (
      SELECT
        CASE WHEN sa.n < 256 THEN CAST(sa.n AS DOUBLE)
             ELSE 255.0 / (CAST(sa.kth AS DOUBLE) / 1152921504606846976.0)
        END AS ea,
        CASE WHEN sb.n < 256 THEN CAST(sb.n AS DOUBLE)
             ELSE 255.0 / (CAST(sb.kth AS DOUBLE) / 1152921504606846976.0)
        END AS eb,
        CASE WHEN su.n < 256 THEN CAST(su.n AS DOUBLE)
             ELSE 255.0 / (CAST(su.kth AS DOUBLE) / 1152921504606846976.0)
        END AS eu
      FROM sa, sb, su
    )
    SELECT ROUND(ea, 4) AS est_a, ROUND(eb, 4) AS est_b,
           ROUND(eu, 4) AS est_union,
           ROUND(greatest(ea + eb - eu, 0.0), 4) AS est_intersection,
           ROUND(greatest(ea + eb - eu, 0.0) / eu, 4) AS jaccard_est
    FROM e
    """,
)
def q_kmv_set_ops(spark, sf_dir):
    """Mergeable-sketch set algebra: distinct customers ordering before
    vs since 1995 — cardinalities, union, inclusion-exclusion
    intersection, and Jaccard, all from bottom-256 KMV sketches whose
    md5 arithmetic both engines replay exactly."""
    from yamr_spark.operators.text import kmv_set_ops

    orders = table(spark, sf_dir, "orders")
    return kmv_set_ops(
        orders.where(F.col("o_orderdate") < "1995-01-01"),
        orders.where(F.col("o_orderdate") >= "1995-01-01"),
        "o_custkey",
    )


@register(
    "kmv_estimate_error",
    oracle=f"""
    WITH hashes AS (SELECT DISTINCT {_KMV_H} AS h FROM orders),
    bottom AS (SELECT h FROM hashes ORDER BY h LIMIT 256),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes, MAX(h) AS kth_min,
             ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE 255.0 / (CAST(MAX(h) AS DOUBLE) / 1152921504606846976.0)
                   END, 4) AS estimate
      FROM bottom
    ),
    x AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
          FROM orders)
    SELECT x.exact_distinct, s.n_hashes, s.kth_min, s.estimate,
           ROUND(abs(s.estimate - x.exact_distinct) / x.exact_distinct, 6)
             AS rel_err
    FROM s CROSS JOIN x
    """,
)
def q_kmv_estimate_error(spark, sf_dir):
    """KMV calibration: the k=256 sketch's distinct-customer estimate
    next to the EXACT distinct count, with relative error — the KMV
    entry in the estimator-certification panel (theory: std error
    ~ 1/sqrt(k) ≈ 6%). Exact side is one partial-aggregated distinct;
    sketch side the usual TakeOrdered bottom-k; both 1-row frames
    cross-broadcast."""
    from yamr_spark.operators.text import kmv_distinct

    orders = table(spark, sf_dir, "orders")
    sk = kmv_distinct(orders, "o_custkey")
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return sk.join(F.broadcast(exact)).select(
        "exact_distinct",
        "n_hashes",
        "kth_min",
        "estimate",
        F.round(
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


@register(
    "key_skew_report",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
             SUM(cnt) AS total, AVG(cnt) AS avg_cnt
      FROM counts
    )
    SELECT key, cnt,
           ROUND(cnt * 1.0 / total, 6) AS share,
           CAST(n_keys AS BIGINT) AS n_keys,
           ROUND(max_cnt / avg_cnt, 6) AS skew_ratio
    FROM (SELECT * FROM counts ORDER BY cnt DESC, key LIMIT 5) top
    CROSS JOIN stats
    """,
)
def q_key_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostics — the report you read BEFORE
    choosing salting/AQE mitigations (SCALE.md round-5: a hot key
    behind one mapper block is unsplittable; know your keys first).
    Top-5 heaviest keys via TakeOrdered (per-partition heaps), global
    stats from the same partial-aggregated count table broadcast back;
    skew_ratio = max/avg key frequency."""
    counts = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").alias("cnt"))
    )
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("total"),
        F.avg("cnt").alias("avg_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), "key").limit(5)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.round(F.col("max_cnt") / F.col("avg_cnt"), 6).alias("skew_ratio"),
    )


@register(
    "mad_outlier_report",
    oracle="""
    WITH med AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med,
             ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           m.med, m.mad,
           CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type, m.med, m.mad
    """,
)
def q_mad_outlier_report(spark, sf_dir):
    """Robust outlier detection: median + MAD (median absolute
    deviation, the estimator a heavy-tailed value column needs — mean/
    stddev are themselves dragged by the outliers they're meant to
    find). Events beyond 3·1.4826·MAD (the normal-consistent scale)
    are counted per type. Two grouped exact-percentile aggregates, the
    per-group scalars broadcast back over the stream — never a global
    sort; boundary compares run on 6dp-rounded med/mad so both engines
    make identical decisions."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type", "med").agg(
        F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    )
    j2 = ev.join(F.broadcast(mad), "event_type")
    return j2.groupBy("event_type", "med", "mad").agg(
        F.count("*").alias("n_events"),
        F.sum(
            (
                F.abs(F.col("value") - F.col("med"))
                > 3 * 1.4826 * F.col("mad")
            ).cast("long")
        ).alias("n_outliers"),
    ).select("event_type", "n_events", "med", "mad", "n_outliers")


@register(
    "revenue_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month), 6) AS mom_growth
    FROM monthly
    """,
)
def q_revenue_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth — the reporting staple. The
    global-ordered LAG window runs over the MONTHLY aggregate (≤ a few
    hundred rows at any horizon), never the fact table: one partial-
    aggregated shuffle builds the month table, the single-partition
    window is month-cardinality-bounded by construction. Decimal sums
    make each month's revenue order-independent; growth is the same
    two-op double formula on identical inputs in both engines."""
    from pyspark.sql import Window

    monthly = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(
            (F.col("revenue") - F.lag("revenue").over(w))
            / F.lag("revenue").over(w),
            6,
        ).alias("mom_growth"),
    )


@register(
    "basket_type_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS okey,
             split_part(p.p_type, ' ', 1) AS cat
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
    freq AS (SELECT cat, COUNT(*) AS cnt FROM items GROUP BY cat),
    pairs AS (
      SELECT a.cat AS cat_a, b.cat AS cat_b, COUNT(*) AS pair_cnt
      FROM items a JOIN items b ON a.okey = b.okey AND a.cat < b.cat
      GROUP BY a.cat, b.cat
    )
    SELECT cat_a, cat_b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
           ROUND(pair_cnt * 1.0 * n_orders / (fa.cnt * fb.cnt), 6) AS lift
    FROM pairs
    JOIN freq fa ON fa.cat = cat_a
    JOIN freq fb ON fb.cat = cat_b
    CROSS JOIN n
    WHERE pair_cnt >= 5
    """,
)
def q_basket_type_lift(spark, sf_dir):
    """Market-basket association over part-type categories: lift =
    P(a,b) / (P(a)·P(b)) for category pairs co-ordered ≥5 times. The
    item table is (order, category)-distinct BEFORE the self-join, so
    a 100-lineitem order contributes each pair once; the self-join
    keys on orderkey (co-partitioned — cost Σ|basket|², bounded by
    basket width, never corpus²); category frequencies are a
    broadcast-tiny table joined back. items has FOUR consumers (n,
    freq, both self-join sides) — materialized so the scan + broadcast
    join + distinct runs once; it is (order, category)-distinct, far
    smaller than lineitem."""
    from yamr_spark.materialize import materialize

    items = materialize(
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(
                table(spark, sf_dir, "part").select(
                    "p_partkey",
                    F.substring_index("p_type", " ", 1).alias("cat"),
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("okey"), "cat")
        .distinct()
    )
    n = items.select(F.countDistinct("okey").alias("n_orders"))
    freq = items.groupBy("cat").agg(F.count("*").alias("cnt"))
    pairs = (
        items.alias("a")
        .join(
            items.alias("b"),
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.cat") < F.col("b.cat")),
        )
        .groupBy(F.col("a.cat").alias("cat_a"), F.col("b.cat").alias("cat_b"))
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 5)
    )
    fa = freq.select(F.col("cat").alias("cat_a"), F.col("cnt").alias("fa"))
    fb = freq.select(F.col("cat").alias("cat_b"), F.col("cnt").alias("fb"))
    return (
        pairs.join(F.broadcast(fa), "cat_a")
        .join(F.broadcast(fb), "cat_b")
        .crossJoin(F.broadcast(n))
        .select(
            "cat_a",
            "cat_b",
            "pair_cnt",
            F.round(
                F.col("pair_cnt") * F.col("n_orders") / (F.col("fa") * F.col("fb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "quality_drift_psi",
    oracle="""
    WITH q AS (
      SELECT doc_id,
             CAST(length(text) // 40 AS BIGINT) AS bin,
             doc_id % 2 = 0 AS is_ref
      FROM documents
    ),
    binned AS (
      SELECT LEAST(bin, 7) AS bin,
             SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_cnt,
             SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_cnt
      FROM q GROUP BY LEAST(bin, 7)
    ),
    tot AS (
      SELECT SUM(ref_cnt) AS ref_n, SUM(cur_cnt) AS cur_n FROM binned
    ),
    props AS (
      SELECT bin,
             ROUND(greatest(ref_cnt * 1.0 / greatest(ref_n, 1), 0.0005), 6) AS p,
             ROUND(greatest(cur_cnt * 1.0 / greatest(cur_n, 1), 0.0005), 6) AS c
      FROM binned CROSS JOIN tot
    )
    SELECT bin, p AS ref_prop, c AS cur_prop,
           ROUND((c - p) * ln(c / p), 6) AS psi_term
    FROM props
    """,
)
def q_quality_drift_psi(spark, sf_dir):
    """Distribution-drift monitoring: per-bin PSI terms (population
    stability index) between a reference and current corpus slice
    (deterministic doc_id parity split; bins = clamped length//40).
    The production read: Σ psi_term > 0.2 means the distribution
    moved and downstream thresholds need re-tuning. Proportions are
    floored (0.0005) and 6dp-rounded BEFORE the ln() so the boundary
    arithmetic is identical in both engines; one partial-aggregated
    bin shuffle, totals broadcast back."""
    q = table(spark, sf_dir, "documents").select(
        F.least(
            (F.length("text") / F.lit(40)).cast("long"), F.lit(7)
        ).alias("bin"),
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
    )
    binned = q.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("ref_cnt"),
        F.sum((~F.col("is_ref")).cast("long")).alias("cur_cnt"),
    )
    tot = binned.agg(
        F.sum("ref_cnt").alias("ref_n"), F.sum("cur_cnt").alias("cur_n")
    )
    # greatest() guards the QUOTIENT; the denominator needs its own
    # guard (an all-odd-doc_id slice has ref_n = 0 → ANSI kills the
    # bare division before greatest ever sees it). greatest(n, 1) is
    # exact parity for any nonempty side and mirrored in the oracle.
    props = binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(
            F.greatest(
                F.col("ref_cnt") / F.greatest(F.col("ref_n"), F.lit(1)),
                F.lit(0.0005),
            ),
            6,
        ).alias("p"),
        F.round(
            F.greatest(
                F.col("cur_cnt") / F.greatest(F.col("cur_n"), F.lit(1)),
                F.lit(0.0005),
            ),
            6,
        ).alias("c"),
    )
    return props.select(
        "bin",
        F.col("p").alias("ref_prop"),
        F.col("c").alias("cur_prop"),
        F.round((F.col("c") - F.col("p")) * F.log(F.col("c") / F.col("p")), 6)
        .alias("psi_term"),
    )


@register(
    "repeat_purchase_interval",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM p
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_us) / 3600000000.0, 6) AS avg_gap_hours,
           ROUND(MIN(gap_us) / 3600000000.0, 6) AS min_gap_hours
    FROM g GROUP BY user_id
    """,
)
def q_repeat_purchase_interval(spark, sf_dir):
    """Repeat-purchase cadence per user: consecutive purchase gaps via
    one user-partitioned LAG (event-time order, event_id tiebreak),
    aggregated to count/mean/min in hours — the retention-model
    feature. Gaps are exact integer microseconds, so the averages are
    sums of exact ints over a constant: engine-order-independent
    without decimal discipline."""
    from pyspark.sql import Window

    p = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ off the parquet rebuild; cast through TIMESTAMP
    # for unix_micros (session tz is UTC, so the cast is wall-clock-exact)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    g = p.select("user_id", (us - prev_us).alias("gap_us"))
    return g.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.count("gap_us").alias("n_gaps"),
        F.round(F.avg("gap_us") / 3.6e9, 6).alias("avg_gap_hours"),
        F.round(F.min("gap_us") / 3.6e9, 6).alias("min_gap_hours"),
    )


@register(
    "daily_value_median_trend",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             ROUND(quantile_cont(value, 0.5), 6) AS p50,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, p50, n_events,
           ROUND(p50 - LAG(p50) OVER (ORDER BY day), 6) AS p50_delta
    FROM d
    """,
)
def q_daily_value_median_trend(spark, sf_dir):
    """Metric-drift monitoring: exact daily median of event value with
    day-over-day delta — the dashboard query behind every 'did the
    distribution move today' alert. Grouped exact percentiles (one
    partial-aggregated day shuffle); the LAG window runs over the
    DAY-cardinality aggregate, never the event stream; day is an ISO
    string for the stable cross-engine hash."""
    from pyspark.sql import Window

    d = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("dday"))
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.count("*").alias("n_events"),
        )
    )
    w = Window.orderBy("dday")
    return d.select(
        F.col("dday").cast("string").alias("day"),
        "p50",
        "n_events",
        F.round(F.col("p50") - F.lag("p50").over(w), 6).alias("p50_delta"),
    )


@register(
    "cms_user_frequency",
    oracle="""
    WITH vals AS (
      SELECT user_id, CAST(user_id AS VARCHAR) AS k
      FROM events WHERE user_id IS NOT NULL
    ),
    depths AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(i)),
    sketch AS (
      SELECT i,
             ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || k), 1, 15))::BIGINT
               % 256 AS bucket,
             COUNT(*) AS cnt
      FROM vals CROSS JOIN depths
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT user_id, k FROM vals ORDER BY user_id LIMIT 10
    ),
    exact AS (
      SELECT v.user_id, COUNT(*) AS exact_cnt
      FROM vals v JOIN probes p USING (user_id) GROUP BY v.user_id
    ),
    est AS (
      SELECT p.user_id, MIN(s.cnt) AS cms_est
      FROM probes p CROSS JOIN depths d
      JOIN sketch s
        ON s.i = d.i
       AND s.bucket = ('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || p.k),
                                      1, 15))::BIGINT % 256
      GROUP BY p.user_id
    )
    SELECT e.user_id, e.exact_cnt, m.cms_est,
           m.cms_est >= e.exact_cnt AS never_underestimates
    FROM exact e JOIN est m USING (user_id)
    """,
)
def q_cms_user_frequency(spark, sf_dir):
    """Count-Min sketch frequency estimates for the 10 smallest user
    ids over the events stream, exact count and the sketch's
    never-underestimates invariant checked in-query — approximate
    counting under the exact content hash, completing the mergeable-
    sketch family (KMV distincts / KMV set ops / CMS frequencies)."""
    from yamr_spark.operators.text import cms_point_estimates

    return cms_point_estimates(
        table(spark, sf_dir, "events"), "user_id", n_probes=10
    ).withColumnRenamed("probe_val", "user_id")


@register(
    "global_rank_documents",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY n_chars NULLS FIRST,
                                            doc_id NULLS FIRST) AS BIGINT) AS rnk
    FROM documents
    """,
)
def q_global_rank_documents(spark, sf_dir):
    """Direct certification of the distributed exact global rank
    (operators/ranking.py, the primitive behind rank-based quartile
    bucketing): rank every document by (n_chars, doc_id) and match
    ROW_NUMBER() OVER a global ORDER BY bit-for-bit — computed WITHOUT
    a single-partition window (range partition + bounded offset collect
    + partition-parallel window; plan-test-pinned)."""
    from yamr_spark.operators.ranking import exact_global_rank
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return exact_global_rank(docs, ["n_chars", "doc_id"], rank_col="rnk")
