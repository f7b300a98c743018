"""Relational query registrations (SURVEY.md §7.4) with DuckDB oracles.

Money sums go through DECIMAL(18,2) on BOTH engines, then cast to double:
exact, aggregation-order-independent, and schema-aligned for the driver's
value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.operators import relational as R
from yamr_spark.registry import register
from yamr_spark.tables import table


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           AVG(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    return R.pricing_summary(table(spark, sf_dir, "lineitem"))


@register(
    "revenue_per_nation",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_revenue_per_nation(spark, sf_dir):
    return R.revenue_per_nation(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    return R.shipping_priority(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
    )


@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_top_orders(spark, sf_dir):
    return R.top_orders(table(spark, sf_dir, "orders"))


@register(
    "rank_customers_in_nation",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) t WHERE rnk <= 3
    """,
)
def q_rank_customers_in_nation(spark, sf_dir):
    return R.rank_customers_in_nation(table(spark, sf_dir, "customer"))


@register(
    "moving_stats_per_user",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS moving_sum,
           COALESCE(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    0.0) AS prev_value
    FROM events
    """,
)
def q_moving_stats_per_user(spark, sf_dir):
    return R.moving_stats_per_user(table(spark, sf_dir, "events"))


@register(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_pricing(spark, sf_dir):
    return R.rollup_pricing(table(spark, sf_dir, "lineitem"))


@register(
    "cube_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_pricing(spark, sf_dir):
    return R.cube_pricing(table(spark, sf_dir, "lineitem"))


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_customers_with_orders(spark, sf_dir):
    return R.customers_with_orders(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_customers_without_orders(spark, sf_dir):
    return R.customers_without_orders(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "active_custkeys_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def q_active_custkeys_intersect(spark, sf_dir):
    return R.active_custkeys_intersect(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_parts_per_flag(spark, sf_dir):
    return R.distinct_parts_per_flag(table(spark, sf_dir, "lineitem"))


@register(
    "orders_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE)
      FROM orders
    )
    """,
)
def q_orders_above_avg(spark, sf_dir):
    return R.orders_above_avg(table(spark, sf_dir, "orders"))


@register(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_cnt
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_counts(spark, sf_dir):
    return R.order_priority_counts(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )


@register(
    "dedup_lineitem_rows",
    oracle="""
    SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem
    """,
)
def q_dedup_lineitem_rows(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    return R.dedupe_rows(li)


@register(
    "forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: highly selective filter + single global sum — the
    pushdown showcase (all three predicates reach the parquet scan; the
    aggregate is a map-side partial into one row)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue_delta")
        )
    )


@register(
    "returned_revenue_by_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS return_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def q_returned_revenue_by_customer(spark, sf_dir):
    """TPC-H Q10 shape: fact-fact join (lineitem⋈orders, shuffle on
    orderkey) + broadcast dims (customer at this SF, nation always)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("return_lines"),
        )
    )


@register(
    "range_frame_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_30d
    FROM orders
    """,
)
def q_range_frame_revenue(spark, sf_dir):
    """RANGE window frame (value-based, not row-based): per customer, the
    trailing-30-day revenue at each order. Unlike rowsBetween, equal and
    near timestamps are included by VALUE distance — the frame semantics
    streaming-style trailing metrics need."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("revenue_30d"),
    )


@register(
    "supplier_nation_volume",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS suppliers,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_supplier_nation_volume(spark, sf_dir):
    """Supply-side volume per nation (completes table coverage: every
    star-schema table now feeds at least one oracle-checked query).
    supplier and nation are broadcast dims; lineitem streams once."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("suppliers"),
            F.count("*").alias("line_cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
        )
    )


@register(
    "inactive_custkeys_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def q_inactive_custkeys_except(spark, sf_dir):
    return R.inactive_custkeys_except(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "click_purchase_full",
    oracle="""
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.clicks, 0) AS clicks,
           COALESCE(p.purchases, 0) AS purchases
    FROM (SELECT user_id, COUNT(*) AS clicks FROM events
          WHERE event_type = 'click' GROUP BY user_id) c
    FULL JOIN (SELECT user_id, COUNT(*) AS purchases FROM events
               WHERE event_type = 'purchase' GROUP BY user_id) p
      ON c.user_id = p.user_id
    """,
)
def q_click_purchase_full(spark, sf_dir):
    return R.click_purchase_full(table(spark, sf_dir, "events"))


@register(
    "order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           DATE_DIFF('day', o_orderdate,
                     LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey))
               AS gap_days
    FROM orders
    """,
)
def q_order_gap_days(spark, sf_dir):
    return R.order_gap_days(table(spark, sf_dir, "orders"))


@register(
    "nation_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): 6-table join — ONE fact-fact
    shuffle (lineitem⋈orders on orderkey); supplier/customer join
    broadcast at this SF (AQE decides from size stats — at 100 TB
    customer goes shuffle and the plan is otherwise unchanged); the two
    nation dims broadcast always. The nation-pair disjunction sits above
    the joins; the shipdate range pushes to the parquet scan."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): 8-table join with nation
    joined TWICE (customer-side for the region gate, supplier-side for
    the share split). part/supplier/nation/region all broadcast; the
    only shuffles are lineitem⋈orders and the final year rollup. The
    share is a conditional-sum ratio — one pass, no self-join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "nation_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def q_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit, sans partsupp — the fixture
    has no supplycost): 5-table join, part filtered by LIKE before its
    broadcast, supplier+nation broadcast, one lineitem⋈orders shuffle,
    then the (nation, year) rollup."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("profit")
        )
    )


@register(
    "cust_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey,
             COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q_cust_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left join +
    double aggregation. Scale plan: pre-aggregate orders per custkey FIRST
    (partial agg → one shuffle of (custkey, count)), then left-join
    customer against the far-smaller count table and coalesce misses to 0
    — the raw customer⋈orders row explosion never happens. The second
    (histogram) agg groups on a tiny domain, partial-agg collapses it
    map-side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): max-of-aggregate scalar subquery.
    Scale plan: one partial-aggregated shuffle builds per-supplier revenue;
    the scalar max is a 1-row aggregate broadcast back over the same
    (cached) revenue table — no window over a single global partition, no
    second lineitem scan. Ties (multiple suppliers at the max) are kept,
    matching the SQL. Revenue goes through DECIMAL so the double compared
    for equality is bit-identical on both engines."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    from yamr_spark.materialize import materialize

    rev = materialize(rev)
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == mx.mx).select(
        "l_suppkey", "total_revenue"
    )
    return s.join(F.broadcast(top), s.s_suppkey == F.col("l_suppkey")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "small_qty_part_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q_small_qty_part_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity revenue): correlated scalar
    subquery per part, decorrelated by hand. Scale plan: broadcast the
    brand-filtered part keys to narrow lineitem FIRST (the correlated
    subquery only matters for rows that survive the brand gate, and the
    per-part average over the narrowed set equals the correlated average
    because the narrowing is exactly 'partkey ∈ brand parts'); the
    per-part qty caps are then a small aggregate broadcast back. One
    shuffle total, on the narrowed stream. l_quantity is integer-valued
    so AVG is exact in double on both engines."""
    li = table(spark, sf_dir, "lineitem")
    pb = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li_b = li.join(F.broadcast(pb), li.l_partkey == pb.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    from yamr_spark.materialize import materialize

    li_b = materialize(li_b)
    caps = li_b.groupBy(F.col("l_partkey").alias("cap_key")).agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("qty_cap")
    )
    return (
        li_b.join(F.broadcast(caps), li_b.l_partkey == caps.cap_key)
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    ) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): IN-subquery with
    GROUP BY + HAVING, decorrelated to an aggregate-then-join. Scale
    plan: the per-order quantity rollup partial-aggregates map-side
    before its one shuffle; the >300 HAVING gate cuts it to a sliver
    (0.1% of orders), which then broadcast-joins into orders and the
    result broadcast-joins into customer — the big tables are never
    shuffled. l_quantity is integer-valued so the double sum crossing
    the HAVING boundary is exact on both engines."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


@register(
    "rich_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q_rich_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape (wealthy-but-inactive customers): global-average
    scalar subquery + NOT EXISTS anti-join. Scale plan: the average gate
    is rewritten multiplicatively (acctbal·cnt > total) so the boundary
    compares exact decimals, not an order-dependent double average; the
    1-row (total, cnt) aggregate cross-broadcasts over customer; the
    NOT EXISTS becomes a left_anti join against the urgent-order custkey
    stream (distinct-collapsed map-side by the anti-join's own shuffle).
    customer is scanned twice (once for the scalar, once for the stream)
    — both scans prune to 2-3 columns."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pos = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("total"),
        F.count("*").alias("cnt"),
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.join(F.broadcast(pos))
        .where(F.col("c_acctbal").cast("decimal(18,2)") * F.col("cnt") > F.col("total"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "scd2_customer_history",
    oracle="""
    WITH upd AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 3
                  THEN 'SEG' || CAST(c_custkey % 4 AS VARCHAR)
                  ELSE c_mktsegment END AS new_seg
      FROM customer WHERE c_custkey % 10 IN (3, 7)
    ),
    j AS (
      SELECT c.c_custkey, c.c_mktsegment, u.new_seg
      FROM customer c LEFT JOIN upd u USING (c_custkey)
    )
    SELECT c_custkey, c_mktsegment, '1992-01-01' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
    FROM j WHERE new_seg IS NULL OR new_seg = c_mktsegment
    UNION ALL
    SELECT c_custkey, c_mktsegment, '1992-01-01', '1998-08-01', FALSE
    FROM j WHERE new_seg IS NOT NULL AND new_seg != c_mktsegment
    UNION ALL
    SELECT c_custkey, new_seg, '1998-08-01', CAST(NULL AS VARCHAR), TRUE
    FROM j WHERE new_seg IS NOT NULL AND new_seg != c_mktsegment
    UNION ALL
    SELECT c_custkey + 1000000, 'SEGNEW', '1998-08-01',
           CAST(NULL AS VARCHAR), TRUE
    FROM customer WHERE c_custkey % 100 = 5
    """,
)
def q_scd2_customer_history(spark, sf_dir):
    """Slowly-changing-dimension type 2 merge: a deterministic updates
    batch (every custkey%10==3 changes segment, %10==7 is a no-op
    update, and every custkey%100==5 spawns a NEW key at +1000000 —
    the insert branch real dimension feeds always contain) merges into
    the customer dimension — changed keys close their old version and
    open a current one, no-op updates and untouched keys pass through,
    new keys open as current inserts. One full-outer co-partitioned
    join, four disjoint projections, no windows (operators/
    relational.py: scd2_history)."""
    from yamr_spark.operators.relational import scd2_history

    cust = table(spark, sf_dir, "customer")
    updates = cust.where((F.col("c_custkey") % 10).isin(3, 7)).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 10 == 3,
            F.concat(F.lit("SEG"), (F.col("c_custkey") % 4).cast("string")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    inserts = cust.where(F.col("c_custkey") % 100 == 5).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("SEGNEW").alias("c_mktsegment"),
    )
    updates = updates.unionAll(inserts)
    return scd2_history(
        cust,
        updates,
        key="c_custkey",
        attrs=["c_mktsegment"],
        base_ts="1992-01-01",
        update_ts="1998-08-01",
    )


@register(
    "incremental_join_view_refresh",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_incremental_join_view_refresh(spark, sf_dir):
    """Incremental maintenance of a JOIN view — the delta algebra
    d(A⋈B) = dA⋈B ∪ A⋈dB ∪ dA⋈dB, merged into the standing aggregate
    by associative decimal sums. The fixture partitions orders
    (orderkey%10==7 is the delta batch) and customer (custkey%100==5 is
    the delta batch); the ORACLE computes the full declarative join over
    A∪dA and B∪dB, so the gate proves the incremental algebra
    reproduces the one-shot answer exactly — which is the whole
    contract of incremental view maintenance.

    Scale: each delta term joins a DELTA-sized side against a standing
    side (broadcast when the delta is small); the merge is a
    view-sized aggregate, so refresh cost is O(delta ⋈ standing), never
    a recompute of A⋈B."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    a = orders.where(F.col("o_orderkey") % 10 != 7)
    da = orders.where(F.col("o_orderkey") % 10 == 7)
    b = cust.where(F.col("c_custkey") % 100 != 5)
    db = cust.where(F.col("c_custkey") % 100 == 5)

    def view_agg(o, c):
        return (
            o.select("o_custkey", "o_totalprice")
            .join(c.select("c_custkey", "c_mktsegment"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            )
        )

    v_old = view_agg(a, b)
    deltas = (
        view_agg(da, b)
        .unionByName(view_agg(a, db))
        .unionByName(view_agg(da, db))
    )
    return (
        v_old.unionByName(deltas)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@register(
    "pareto_skyline_parts",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q_pareto_skyline_parts(spark, sf_dir):
    """Skyline / Pareto frontier of parts (cheapest AND biggest): no
    other part is at-most-as-expensive and at-least-as-big with one
    strict. Two-phase distributed skyline — band-max pruning broadcast
    back, in-band windows — vs the oracle's declarative NOT EXISTS."""
    from yamr_spark.operators.relational import skyline_2d

    return skyline_2d(
        table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size"),
        minimize="p_retailprice",
        maximize="p_size",
        keys=["p_partkey"],
    )


@register(
    "supplier_ship_latency",
    oracle="""
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(AVG(date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE))), 6) AS avg_ship_days,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE))) AS BIGINT) AS max_ship_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_suppkey
    """,
)
def q_supplier_ship_latency(spark, sf_dir):
    """Supplier fulfillment latency: order-to-ship days per supplier —
    the operational SLA rollup. One fact-fact join shuffled on the
    orderkey (AQE skew-split applies), day differences are exact
    integers so the average needs no decimal discipline; the supplier
    aggregate is partial-aggregated."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    gap = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.avg(gap), 6).alias("avg_ship_days"),
            F.max(gap).cast("long").alias("max_ship_days"),
        )
    )


@register(
    "bloom_semi_join_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    """,
)
def q_bloom_semi_join_orders(spark, sf_dir):
    """orders ⋉ BUILDING-segment customers through the explicit
    broadcast-bloom prefilter: the build side collapses to its <= m
    hash-bucket set, broadcasts, and drops non-matching probe rows
    map-side BEFORE the semi-join shuffle; the recheck semi-join kills
    bucket collisions, so the result is exactly the plain semi-join the
    oracle runs. Pins the probe-side runtime-filter plan shape Spark's
    own bloom injection produces only when statistics cooperate."""
    from yamr_spark.operators.relational import bloom_prefiltered_semi_join

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    qualified = bloom_prefiltered_semi_join(
        orders, cust, "o_custkey", "c_custkey", m=4096
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        R.money_sum("o_totalprice", "revenue"),
    )
