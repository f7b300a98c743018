"""TPC-H tail coverage — the query shapes not (or not fully)
represented in ``queries_relational.py``: Q2, Q4, Q11, Q12, Q14, Q16,
Q19, Q20, Q21 — completing analogues for all 22 TPC-H queries across
the two modules. (Q4: ``order_priority_counts`` in the relational
module already had the EXISTS-semi-join core; ``order_priority_check``
here adds Q4's date-windowed orders scan — the pushdown dimension the
unwindowed form doesn't exercise.)

The fixture schema has no ``partsupp`` table and ``lineitem`` lacks
shipmode/commitdate/receiptdate, so the partsupp- and
shipmode-dependent queries are re-expressed over the columns that exist
while preserving the *query shape* the original exercises (correlated
min subquery, global-scalar HAVING, conditional aggregation, disjunctive
predicate pushdown, nested IN-subqueries, double-EXISTS decorrelation).
Each docstring names the shape and the 100 TB plan.

Money arithmetic goes through DECIMAL(18,2/4) on both engines before the
final double cast (exact, aggregation-order-independent — same contract
as queries_relational.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.materialize import materialize
from yamr_spark.registry import register
from yamr_spark.tables import table


def _disc_price():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH ep AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_size BETWEEN 10 AND 15 AND p_type = 'STANDARD'
    ),
    es AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN ep ON l_partkey = p_partkey
      JOIN es ON l_suppkey = s_suppkey
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(unit_cost AS DOUBLE) AS unit_cost
    FROM cost
    JOIN ep ON l_partkey = p_partkey
    JOIN es ON l_suppkey = s_suppkey
    WHERE unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                       WHERE c2.l_partkey = cost.l_partkey)
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): correlated MIN subquery
    per part over a dim-restricted fact, decorrelated. The fixture has
    no partsupp, so supply cost is the observed min unit price
    (l_extendedprice / l_quantity) per (part, supplier) from lineitem —
    same correlated-min structure, same dim chain
    (supplier→nation→region).

    Scale plan: part and the region-filtered supplier chain are both
    sub-broadcast-limit dims — lineitem is narrowed by TWO broadcast
    joins before its single shuffle (groupBy partkey,suppkey). The
    per-part min is a second, far smaller aggregate over the
    materialized cost table, broadcast back; lineitem is scanned once.
    MIN returns an actual element (not an order-dependent average), so
    the double equality join matches DuckDB bit-for-bit."""
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size").between(10, 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = table(spark, sf_dir, "lineitem")
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    cost = materialize(cost)
    per_part_min = cost.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        cost.join(
            F.broadcast(per_part_min),
            (cost.l_partkey == F.col("mk")) & (cost.unit_cost == F.col("min_cost")),
        )
        .join(F.broadcast(part), cost.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), cost.l_suppkey == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("unit_cost").cast("double").alias("unit_cost"),
        )
    )


@register(
    "important_part_value",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
               AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS value
    FROM val
    WHERE value * (SELECT COUNT(*) FROM val) > (SELECT 2 * SUM(value) FROM val)
    """,
)
def q_important_part_value(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-key value rollup kept only
    where it exceeds a fraction of the GLOBAL total — a global-scalar
    HAVING. partsupp value is re-expressed as discounted lineitem revenue
    through ASIA-region suppliers.

    Scale plan: the supplier→nation→region chain broadcast-narrows
    lineitem map-side; ONE partial-aggregated shuffle builds the
    per-part value table; the global total is a 1-row aggregate of that
    (materialized) table broadcast back as a gate. TPC-H's fixed
    fraction (0.0001/SF) is re-expressed scale-stably as "above 2x the
    mean per-part value", compared MULTIPLICATIVELY
    (value*cnt > 2*total) so the boundary is exact decimal/integer
    arithmetic on both engines and non-degenerate at every SF."""
    li = table(spark, sf_dir, "lineitem")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("value"))
    )
    val = materialize(val)
    gate = val.agg(
        (F.sum("value") * F.lit(2)).alias("total2"),
        F.count("*").alias("cnt"),
    )
    return (
        val.join(F.broadcast(gate))
        .where(F.col("value") * F.col("cnt") > F.col("total2"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value").cast("double").alias("value"),
        )
    )


@register(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_check(spark, sf_dir):
    """TPC-H Q4 proper (order priority checking): a DATE-WINDOWED fact
    filtered by EXISTS over the other fact, grouped by priority. The
    EXISTS core already exists unwindowed as ``order_priority_counts``
    (queries_relational.py); this registration adds Q4's quarter
    window — the dimension that exercises parquet date-predicate
    pushdown ahead of the semi join. The fixture lacks
    l_commitdate/receiptdate, so "a late lineitem exists" is the same
    shipdate > orderdate + 60 days proxy Q12 uses.

    Scale plan: the EXISTS becomes a LEFT SEMI hash join on orderkey
    (equi key) with the cross-table date predicate as the join filter —
    each order ships once however many late lineitems it has, no
    distinct needed; the date window prunes the orders scan first, and
    the 5-group count partial-aggregates map-side."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    windowed = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    return (
        windowed.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipmode priority split): fact-fact join with a
    cross-table date predicate and CASE-conditional aggregation. The
    fixture lacks l_shipmode/commitdate/receiptdate, so the mode becomes
    l_returnflag and "late" is shipdate > orderdate + 60 days.

    Scale plan: the join shuffles both facts on orderkey (AQE handles
    skew); the conditional SUMs partial-aggregate to 3 groups map-side,
    so the second shuffle is a few rows. The date predicate cannot be
    pushed below the join (it spans both tables) — but each side prunes
    to 3 columns, which the plan test pins."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 *
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 (promo revenue): percentage-of-total via two conditional
    sums in ONE aggregation — the classic "ratio of filtered to total"
    shape. Direct analogue: the fixture's p_type has a literal 'PROMO'
    class.

    Scale plan: shipdate range prunes lineitem at the scan (pushed
    filter); part broadcast-joins in (2 columns read); both DECIMAL sums
    ride a single map-side-combined aggregate to one row — no second
    scan, no join-then-self-join. The ratio is computed in double from
    two exact decimals, bit-identical across engines."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(zero))
                .cast("double")
                / F.sum(dp).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "supplier_attr_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_supplier_attr_counts(spark, sf_dir):
    """TPC-H Q16 shape (supplier counts per part attribute): negated dim
    predicates + NOT IN supplier exclusion + COUNT DISTINCT per
    attribute triple. partsupp is re-expressed as the observed
    (supplier, part) pairs in lineitem; the "customer complaints" LIKE
    exclusion becomes the negative-balance suppliers.

    Scale plan: the attribute-filtered part dim broadcast-narrows
    lineitem; the excluded-supplier set (a handful of keys) is a
    broadcast LEFT ANTI join — NOT IN never becomes a shuffle. COUNT
    DISTINCT rides Spark's two-phase distinct aggregate (partial
    distinct map-side on (brand,type,size,suppkey), then count) — one
    logical shuffle on a pre-shrunk stream."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "discounted_brand_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS line_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q_discounted_brand_revenue(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive predicate revenue): an OR of three
    (brand, size-range, quantity-range) conjunct groups spanning both
    join sides — the canonical disjunctive-pushdown test.

    Scale plan: Catalyst factors the part-only disjuncts
    (brand ∈ {13,20,25}, p_size ≤ 30) below the join into the part scan,
    and the lineitem-only bound (l_quantity ≤ 35 via constant folding of
    the OR) into the lineitem scan, so both scans prune BEFORE the
    broadcast join evaluates the full disjunction. One aggregate row
    out; no shuffle beyond the final 1-row agg."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return joined.where(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count("*").alias("line_cnt"),
    )


@register(
    "excess_supply_suppliers",
    oracle="""
    WITH prefix_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    supplied AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS total_qty
      FROM lineitem
      JOIN prefix_parts ON l_partkey = p_partkey
      GROUP BY l_suppkey, l_partkey
    ),
    part_tot AS (
      SELECT l_partkey AS pk, SUM(total_qty) AS part_qty,
             COUNT(*) AS n_supp
      FROM supplied GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN supplied ON s_suppkey = l_suppkey
    JOIN part_tot ON l_partkey = pk
    WHERE 2 * total_qty * n_supp > 5 * part_qty
    """,
)
def q_excess_supply_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (excess-inventory suppliers): nested IN-subqueries
    — suppliers IN (those supplying parts IN (name-prefix parts) above a
    quantity threshold) — decorrelated to aggregate→filter→semi-join.
    partsupp availability is re-expressed as total supplied quantity.

    Scale plan: the prefix-part keys broadcast-narrow lineitem before
    its one (suppkey, partkey) shuffle; Q20's correlated "half the
    availability" threshold is re-expressed as "supplied > 2.5x the
    part's mean per-supplier quantity" — the per-part (total, n_supp)
    rollup REUSES the partitioning of the first aggregate (same
    l_partkey key, no extra fact shuffle), and the compare is
    multiplicative (2*q*ns > 5*pt: exact integer-valued doubles, no
    division) so it is scale-stable and engine-exact. The surviving key
    sliver semi-joins (left_semi, broadcast) into supplier — the
    supplier table is never shuffled. nation broadcast-joins for the
    name."""
    pp = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    supplied = (
        li.join(F.broadcast(pp), li.l_partkey == pp.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    supplied = materialize(supplied)
    part_tot = supplied.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("total_qty").alias("part_qty"),
        F.count("*").alias("n_supp"),
    )
    heavy = (
        supplied.join(F.broadcast(part_tot), supplied.l_partkey == F.col("pk"))
        .where(
            F.lit(2) * F.col("total_qty") * F.col("n_supp")
            > F.lit(5) * F.col("part_qty")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_ret_supp
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l.l_orderkey, l.l_suppkey
          FROM lineitem l
          JOIN orders ON l.l_orderkey = o_orderkey AND o_orderstatus = 'F'
          JOIN per_order po ON l.l_orderkey = po.l_orderkey
          WHERE l.l_returnflag = 'R' AND po.n_supp > 1 AND po.n_ret_supp = 1) w
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS(other supplier in same order) AND NOT EXISTS(other supplier
    also late) double-correlation. The fixture lacks receipt/commit
    dates, so "late" is l_returnflag = 'R'.

    Scale plan: BOTH correlated EXISTS collapse into one per-order
    aggregate — n_supp and n_ret_supp ride a single partial-aggregated
    shuffle of lineitem (distinct-by-construction via the composite
    groupBy) — instead of two self-joins of the fact table (the naive
    plan shuffles lineitem three times; this plan, once). The blamed
    supplier per qualifying order then joins against the 'F'-status
    order keys (broadcast after the status filter) and the supplier dim.
    At 100 TB the only full-fact shuffle is the per-order aggregate."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    f_orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    blamed = (
        li.where(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(F.broadcast(f_orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.join(
            F.broadcast(table(spark, sf_dir, "supplier")),
            blamed.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
