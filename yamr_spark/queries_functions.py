"""Scalar-function and SQL-surface coverage (SURVEY.md §2.3 + §2.4 gaps).

The reference's entire scalar library is nine functions inside two job
scripts (F1–F9); this module covers the function families a real engine
user reaches for — date/time, string, conditional/null handling, math,
and the Spark SQL entry point itself — each oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.registry import register
from yamr_spark.tables import table


@register(
    "orders_per_month",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def q_orders_per_month(spark, sf_dir):
    """Date functions: date_trunc month rollup of orders."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month"))
        .agg(
            F.count("*").alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@register(
    "part_name_search",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           CAST(substr(p_name, 1, 5) AS VARCHAR) AS name_prefix
    FROM part
    WHERE p_name LIKE '%el%' AND p_retailprice BETWEEN 100 AND 1500
    """,
)
def q_part_name_search(spark, sf_dir):
    """String functions + LIKE predicate + BETWEEN (F2/F3 generalized)."""
    p = table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_name").like("%el%") & F.col("p_retailprice").between(100, 1500))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
        )
    )


@register(
    "order_value_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_order_value_buckets(spark, sf_dir):
    """Conditional logic: CASE WHEN bucketing + two-key aggregate."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket"), "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )


@register(
    "math_price_features",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           CAST(abs(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           round(pow(1 + l_tax, 2), 6) AS tax_sq
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q_math_price_features(spark, sf_dir):
    """Math functions (ln/sqrt/abs/pow), rounded to the driver's 6dp
    comparison grid so cross-engine libm differences can't bite."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
    )


@register(
    "sql_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_sql_revenue_by_segment(spark, sf_dir):
    """The Spark SQL entry point itself: temp views + spark.sql — the
    same Catalyst plan as the DataFrame form, proving the SQL surface."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(DISTINCT o_custkey) AS customers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


@register(
    "null_handling_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS total,
           CAST(COUNT(props) AS BIGINT) AS with_props,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
           coalesce(MIN(props), '<none>') AS min_props
    FROM events
    GROUP BY event_type
    """,
)
def q_null_handling(spark, sf_dir):
    """Null semantics: COUNT(col) vs COUNT(*), conditional counting,
    coalesce fallback."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.count("props").alias("with_props"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
        F.coalesce(F.min("props"), F.lit("<none>")).alias("min_props"),
    )


@register(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 10
    GROUP BY event_type
    """,
)
def q_json_props_stats(spark, sf_dir):
    """F6 generalized to semi-structured columns: parse the JSON props
    payload with an explicit schema (from_json, not schema inference —
    at 100 TB inference means an extra full pass), filter on the parsed
    field (pushes past the parse via Catalyst's JSON pruning), aggregate."""
    from pyspark.sql import types as T

    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k",
        F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))["k"],
    )
    return (
        parsed.where(F.col("k") > 10)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.count("*").alias("cnt"),
        )
    )


@register(
    "pii_scrub_stats",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(length(props)
                    - length(regexp_replace(props, '[0-9]', '', 'g')))
                AS BIGINT) AS total_digits,
           ROUND(AVG(length(regexp_replace(props, '[0-9]+', '<NUM>', 'g'))), 6)
             AS avg_redacted_len
    FROM events GROUP BY event_type
    """,
)
def q_pii_scrub_stats(spark, sf_dir):
    """PII-style scrubbing shape: redact digit runs in the props payload
    (regexp_replace is the pattern slot — production swaps in email/
    phone/SSN patterns) and report per-type digit mass + redacted
    lengths. Pure codegen'd string expressions, one tiny rollup shuffle;
    the scrub itself never leaves the scan stage. The DuckDB oracle
    replays the same regexes (with its explicit 'g' flag — Spark's
    regexp_replace is global by default)."""
    ev = table(spark, sf_dir, "events")
    digits = F.length("props") - F.length(F.regexp_replace("props", "[0-9]", ""))
    redacted_len = F.length(F.regexp_replace("props", "[0-9]+", "<NUM>"))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(digits).cast("long").alias("total_digits"),
        F.round(F.avg(redacted_len), 6).alias("avg_redacted_len"),
    )


@register(
    "date_features",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INTEGER) AS days_since_epoch_start
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def q_date_features(spark, sf_dir):
    """Date/time function surface in one pass: year/quarter/month/
    dayofyear, ISO week + ISO day-of-week, month-end, day arithmetic —
    the fields whose semantics agree exactly across engines (Spark's
    1=Sunday dayofweek is deliberately avoided for the ISO form both
    engines define identically). Map-side only; the date filter is
    pushed to the scan."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "2001-01-01")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.quarter(d).cast("int").alias("qtr"),
        F.month(d).cast("int").alias("mon"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("int").alias("iso_dow"),
        F.last_day(d).cast("string").alias("month_end"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS n_with_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS k_sum
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_props_stats(spark, sf_dir):
    """Semi-structured payloads through Spark 4's VARIANT type:
    parse_json once into a binary variant, variant_get typed paths out
    — the open-schema path that replaces per-query JSON re-parsing
    (the variant parse happens once per row; every extraction after
    that is a binary path walk, which is the 100 TB argument vs
    get_json_object re-parsing text per field). NULL props and missing
    keys degrade to NULL, matching SQL JSON semantics on both
    engines."""
    ev = table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json(F.col("props"))
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.expr("variant_get(v, '$.k', 'int')")).alias("n_with_k"),
        F.sum(F.expr("variant_get(v, '$.k', 'int')")).cast("bigint").alias("k_sum"),
    )


@register(
    "string_features",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           trim(p_name) AS tr,
           lpad(p_brand, 12, '*') AS padded,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           reverse(p_name) AS rev,
           replace(p_name, ' ', '_') AS snake,
           CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos
    FROM part
    WHERE p_partkey < 200
    """,
)
def q_string_features(spark, sf_dir):
    """String-function surface in one projection: case mapping, trim,
    padding, token extraction (split_part), regex capture, reverse,
    replace, and 1-based substring position — the fields whose
    semantics align exactly across engines. Map-side only; the partkey
    range pushes to the scan."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.trim("p_name").alias("tr"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.reverse("p_name").alias("rev"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.instr("p_name", "a").cast("int").alias("a_pos"),
    )


@register(
    "try_function_features",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 10) = 0 THEN NULL
                ELSE ROUND(o_totalprice / (o_orderkey % 10), 6) END AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def q_try_function_features(spark, sf_dir):
    """Error-safe expression surface: try_divide (NULL on zero divisor
    instead of ANSI failure) and try_cast on non-numeric /
    prefix-numeric strings — the functions that keep a 100 TB job from
    dying on one malformed row. The oracle spells the same semantics
    with CASE/TRY_CAST."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 10), 6
        ).alias("safe_div"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
    )
