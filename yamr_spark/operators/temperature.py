"""Max-per-year — the reference's second shipped job, Spark-first.

Reference: /root/reference/map_libs/max_year_temp.py — Mapper JSON-parses
``[[yyyymm, temp], ...]``, emits ``(year, temp)`` with
``year = int(str(yyyymm)[:4])``; Reducer emits ``(year, max(temps))``.

Two front-ends for the same aggregate:

- ``max_temp_per_year_yyyymm`` — exact reference shape, (yyyymm, temp) rows.
- ``max_value_per_year_ts``    — the driver's events table (ts timestamp,
  value double), the natural analogue per FIXTURES.md §4.

Both are partial-agg'd hash aggregates: at scale the shuffle carries one
row per (input-partition, year).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yamr_spark.functions import year_of_yyyymm


def max_temp_per_year_yyyymm(
    df: DataFrame, yyyymm_col: str = "yyyymm", temp_col: str = "temp"
) -> DataFrame:
    """(yyyymm int, temp double) → (year long, max_temp double)."""
    return (
        df.select(year_of_yyyymm(yyyymm_col).alias("year"), F.col(temp_col))
        .groupBy("year")
        .agg(F.max(temp_col).alias("max_temp"))
    )


def max_value_per_year_ts(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """(ts timestamp, value double) → (year long, max_value double)."""
    return (
        df.select(F.year(ts_col).cast("long").alias("year"), F.col(value_col))
        .groupBy("year")
        .agg(F.max(value_col).alias("max_value"))
    )


def parse_temperature_json(spark, json_str: str) -> DataFrame:
    """S9/F6: materialize the reference's JSON-array-of-pairs format
    (map_libs/temperature.json — ``[[201501, 31.2], ...]``) as a typed
    DataFrame. Used by unit tests to replay the reference's golden input.
    """
    schema = T.ArrayType(T.ArrayType(T.StringType()))
    raw = spark.createDataFrame([(json_str,)], ["j"])
    return raw.select(
        F.explode(F.from_json("j", schema)).alias("pair")
    ).select(
        F.col("pair")[0].cast("int").alias("yyyymm"),
        F.col("pair")[1].cast("double").alias("temp"),
    )
