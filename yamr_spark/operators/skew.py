"""Skew-mitigation operators: salted two-phase aggregation and salted
broadcast-side join.

At 100 TB a hot key (one event_type carrying half the events, one
document template duplicated millions of times) turns a single shuffle
partition into the straggler that defines job latency. Two standing
mitigations, usable when AQE's runtime skew handling isn't available
(e.g. pre-3.0 clusters) or when the skew is in an aggregation (AQE's
skewJoin only rebalances joins):

- ``salted_agg``: groupBy(key, salt) partial-aggregate → groupBy(key)
  final. The hot key's rows spread over ``buckets`` partitions; the
  second aggregation touches only ``buckets`` rows per key.
- ``salted_join``: explode the SMALL side across all salt values, salt
  the big side's rows — each hot-key partition shrinks by ``buckets``×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets): hash of the whole row.
    Deterministic so retried tasks re-produce the same salt (a random
    salt breaks exactly-once semantics under task retry)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_sum(
    df: DataFrame, key: str, value: str, buckets: int = 16, out: str = "value_sum"
) -> DataFrame:
    """Two-phase SUM per key. Values pass through decimal(18,3) so the
    result is independent of aggregation order (hash-comparable)."""
    dec = F.col(value).cast("decimal(18,3)")
    partial = (
        df.withColumn("__salt", _salt(df, buckets))
        .groupBy(key, "__salt")
        .agg(F.sum(dec).alias("__psum"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("__psum").cast("double").alias(out))
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: list[str], buckets: int = 16
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``buckets``× — the manual form of AQE's skew-join split,
    usable when the small side is broadcast-sized but the big side's key
    distribution is too skewed for a plain shuffle join."""
    big_s = big.withColumn("__salt", _salt(big, buckets))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(F.broadcast(small_s), on=on + ["__salt"], how="inner").drop("__salt")
