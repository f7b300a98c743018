"""Generic (key, value) operators — the reference's only dataflow shape.

Reference record model: every datum is a 2-tuple routed by
``HashPartitioner`` (hash_partitioner.py:4-10), sorted within partition
(mapper.py:133-134), grouped by run-length scan (word_count.py:37-59) and
reduced per key (sum at word_count.py:61-63, max at max_year_temp.py:63-65).

Here each step is a named operator over an arbitrary DataFrame's
(key, value) columns. All aggregations are hash-aggregates with map-side
partial aggregation — at 100 TB the shuffle carries one partial row per
(partition, key), not the raw tuples the reference ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yamr_spark.functions import key_hash


def kv(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Project an arbitrary DataFrame to the reference's (key, value) shape."""
    return df.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))


def sum_per_key(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """C5: ``emit(key, sum(values))`` (word_count.py:61-63)."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(value_col).alias("value")
    )


def max_per_key(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """C6: ``emit(key, max(values))`` (max_year_temp.py:63-65)."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.max(value_col).alias("value")
    )


def combine_per_key(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """C4: ``combine_data`` — group all values under their key, values
    key-sorted within the group for deterministic content
    (word_count.py:37-59 sorts by key then run-length groups).

    Returns (key, values array) with the value list sorted, so the result
    is deterministic under any shuffle/partitioning — the property the
    reference gets from its map-side sort.
    """
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.sort_array(F.collect_list(value_col)).alias("values")
    )


def partition_and_sort(
    df: DataFrame, num_partitions: int, key_col: str = "key"
) -> DataFrame:
    """C2+C3: hash-partition on key into ``num_partitions`` regions, sort
    within each partition by key — the reference's exact shuffle layout
    (mapper.py:124-136: region = hash % n, then per-region key sort).

    Catalyst plans this as a single Exchange + per-partition sort (no
    global sort barrier). Region identity follows Spark's hash, not the
    reference's hexlify-int (the reference's tests assert only count/
    co-location invariants, tests/test_partition.py:12-41).
    """
    return df.repartition(num_partitions, F.col(key_col)).sortWithinPartitions(key_col)


def partition_id(df: DataFrame, num_partitions: int, key_col: str = "key") -> DataFrame:
    """Expose the region assignment as a column (for invariant tests):
    deterministic content-hash of the key mod region count, mirroring
    ``HashPartitioner.get_partition`` semantics (0-based where the
    reference is 1-based — non-semantic, SURVEY.md §7.6)."""
    return df.withColumn(
        "region", F.pmod(key_hash(key_col), F.lit(num_partitions)).cast("int")
    )
