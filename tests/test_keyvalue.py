"""Partitioner/grouping invariants mirroring /root/reference/tests/
test_partition.py and test_reducers.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yamr_spark.operators.keyvalue import (
    combine_per_key,
    kv,
    max_per_key,
    partition_and_sort,
    partition_id,
    sum_per_key,
)

KV_ROWS = [("nlll", 1), ("moscow", 1), ("innopolis", 1), ("kazan", 1), ("nlll", 2)]


@pytest.fixture()
def kv_df(spark):
    return spark.createDataFrame(KV_ROWS, ["key", "value"])


def test_sum_per_key(spark):
    # test_reducers.py:18-23: [('a',1)x3,('cc',1),('dd',1)x2,('zz',1)x2]
    rows = [("a", 1)] * 3 + [("cc", 1)] + [("dd", 1)] * 2 + [("zz", 1)] * 2
    df = spark.createDataFrame(rows, ["key", "value"])
    assert dict(sum_per_key(df).collect()) == {"a": 3, "cc": 1, "dd": 2, "zz": 2}


def test_max_per_key(spark):
    # test_base_mappers.py:52-58: [(2015,31.2),(2015,41),(2016,11)]
    df = spark.createDataFrame([(2015, 31.2), (2015, 41.0), (2016, 11.0)], ["key", "value"])
    assert dict(max_per_key(df).collect()) == {2015: 41.0, 2016: 11.0}


def test_combine_per_key(spark):
    # test_reducers.py:7-10: values grouped under key, deterministic order
    rows = [("a", 1), ("a", 1), ("a", 1), ("cc", 1), ("dd", 1), ("dd", 2)]
    df = spark.createDataFrame(rows, ["key", "value"])
    got = {r.key: r.values for r in combine_per_key(df).collect()}
    assert got == {"a": [1, 1, 1], "cc": [1], "dd": [1, 2]}


@pytest.mark.parametrize("n", [1, 2, 3])
def test_partition_invariants(kv_df, n):
    # test_partition.py:12-41 invariants: every key → exactly one region,
    # regions within [0, n), equal keys co-locate.
    got = partition_id(kv_df, n).collect()
    assert all(0 <= r.region < n for r in got)
    per_key = {}
    for r in got:
        per_key.setdefault(r.key, set()).add(r.region)
    assert all(len(v) == 1 for v in per_key.values())


def test_partition_and_sort_layout(kv_df):
    # C2+C3: rows with equal keys co-locate and each partition is key-sorted
    parted = partition_and_sort(kv_df, 3)
    per_part = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.collect_list("key").alias("keys"))
        .collect()
    )
    seen = {}
    for row in per_part:
        assert row.keys == sorted(row.keys)
        for k in set(row.keys):
            assert seen.setdefault(k, row.pid) == row.pid
    assert parted.rdd.getNumPartitions() == 3


def test_kv_projection(spark, sf_dir):
    from yamr_spark.tables import table
    li = table(spark, sf_dir, "lineitem")
    df = kv(li, "l_returnflag", "l_quantity")
    assert df.columns == ["key", "value"]
    assert set(sum_per_key(df).toPandas()["key"]) <= {"A", "N", "R"}
