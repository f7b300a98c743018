"""Driver-harness contract guards: the production driver canonicalizes
results via pandas (sort_values + per-column factorize), which crashes
on BinaryType output (`TypeError: unhashable type: 'bytearray'` —
CORRECTNESS_r05's multimodal ERRs). These tests pin the contract so a
future query can't reintroduce the class: every registered query's
SCHEMA must be free of binary / map / nested-binary columns (hex or
digest instead), and every oracle key must have a query."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from yamr_spark.registry import all_oracles, all_queries

_SF = "/root/testdata/sf0.001"


def _hashable(dt: T.DataType) -> bool:
    if isinstance(dt, (T.BinaryType, T.MapType)):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def test_no_registered_query_emits_binary_or_map(spark):
    bad = {}
    for name, fn in all_queries().items():
        schema = fn(spark, _SF).schema
        offenders = [f.name for f in schema.fields if not _hashable(f.dataType)]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "driver canonicalizer cannot hash these columns — project hex/"
        f"digest instead: {bad}"
    )


def test_every_oracle_has_query_and_no_empty_sql():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    for name, sql in os_.items():
        assert sql.strip(), name
