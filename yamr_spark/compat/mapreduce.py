"""Generic MapReduce job API — the reference's C7/C8 operator hooks.

The reference runs user scripts that define duck-typed classes
(/root/reference/mapper.py:94-122, reducer.py:113-139):

- ``Mapper.run_map(data: str) -> list[tuple[key, value]]`` — called once
  per DFS chunk with its whole content; 0..n output tuples (UDTF-shaped).
- ``Reducer.run_reduce(data: list[tuple]) -> list[tuple]`` — called once
  per shuffle region with its key-sorted tuple list; the shipped scripts
  internally group by key (``combine_data``) and fold each group.

``run_job`` accepts exactly those duck-typed objects, so yamr job scripts
(e.g. map_libs/word_count.py's classes) run unmodified. Execution is
Arrow-vectorized end to end:

  input rows --mapInPandas(run_map)--> (key, value)
            --shuffle on key--> --applyInPandas/mapInPandas(run_reduce)-->

Two reduce modes:

- ``grouped`` (default, the 100 TB path): ``groupBy(key).applyInPandas``
  feeds run_reduce one key-group at a time. State is bounded by the
  largest single key, not the largest region; Spark's hash aggregation +
  AQE handle skew. Equivalent for any per-key reducer (all reference
  reducers are).
- ``region``: exact reference topology — hash-partition into
  ``num_regions`` regions, deliver each region's full key-sorted tuple
  list in ONE run_reduce call (mapper.py:124-136 + reducer.py:131-139).
  Only for reducers with cross-key logic; holds a region in one worker's
  memory, so it intentionally does not scale past region size ≈ RAM.

Python stays the slow path: this shim exists for drop-in compatibility.
Native operators (operators/*.py) express the same jobs as pure-JVM
plans and should be preferred; see operators/wordcount.py for the
word-count job's native form.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Protocol, runtime_checkable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@runtime_checkable
class MapperLike(Protocol):
    def run_map(self, data: str) -> list[tuple[Any, Any]]: ...


@runtime_checkable
class ReducerLike(Protocol):
    def run_reduce(self, data: list[tuple[Any, Any]]) -> list[tuple[Any, Any]]: ...


def _to_kv_frame(pairs: list[tuple[Any, Any]]) -> pd.DataFrame:
    return pd.DataFrame({"key": [p[0] for p in pairs], "value": [p[1] for p in pairs]})


def run_job(
    spark: SparkSession,
    input_df: DataFrame,
    mapper: MapperLike,
    reducer: ReducerLike,
    *,
    map_schema: str = "key string, value long",
    reduce_schema: str | None = None,
    num_regions: int | None = None,
    mode: str = "grouped",
    text_col: str | None = None,
) -> DataFrame:
    """Run a reference-style MapReduce job as one declarative Spark plan.

    ``input_df``: any DataFrame; ``text_col`` (default: first column) is
    fed to ``mapper.run_map`` one value per call — each row plays the
    role of one DFS chunk.
    ``map_schema``/``reduce_schema``: Spark DDL for the (key, value)
    output of each phase (the reference is dynamically typed; Spark needs
    the types declared — SURVEY.md §7.6 risk 2).
    """
    if not isinstance(mapper, MapperLike):
        raise TypeError("mapper must define run_map(data) -> [(k, v), ...]")
    if not isinstance(reducer, ReducerLike):
        raise TypeError("reducer must define run_reduce(pairs) -> [(k, v), ...]")
    reduce_schema = reduce_schema or map_schema
    col = text_col or input_df.columns[0]

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[Any, Any]] = []
            for data in pdf[col]:
                out.extend(mapper.run_map(data))
            yield _to_kv_frame(out)

    mapped = input_df.select(col).mapInPandas(map_fn, schema=map_schema)

    if mode == "grouped":

        def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pairs = sorted(
                zip(pdf["key"], pdf["value"]), key=lambda t: (str(t[0]), repr(t[1]))
            )
            return _to_kv_frame(reducer.run_reduce(pairs))

        return mapped.groupBy("key").applyInPandas(reduce_group, schema=reduce_schema)

    if mode == "region":
        n = num_regions or int(spark.conf.get("spark.sql.shuffle.partitions"))

        def reduce_region(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pairs: list[tuple[Any, Any]] = []
            for pdf in batches:  # one partition == one region; gather then sort
                pairs.extend(zip(pdf["key"], pdf["value"]))
            if pairs:
                pairs.sort(key=lambda t: (str(t[0]), repr(t[1])))
                yield _to_kv_frame(reducer.run_reduce(pairs))

        return mapped.repartition(n, F.col("key")).mapInPandas(
            reduce_region, schema=reduce_schema
        )

    raise ValueError(f"unknown mode {mode!r}; use 'grouped' or 'region'")
