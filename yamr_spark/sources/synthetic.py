"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-corpus generator with real partition
planning.

This is the modern seam for "the engine reads something Spark has no
built-in connector for" (the reference's DFS chunk source is its
ancestor: SURVEY §2.1 S1). The reader plans one InputPartition per
shard, each executor generates its shard independently (no driver
data), and every value is an md5-derived function of the row id — so a
DuckDB oracle replays the whole "source" exactly and the connector
path itself sits under the content-hash gate.

Usage::

    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("yamr_synthetic")
          .option("rows_per_part", 100).option("parts", 8).load())

Scale: partitions are independent and idempotent (retry-safe by
construction); generation cost is O(rows/executor) with zero shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class SyntheticCorpusDataSource(DataSource):
    """format name: ``yamr_synthetic``; options: parts, rows_per_part."""

    @classmethod
    def name(cls) -> str:
        return "yamr_synthetic"

    def schema(self) -> str:
        return "row_id bigint, part int, doc_hash bigint, value double"

    def reader(self, schema) -> "SyntheticCorpusReader":
        return SyntheticCorpusReader(
            parts=int(self.options.get("parts", 4)),
            rows_per_part=int(self.options.get("rows_per_part", 100)),
        )


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, parts: int, rows_per_part: int):
        self.parts = parts
        self.rows_per_part = rows_per_part

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        p = partition.value
        for i in range(self.rows_per_part):
            row_id = p * self.rows_per_part + i
            h = _h60(f"syn|{row_id}")
            # value in [0, 1) with 6 decimals — exact in double on both
            # engines (integer / 10^6)
            yield row_id, p, h, (h % 1_000_000) / 1_000_000.0
