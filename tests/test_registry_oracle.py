"""Differential check: every registered query with an oracle must match
DuckDB on the same parquet — a local replica of the driver's t2 gate
(row count + column names + order-insensitive values), run at sf0.001
for speed (the driver runs sf0.01).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from yamr_spark.registry import all_oracles, all_queries
from yamr_spark.tables import TABLE_NAMES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df):  # pandas → sorted list of tuples with rounded floats
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, float):
                norm.append(None if math.isnan(v) else round(v, 6))
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=repr)


def _query_names():
    return sorted(all_oracles().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, sf_dir, name):
    q = all_queries()[name]
    spark_df = q(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    duck_df = con.execute(all_oracles()[name]).fetchdf()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {spark_df.columns} vs {duck_df.columns}"
    )
    assert len(spark_df) == len(duck_df), f"{name}: row count mismatch"
    assert _normalize(spark_df) == _normalize(duck_df), f"{name}: value mismatch"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
