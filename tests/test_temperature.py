"""Golden tests for the max-year-temp job (/root/reference/map_libs/
max_year_temp.py, tests/test_base_mappers.py:43-58)."""

from __future__ import annotations

from yamr_spark.operators.temperature import (
    max_temp_per_year_yyyymm,
    max_value_per_year_ts,
    parse_temperature_json,
)

# the 14-pair sample from /root/reference/map_libs/temperature.json
TEMPERATURE_JSON = (
    "[[201501, 31.2], [201502, 30.1], [201503, 30.0], [201504, 29.9],"
    " [201601, 15.2], [201602, 15.1], [201603, 15.0], [201604, 14.9],"
    " [201301, 32], [201302, 31.9], [201401, 30.2], [201402, 30.1],"
    " [201001, 20], [201002, 19.9]]"
)


def test_golden_max_per_year(spark):
    # test_base_mappers.py:52-58
    df = spark.createDataFrame(
        [(201501, 31.2), (201502, 41.0), (201601, 11.0)], ["yyyymm", "temp"]
    )
    got = dict(max_temp_per_year_yyyymm(df).collect())
    assert got == {2015: 41.0, 2016: 11.0}


def test_json_sample_roundtrip(spark):
    # SURVEY/FIXTURES golden: the shipped sample yields these maxima
    df = parse_temperature_json(spark, TEMPERATURE_JSON)
    assert df.count() == 14
    got = dict(max_temp_per_year_yyyymm(df).collect())
    assert got == {2010: 20.0, 2013: 32.0, 2014: 30.2, 2015: 31.2, 2016: 15.2}


def test_events_analogue(spark, sf_dir):
    from yamr_spark.tables import table
    ev = table(spark, sf_dir, "events")
    got = max_value_per_year_ts(ev)
    assert got.columns == ["year", "max_value"]
    assert got.count() >= 1
