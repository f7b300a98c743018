"""Golden tests for as-of join, bucketed range join, and salted agg."""

from __future__ import annotations

import datetime as dt

from yamr_spark.operators.skew import salted_join, salted_sum
from yamr_spark.operators.temporal import asof_join, range_join_bucketed

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive(spark):
    left = _df(spark, [(1, 1, _m(10)), (2, 1, _m(30)), (3, 2, _m(5))],
               "event_id long, user_id long, ts timestamp")
    right = _df(spark, [(1, _m(10), 5.0), (1, _m(25), 7.0), (9, _m(0), 99.0)],
                "user_id long, ts timestamp, v double")
    out = {
        r["event_id"]: (r["v_asof"], r["ts_r_asof"])
        for r in asof_join(
            left,
            right.withColumn("ts_r", right["ts"]),
            on=["user_id"],
            right_values=["v", "ts_r"],
        ).collect()
    }
    assert out[1] == (5.0, _m(10))      # equal ts → inclusive match
    assert out[2] == (7.0, _m(25))      # latest prior of two
    assert out[3] == (None, None)       # no right rows for user 2


def test_range_join_bucket_boundaries(spark):
    # purchases at :00; clicks at -61min (out), -60min (in, boundary),
    # -1min (in), +1min (out, window is [-60m, 0])
    left = _df(spark, [(1, 1, _m(0))], "event_id long, user_id long, ts timestamp")
    right = _df(
        spark,
        [(10, 1, _m(-61)), (11, 1, _m(-60)), (12, 1, _m(-1)), (13, 1, _m(1))],
        "click_id long, user_id long, ts timestamp",
    )
    got = sorted(
        r["click_id"]
        for r in range_join_bucketed(
            left, right, on=["user_id"], lower_s=-3600, upper_s=0, bucket_s=600
        ).collect()
    )
    assert got == [11, 12]


def test_range_join_no_duplicate_pairs(spark):
    left = _df(spark, [(1, 1, _m(0))], "event_id long, user_id long, ts timestamp")
    right = _df(spark, [(10, 1, _m(-30))], "click_id long, user_id long, ts timestamp")
    out = range_join_bucketed(left, right, on=["user_id"], lower_s=-3600, upper_s=0,
                              bucket_s=7)  # tiny buckets → many probes, one match
    assert out.count() == 1


def test_salted_sum_matches_plain(spark):
    df = _df(spark, [("a", float(i)) for i in range(100)] + [("b", 1.5)],
             "k string, v double")
    got = {r["k"]: r["value_sum"] for r in salted_sum(df, "k", "v", buckets=8).collect()}
    assert got == {"a": 4950.0, "b": 1.5}


def test_salted_join_matches_plain(spark):
    big = _df(spark, [("a", i) for i in range(50)] + [("b", 0)], "k string, n long")
    small = _df(spark, [("a", "A"), ("b", "B"), ("c", "C")], "k string, label string")
    out = salted_join(big, small, on=["k"], buckets=4)
    assert out.count() == 51
    assert out.where("k = 'b'").collect()[0]["label"] == "B"


def test_ewma_pandas_twin_matches_jvm(spark, sf_dir):
    """The applyInPandas grouped-map EWMA must equal the JVM
    aggregate() fold exactly (same recurrence, same (ts, event_id)
    order, same rounding) — the Arrow seam carries no semantic drift."""
    from yamr_spark.operators.temporal import ewma_user_value, ewma_user_value_pandas
    from yamr_spark.registry import _ship_package
    from yamr_spark.tables import table

    _ship_package(spark)
    ev = table(spark, sf_dir, "events")
    jvm = {(r.user_id, r.n_events, r.ewma) for r in ewma_user_value(ev).collect()}
    pd_ = {
        (r.user_id, r.n_events, r.ewma) for r in ewma_user_value_pandas(ev).collect()
    }
    assert jvm == pd_
