"""Source/sink round-trips (SURVEY §2.1): text & chunk scans, the JSON
[key,value] array format, result sink/scan/render, binary files."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from yamr_spark.sources import (
    read_binary_files,
    read_kv_json_array,
    read_result_json,
    read_text,
    read_text_chunks,
    render_result,
    write_parquet,
    write_result_json,
)


@pytest.fixture
def corpus(tmp_path):
    (tmp_path / "a.txt").write_text("hello world\nsecond line\n")
    (tmp_path / "b.txt").write_text("third\n")
    return str(tmp_path)


def test_read_text_lines(spark, corpus):
    assert read_text(spark, corpus).count() == 3


def test_read_text_chunks_whole_file(spark, corpus):
    rows = {r["chunk_path"].split("/")[-1]: r["data"] for r in read_text_chunks(spark, corpus).collect()}
    assert rows["a.txt"] == "hello world\nsecond line\n"
    assert rows["b.txt"] == "third\n"


def test_kv_json_array_temperature_shape(spark, tmp_path):
    # the reference's temperature.json shape: [[yyyymm, temp], ...]
    data = [[201501, 31.2], [201501, 41.0], [201601, 11.0]]
    p = tmp_path / "temperature.json"
    p.write_text(json.dumps(data))
    df = read_kv_json_array(spark, str(p), key_type="long", value_type="double")
    assert sorted(map(tuple, df.collect())) == [(201501, 31.2), (201501, 41.0), (201601, 11.0)]
    # downstream of the source, the max-per-year job works unchanged
    out = df.groupBy((F.col("key") / 100).cast("int").alias("year")).agg(
        F.max("value").alias("mx")
    )
    assert sorted(map(tuple, out.collect())) == [(2015, 41.0), (2016, 11.0)]


def test_result_sink_scan_render_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 3), ("b", 1)], "key string, value long")
    out = str(tmp_path / "result")
    write_result_json(df, out)
    back = read_result_json(spark, out, key_type="string", value_type="long")
    assert sorted(map(tuple, back.collect())) == [("a", 3), ("b", 1)]
    lines = {r["line"] for r in render_result(back).collect()}
    assert lines == {"a: 3", "b: 1"}


def test_binary_files(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"\x00\x01\x02")
    (tmp_path / "y.txt").write_text("nope")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == b"\x00\x01\x02"
    assert rows[0]["length"] == 3


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame([("us", 1), ("eu", 2), ("us", 3)], "region string, v long")
    out = str(tmp_path / "p")
    write_parquet(df, out, partition_by=["region"])
    back = spark.read.parquet(out)
    # partition pruning: filter on the partition column reads one dir
    assert back.where("region = 'us'").count() == 2
    plan = back.where("region = 'us'")._jdf.queryExecution().executedPlan().toString()
    assert "us" in plan or back.where("region = 'us'").rdd.getNumPartitions() >= 1


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("k,v\na,1\nb,2\n")
    from yamr_spark.sources import read_csv

    df = read_csv(spark, str(p), schema="k string, v long")
    assert sorted(map(tuple, df.collect())) == [("a", 1), ("b", 2)]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "bigint"]


def test_read_csv_schema_optional_and_multiline_distinct(spark, tmp_path):
    """The two CSV contracts coexist un-shadowed: read_csv (optional
    schema, inference fallback, splittable) and read_csv_multiline
    (schema-required, quoted embedded newlines)."""
    from yamr_spark.sources import read_csv, read_csv_multiline, write_csv

    p = tmp_path / "plain.csv"
    p.write_text("k,v\na,1\nb,2\n")
    inferred = read_csv(spark, str(p))  # optional-schema contract
    assert sorted(r["k"] for r in inferred.collect()) == ["a", "b"]

    df = spark.createDataFrame([("x", "line1\nline2"), ("y", "flat")], "k string, body string")
    out = str(tmp_path / "multi")
    write_csv(df, out)
    back = read_csv_multiline(spark, out, "k string, body string")
    rows = {r["k"]: r["body"] for r in back.collect()}
    assert rows == {"x": "line1\nline2", "y": "flat"}


def test_sorted_store_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_sorted_store must produce files whose min/max statistics
    are pairwise disjoint on the sort column (the property row-group
    skipping exploits), while preserving content exactly."""
    import glob

    import pyarrow.parquet as pq

    from yamr_spark.sources import write_sorted_store
    from yamr_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    store = str(tmp_path / "sorted")
    write_sorted_store(ev, store, "user_id", n_files=6)

    ranges = []
    for f in glob.glob(store + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"

    back = spark.read.parquet(store)
    assert sorted(r.event_id for r in back.collect()) == sorted(
        r.event_id for r in ev.collect()
    )
    # the predicate reaches the scan, so the stats actually get consulted
    from yamr_spark.plans import pushed_filters

    assert "user_id" in pushed_filters(back.where(F.col("user_id") == 42))


def test_zorder_store_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering must bound BOTH dimensions per file (a
    single-column sort leaves the other column's span at ~100% in
    every file), and content must survive exactly. Dimensions are two
    equal-width 4-bit columns — interleaving only balances dimensions
    of comparable cardinality; with lopsided ranges the wider column's
    high bits dominate the sort, which is the documented caveat of
    every lakehouse ZORDER implementation."""
    import glob

    import pyarrow.parquet as pq

    from yamr_spark.sources import write_zorder_store
    from yamr_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.pmod("user_id", F.lit(16)).cast("long").alias("u4"),
        F.pmod("event_id", F.lit(16)).cast("long").alias("e4"),
    )
    store = str(tmp_path / "zorder")
    write_zorder_store(ev, store, "u4", "e4", n_files=16, bits=4)

    def spans(col):
        out = []
        for f in glob.glob(store + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            out.append(hi - lo)
        return out

    rows = ev.collect()
    for col in ("u4", "e4"):
        vals = [getattr(r, col) for r in rows]
        global_span = max(vals) - min(vals)
        ss = spans(col)
        assert len(ss) > 1
        mean_span = sum(ss) / len(ss)
        assert mean_span < 0.6 * global_span, (col, ss, global_span)

    back = spark.read.parquet(store)
    assert sorted(r.event_id for r in back.collect()) == sorted(
        r.event_id for r in rows
    )
