"""Run the reference's ACTUAL job scripts — unmodified files from
/root/reference/map_libs/ — through the compat CLI path
(cli.run_script_job over compat/mapreduce.run_job), pinned against the
native operators on the reference's own corpora (VERDICT r12 #3).

The duck-typed replicas in test_cli.py / test_mapreduce_compat.py
mirror the scripts' shape; these tests import the real files, so any
drift in the accepted contract (class names, run_map/run_reduce
signatures, per-chunk data semantics) breaks here first."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

REF = "/root/reference/map_libs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def test_reference_word_count_script_on_alice(spark):
    """word_count.py (reference, verbatim) over the reference's alice
    corpus == the native word_count operator. Line-mode input: the
    mapper is per-record tokenization, so line vs whole-chunk feeding
    is count-invariant (re.findall over concatenated lines)."""
    from yamr_spark.cli import run_script_job
    from yamr_spark.operators.wordcount import word_count
    from yamr_spark.sources import read_text

    corpus = "/root/reference/alice"
    got = {
        r["key"]: r["value"]
        for r in run_script_job(
            spark, corpus, os.path.join(REF, "word_count.py")
        ).collect()
    }
    want = {
        r["word"]: r["cnt"]
        for r in word_count(read_text(spark, corpus), text_col="value").collect()
    }
    assert got == want
    assert got["alice"] > 100  # sanity: the corpus really flowed through


def test_reference_max_year_temp_script(spark):
    """max_year_temp.py (reference, verbatim) over the reference's own
    temperature.json == the native S9-scan + year-extract + MAX plan.
    chunks=True: the mapper json.loads the WHOLE file (the reference's
    chunk semantics) — line feeding would hand it invalid JSON."""
    from yamr_spark.cli import run_script_job
    from yamr_spark.functions import year_of_yyyymm
    from yamr_spark.sources import read_kv_json_array

    data = os.path.join(REF, "temperature.json")
    got = {
        int(r["key"]): float(r["value"])
        for r in run_script_job(
            spark,
            data,
            os.path.join(REF, "max_year_temp.py"),
            map_schema="key long, value double",
            chunks=True,
        ).collect()
    }
    native = (
        read_kv_json_array(spark, data, key_type="long", value_type="double")
        .select(year_of_yyyymm("key").alias("year"), "value")
        .groupBy("year")
        .agg(F.max("value").alias("mx"))
    )
    want = {int(r["year"]): float(r["mx"]) for r in native.collect()}
    assert got == want
    # pin against ground truth computed directly from the file too, so
    # a shared Spark-side bug cannot hide behind two matching plans
    pairs = json.loads(open(data).read())
    truth: dict[int, float] = {}
    for k, v in pairs:
        y = int(str(k)[:4])
        truth[y] = max(truth.get(y, float("-inf")), float(v))
    assert got == truth


def test_reference_word_count_script_region_mode(spark):
    """The same verbatim script under region mode (the reference's
    whole-region-per-run_reduce topology): identical counts to the
    grouped mode — the reducer's own combine_data (word_count.py:38-60)
    handles the multi-key region exactly as it does on the reference."""
    from yamr_spark.cli import run_script_job
    from yamr_spark.operators.wordcount import word_count
    from yamr_spark.sources import read_text

    corpus = "/root/reference/alice"
    got = {
        r["key"]: r["value"]
        for r in run_script_job(
            spark, corpus, os.path.join(REF, "word_count.py"), mode="region"
        ).collect()
    }
    want = {
        r["word"]: r["cnt"]
        for r in word_count(read_text(spark, corpus), text_col="value").collect()
    }
    assert got == want
