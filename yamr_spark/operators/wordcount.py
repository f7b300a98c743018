"""Word count — the reference's flagship job, Spark-first.

Reference: /root/reference/map_libs/word_count.py (Mapper tokenizes with
``re.findall(r'\\w+')``, strips ',.'/lowercases, emits ``(word, 1)``;
Reducer sums per key). Here the whole map→shuffle→reduce lifecycle is one
declarative plan: scan → split/explode → filter → hash-agg.

Scale notes (100 TB): the explode is pipelined inside whole-stage codegen
(no materialized token table); the count runs as a partial (map-side)
aggregate before the shuffle, so bytes shuffled ≈ distinct words per
partition, not total tokens — strictly better than the reference, which
ships every ``(word, 1)`` tuple across the wire (mapper.py:124-136 has no
combiner). Skewed words ("the") are absorbed by the partial agg for the
same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yamr_spark.functions import WORD_BREAK_RE, non_empty, tokenize


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C1/C8: flatMap-shaped 1→N transform — one row per word token.

    Not scan-spread: the round-14 interleaved A/B measured word_count
    slower with a root exchange (0.40 s → 1.22 s spread-on at sf0.1) —
    the explode feeds a partial aggregate, which one task handles
    efficiently at single-row-group scale, and multi-split production
    scans parallelize without help."""
    return (
        df.select(text_col)
        .select(F.explode(tokenize(text_col)).alias("word"))
        .filter(non_empty("word"))
    )


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C1+C2+C4+C5: tokenize, shuffle on word, count per word.

    Columns: (word string, cnt long) — deterministic content, order
    unspecified (the driver's check is order-insensitive; the reference's
    "region order then key-sorted" output order is non-semantic,
    SURVEY.md §4.2).
    """
    return tokens(df, text_col).groupBy("word").agg(F.count("*").alias("cnt"))


def top_words(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Global top-k words: TakeOrderedAndProject, not a global sort —
    each partition keeps k candidates, the driver merges k·p rows."""
    return (
        word_count(df, text_col)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(k)
    )


WORD_COUNT_ORACLE = f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '{WORD_BREAK_RE}')) AS word
  FROM documents
) t
WHERE length(word) > 0
GROUP BY word
"""

TOP_WORDS_ORACLE = f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '{WORD_BREAK_RE}')) AS word
  FROM documents
) t
WHERE length(word) > 0
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 20
"""
