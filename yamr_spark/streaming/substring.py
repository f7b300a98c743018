"""Streaming incremental EXACT SUBSTRING dedup — the span-granularity
member of the online dedup family (exact-hash: incremental_dedup /
streaming upsert; MinHash: streaming/lsh.py; winnow: batch
winnow_incremental).

Documents arrive in micro-batches; each batch's token windows are
checked against a STANDING window index (every ``width``-token window
the corpus has already ingested), the per-doc dropped-span ledger is
appended to a results directory, and the batch's own windows are then
ADDED to the index so later batches dedup against it. ``foreachBatch``
supplies the batch hook; matching is on (hash60, window TEXT) — the
hash prunes the join, the text equality keeps it EXACT (the substring
family's contract: no 60-bit-collision false positives at any corpus
size).

Scale: the index holds one row per DISTINCT window — (h BIGINT,
wt ~60 B) ≈ tokens × 70 bytes, the price of substring granularity
(Lee et al.'s suffix arrays are ~8× corpus bytes; this is comparable
and partitionable). At 100 TB the index is bucketed on h so the
per-batch probe joins exchange-free on the standing side; per batch
the work is batch-windows × (one hash join + text verify) + one
append. New docs match only STRICTLY EARLIER state (read before
append), so results are deterministic given the batch sequence and the
closed-form oracle replay holds (batch k matches index0 ∪ batches<k).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamr_spark.functions import hash60_sql
from yamr_spark.operators.curation import _TOKS

_WIDTH = 8


def _window_table(docs: DataFrame, width: int = _WIDTH) -> DataFrame:
    """(doc_id, n_tokens, s, h, wt) — every ``width``-token window with
    its 60-bit hash and exact text. One map-side pass, no shuffle."""
    toks = docs.select("doc_id", F.expr(_TOKS).alias("__toks")).select(
        "doc_id", F.size("__toks").cast("long").alias("n_tokens"), "__toks"
    )
    ws = (
        f"transform(sequence(1, size(__toks) - {width} + 1), "
        f"s -> struct(cast(s as bigint) AS s, "
        f"concat_ws(chr(32), slice(__toks, s, {width})) AS wt))"
    )
    return (
        toks.filter(F.col("n_tokens") >= width)
        .select("doc_id", "n_tokens", F.explode(F.expr(ws)).alias("w"))
        .select(
            "doc_id",
            "n_tokens",
            F.col("w.s").alias("s"),
            F.expr(hash60_sql("w.wt")).alias("h"),
            F.col("w.wt").alias("wt"),
        )
    )


def build_window_index(docs: DataFrame, index_dir: str, width: int = _WIDTH) -> None:
    """Materialize the standing window index: DISTINCT (h, wt) rows."""
    _window_table(docs, width).select("h", "wt").distinct().write.mode(
        "overwrite"
    ).parquet(index_dir)


def _ledger(wins: DataFrame, hits: DataFrame, width: int) -> DataFrame:
    """Per-doc dropped-span ledger from a window table and its matched
    subset: gaps-and-islands merge, per-doc window state only."""
    from pyspark.sql import Window

    w1 = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        hits.select("doc_id", "s")
        .distinct()
        .withColumn("prev", F.lag("s").over(w1))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("s") > F.col("prev") + width), 1
            ).otherwise(0),
        )
        .withColumn(
            "isl", F.sum("brk").over(w1.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        (F.max("s") - F.min("s") + width).cast("long").alias("span_tokens")
    )
    per = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").cast("long").alias("dropped_tokens")
    )
    counts = wins.select("doc_id", "n_tokens").distinct()
    return counts.join(per, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dropped_tokens", F.lit(0).cast("long")).alias("dropped_tokens"),
    )


def stream_substring_into_index(
    spark: SparkSession,
    stream_dir: str,
    schema,
    index_dir: str,
    results_dir: str,
    checkpoint_dir: str,
    width: int = _WIDTH,
) -> None:
    """Drain the staged document stream: per micro-batch, compute each
    doc's dropped-span ledger against the standing window index, append
    the ledgers to ``results_dir``, then append the batch's distinct
    windows to the index. Delivery contract mirrors streaming/lsh.py:
    availableNow + checkpoint is at-least-once with idempotent results
    (``read_ledgers`` applies distinct(); a replayed batch re-appends
    identical ledger rows and duplicate index windows, which cannot
    change later matches — window matching is set-semantics)."""

    def _ingest(batch_df: DataFrame, _bid: int) -> None:
        wins = _window_table(batch_df, width)
        wins.persist()
        try:
            has_index = os.path.isdir(index_dir) and any(
                f.startswith("part-") or f.endswith(".parquet")
                for f in os.listdir(index_dir)
            )
            if has_index:
                idx = spark.read.parquet(index_dir)
                hits = wins.join(idx, ["h", "wt"], "left_semi")
            else:
                hits = wins.limit(0)
            _ledger(wins, hits, width).write.mode("append").parquet(results_dir)
            wins.select("h", "wt").distinct().write.mode("append").parquet(
                index_dir
            )
        finally:
            wins.unpersist()

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir + "/*")
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_ledgers(spark: SparkSession, results_dir: str) -> DataFrame:
    """The accumulated per-doc ledgers, exact under at-least-once
    delivery via distinct()."""
    return (
        spark.read.parquet(results_dir)
        .select("doc_id", "n_tokens", "dropped_tokens")
        .distinct()
    )
