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

Index layout & lifecycle: the index is a ``batch_id=`` partitioned
store (seed corpus = ``batch_id=-1``, each micro-batch its own
partition) — the same layout as the CMS/KMV delta stores, so it shares
their crash-safe prefix compaction (``sketch_compact.compact_prefix``
with ``substring_merge``): committed batch partitions fold into ONE
distinct-(h, wt) partition, bounding the store at one row per DISTINCT
window no matter how many batches re-contribute the same windows. A
compacted index serves identical matches (window matching is
set-semantics over (h, wt); distinct-union is associative and
prefix-safe).

Scale: one row per DISTINCT window — (h BIGINT, wt ~60 B) ≈ tokens ×
70 bytes, the price of substring granularity (Lee et al.'s suffix
arrays are ~8× corpus bytes; this is comparable and partitionable).
At 100 TB the index is additionally bucketed on h so the per-batch
probe joins exchange-free on the standing side; per batch the work is
batch-windows × (one hash join + text verify) + one partition
overwrite. New docs match only STRICTLY EARLIER state, so results are
deterministic given the batch sequence and the closed-form oracle
replay holds (batch k matches index0 ∪ batches<k).

Delivery contract (at-least-once made idempotent, ADVICE r12): a
foreachBatch replay must recompute the SAME ledger rows it committed
before the crash. Two mechanisms guarantee that even when the crash
fell between the index write and the checkpoint commit: (1) the probe
EXCLUDES the probing batch's own ``batch_id`` partition, so a replayed
batch never self-matches against the windows its crashed attempt
already appended; (2) both writes are idempotent — the index write is
a dynamic partition OVERWRITE of exactly ``batch_id=<bid>`` (replay
replaces, never duplicates) and the ledger rows are byte-identical on
replay, so ``read_ledgers``'s distinct() collapses them. This holds
for PERSISTENT directories across process restarts, not just fresh
tmpdirs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamr_spark.functions import hash60_sql
from yamr_spark.operators.curation import _TOKS
from yamr_spark.streaming.sketch_compact import compact_prefix, recover

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


def _write_index_partition(df: DataFrame, index_dir: str, batch_id: int) -> None:
    """Overwrite exactly the ``batch_id=<batch_id>`` partition with the
    distinct (h, wt) windows of ``df`` — idempotent under replay."""
    (
        df.select("h", "wt")
        .distinct()
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(index_dir)
    )


def build_window_index(docs: DataFrame, index_dir: str, width: int = _WIDTH) -> None:
    """Materialize the standing window index seed: DISTINCT (h, wt)
    rows under the ``batch_id=-1`` partition (stream batches never use
    negative ids, so the seed is always probed and never folded away
    from under an in-flight batch)."""
    _write_index_partition(_window_table(docs, width), index_dir, -1)


def substring_merge(df: DataFrame) -> DataFrame:
    """Distinct (h, wt) union — the window index's associative,
    prefix-safe reduction for ``sketch_compact.compact_prefix``."""
    return df.select("h", "wt").distinct()


def compact_window_index(
    spark: SparkSession, index_dir: str, upto: int, stream_stopped: bool = False
) -> int:
    """Fold committed ``batch_id`` partitions (id <= ``upto``) into one
    distinct-window partition — bounds the index at one row per
    DISTINCT window. Same replay contract as the sketch stores: pass
    ``upto`` strictly below the newest batch id unless the stream is
    cleanly stopped."""
    return compact_prefix(
        spark, index_dir, substring_merge, upto, stream_stopped=stream_stopped
    )


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
    doc's dropped-span ledger against the standing window index
    (EXCLUDING the batch's own partition, so a replayed batch never
    matches windows its crashed attempt appended — see the module
    docstring's delivery contract), append the ledgers to
    ``results_dir``, then overwrite the batch's ``batch_id=`` index
    partition with its distinct windows."""

    def _ingest(batch_df: DataFrame, bid: int) -> None:
        wins = _window_table(batch_df, width)
        wins.persist()
        try:
            recover(index_dir)  # finish any interrupted compaction
            has_index = os.path.isdir(index_dir) and any(
                f.startswith("batch_id=") for f in os.listdir(index_dir)
            )
            if has_index:
                # batch_id is a partition column: the != bid filter is
                # directory pruning, and it is the replay-correctness
                # exclusion (a crashed attempt's own windows live in
                # exactly the batch_id=<bid> partition).
                idx = spark.read.parquet(index_dir).where(
                    F.col("batch_id") != int(bid)
                )
                hits = wins.join(idx, ["h", "wt"], "left_semi")
            else:
                hits = wins.limit(0)
            _ledger(wins, hits, width).write.mode("append").parquet(results_dir)
            _write_index_partition(wins, index_dir, bid)
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
    delivery via distinct() (replayed batches recompute byte-identical
    rows — module docstring, delivery contract)."""
    return (
        spark.read.parquet(results_dir)
        .select("doc_id", "n_tokens", "dropped_tokens")
        .distinct()
    )


# --- Minimizer-anchored streaming index --------------------------------------
#
# Same service shape as the word-window index above, with the batch-side
# unit swapped for the winnowing-selected anchor k-grams of
# operators/curation.py (k=16, w=25 — the >= 40-char duplicate
# guarantee). The standing index holds one (h, wt) row per DISTINCT
# SELECTED anchor: ~2/(w+1) of corpus char offsets (~12.6x fewer rows
# than the dense window index, measured in SCALE.md r13), which is the
# difference between an index you can keep hot and one you archive.
# Delivery contract, batch_id partitioning, self-exclusion probe, and
# compaction are shared with the word-window form verbatim.


def build_anchor_index(docs: DataFrame, index_dir: str, **kw) -> None:
    """Materialize the standing ANCHOR index seed: distinct (h, wt)
    selected-anchor rows under batch_id=-1 (kw: k/w selection params,
    defaulting to the operator constants)."""
    from yamr_spark.operators.curation import minimizer_anchor_table

    _write_index_partition(minimizer_anchor_table(docs, **kw), index_dir, -1)


def stream_minimized_into_index(
    spark: SparkSession,
    stream_dir: str,
    schema,
    index_dir: str,
    results_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the staged document stream against the standing ANCHOR
    index: per micro-batch, flag the batch docs' anchors whose exact
    k-gram text is already in the index (excluding the batch's own
    partition — the replay contract of the module docstring), append
    the per-doc flagged-span ledgers, then overwrite the batch's
    ``batch_id=`` partition with its distinct anchors."""
    from pyspark.sql import functions as F

    from yamr_spark.operators.curation import (
        MINIMIZER_K,
        _flagged_ledger,
        minimizer_anchor_table,
    )

    def _ingest(batch_df: DataFrame, bid: int) -> None:
        anch = minimizer_anchor_table(batch_df)
        anch.persist()
        base = batch_df.select(
            "doc_id", F.length("text").cast("long").alias("n_chars")
        )
        try:
            recover(index_dir)
            has_index = os.path.isdir(index_dir) and any(
                f.startswith("batch_id=") for f in os.listdir(index_dir)
            )
            if has_index:
                idx = spark.read.parquet(index_dir).where(
                    F.col("batch_id") != int(bid)
                )
                flagged = (
                    anch.join(idx, ["h", "wt"], "left_semi")
                    .select("doc_id", "s")
                    .distinct()
                )
            else:
                flagged = anch.select("doc_id", "s").limit(0)
            _flagged_ledger(base, flagged, MINIMIZER_K).write.mode(
                "append"
            ).parquet(results_dir)
            _write_index_partition(anch, index_dir, bid)
        finally:
            anch.unpersist()

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


def read_minimized_ledgers(spark: SparkSession, results_dir: str) -> DataFrame:
    """The accumulated per-doc flagged-span ledgers, exact under
    at-least-once delivery via distinct()."""
    return (
        spark.read.parquet(results_dir)
        .select(
            "doc_id", "n_chars", "n_flagged_spans", "flagged_chars",
            "flagged_frac",
        )
        .distinct()
    )
