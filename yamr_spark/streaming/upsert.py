"""Streaming keyed upsert — merge-into semantics over an append-only
engine, via ``foreachBatch``.

Spark's built-in streaming sinks are append/complete only; the
production "keep the latest row per key" table (a CDC-style upsert)
needs ``foreachBatch``: each micro-batch runs a BATCH merge of the new
rows into the keyed store. The merge rule (keep the max-(order, tie)
row per key) is associative, so incremental per-batch application
equals the one-shot batch result — which is exactly what the DuckDB
oracle checks.

Scale notes: the store is bucketed by key hash into a fixed directory
layout, and each micro-batch rewrites ONLY the buckets its keys touch
(read old bucket + union batch slice + keep-latest + atomic
tmp-dir/rename swap). Untouched buckets are never read or written, so
per-batch cost is O(batch ∪ touched-buckets), not O(store). The
per-bucket driver loop issues sequential jobs — right for the
dozens-of-buckets layouts here; at thousands of touched buckets the
single-job rewrite is Spark's dynamic partition overwrite
(partitionOverwriteMode=dynamic over a bucket-partitioned store:
one pruned read of the touched buckets ∪ batch, one partitioned
write), same merge semantics, job-level commit. On a real
cluster the same pattern is what Delta/Iceberg MERGE INTO compiles to
under the hood (copy-on-write of matched files); here it is expressed
with plain parquet + directory swaps so the engine has no table-format
dependency.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    key: str,
    order: str,
    tie: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """One row per ``key``: the max-(order, tie) row — the merge rule.

    With ``tombstone_col`` (CDC delete support): the latest row still
    wins, but if that winner is a tombstone (boolean true) the key is
    REMOVED from the output — upsert/delete streams apply with the same
    single window, and the rule stays associative (the latest change
    dominates any prefix merge, so incremental per-batch application
    equals the one-shot result, deletes included). A NULL tombstone
    value means "not a delete" — ``~col`` alone would evaluate NULL and
    silently DROP those keys from the filter (ADVICE r06), so the flag
    coalesces to false first."""
    w = Window.partitionBy(key).orderBy(F.col(order).desc(), F.col(tie).desc())
    latest = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if tombstone_col is not None:
        latest = latest.where(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return latest


def _bucket_of(key_col, n_buckets: int):
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets))


def _sweep_bucket_residue(store_dir: str) -> None:
    """Store-wide crash-residue sweep, run before every merge AND every
    read: a bucket stranded as ``_bucket_<b>.old`` by a crash between
    the two swap renames (committed ``bucket=<b>`` missing) is RESTORED;
    superseded ``.old`` and partial ``.tmp`` staging dirs are dropped.
    Sweeping all buckets — not just the ones the current batch touches —
    closes the ADVICE r05 hole where a direct read after a crash
    silently under-reported the untouched stranded bucket."""
    import re

    if not os.path.isdir(store_dir):
        return
    for d in sorted(os.listdir(store_dir)):
        m = re.fullmatch(r"_bucket_(\d+)\.(old|tmp)", d)
        if not m:
            continue
        full = os.path.join(store_dir, d)
        bucket_dir = os.path.join(store_dir, f"bucket={m.group(1)}")
        if m.group(2) == "old" and not os.path.exists(bucket_dir):
            os.rename(full, bucket_dir)
        else:
            shutil.rmtree(full)


def merge_batch_into_store(
    batch_df: DataFrame,
    store_dir: str,
    key: str,
    order: str,
    tie: str,
    n_buckets: int = 8,
) -> None:
    """Batch-merge ``batch_df`` into the keyed store: for each BUCKET the
    batch touches, read the old bucket, union the batch slice, keep the
    latest row per key, and atomically swap the bucket directory. The
    staging dir is ``_bucket_<b>.tmp`` — the leading underscore means
    Spark's FileIndex AND ``read_store`` both ignore it, so a crash at
    any point leaves only invisible residue (swept on retry), never a
    half-committed bucket that reads as duplicated keys. The swap is
    two renames (old → ``_bucket_<b>.old``, tmp → bucket), so the
    window where a concurrent reader sees the bucket missing is two
    metadata ops, not an rmtree of the old data."""
    spark = batch_df.sparkSession
    # recover residue of any previously crashed merge STORE-WIDE before
    # touching anything (a stranded bucket may not be in this batch's
    # touched set)
    _sweep_bucket_residue(store_dir)
    batch_df = batch_df.withColumn("__bucket", _bucket_of(F.col(key), n_buckets))
    batch_df.persist()
    try:
        touched = [
            r[0] for r in batch_df.select("__bucket").distinct().collect()
        ]
        for b in touched:
            bucket_dir = os.path.join(store_dir, f"bucket={b}")
            # no '=' in staging names: Spark's path filter exempts
            # underscore names containing '=' (partition-dir support),
            # so '_bucket=K.tmp' would be partition-discovered.
            tmp = os.path.join(store_dir, f"_bucket_{b}.tmp")
            old_stage = os.path.join(store_dir, f"_bucket_{b}.old")
            slice_df = batch_df.where(F.col("__bucket") == b).drop("__bucket")
            if os.path.exists(os.path.join(bucket_dir, "_SUCCESS")):
                old = spark.read.parquet(bucket_dir).select(*slice_df.columns)
                merged = keep_latest(old.unionByName(slice_df), key, order, tie)
            else:
                merged = keep_latest(slice_df, key, order, tie)
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
            if os.path.exists(bucket_dir):
                os.rename(bucket_dir, old_stage)
            os.rename(tmp, bucket_dir)
            if os.path.exists(old_stage):
                shutil.rmtree(old_stage)
    finally:
        batch_df.unpersist()


def stream_upsert_to_store(
    sdf: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    order: str = "ts",
    tie: str = "event_id",
    n_buckets: int = 8,
) -> None:
    """Drain a streaming DataFrame into the keyed store with
    ``foreachBatch`` + availableNow: every micro-batch merges via
    ``merge_batch_into_store``. The checkpoint makes restarts exactly-
    once at the batch level; a replayed batch re-merges the same rows,
    and keep-latest is idempotent, so the store converges either way."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_batch_into_store(
            batch_df, store_dir, key=key, order=order, tie=tie, n_buckets=n_buckets
        )

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from yamr_spark.streaming.events import restore_ns_conf

    restore_ns_conf(sdf.sparkSession)


def read_store(
    spark: SparkSession, store_dir: str, tombstone_col: str | None = None
) -> DataFrame:
    """Read every committed bucket of the store back as one DataFrame.

    CDC deletes: tombstone rows are PERSISTED by the merge (so a
    late-replayed older update loses the keep-latest window to the
    tombstone instead of resurrecting the key) and filtered HERE —
    pass ``tombstone_col`` to hide deleted keys from readers.

    Only exact ``bucket=<int>`` dirs with a _SUCCESS marker qualify —
    staging residue (``_bucket_K.tmp`` / ``_bucket_K.old``) is invisible
    by its underscore prefix, and the strict name match additionally
    excludes any legacy suffixed dir. The store-wide residue sweep runs
    first, so a bucket stranded mid-swap by a crash is restored (not
    silently missing) even when no merge has touched it since."""
    import re

    _sweep_bucket_residue(store_dir)
    buckets = [
        os.path.join(store_dir, d)
        for d in sorted(os.listdir(store_dir))
        if re.fullmatch(r"bucket=\d+", d)
        and os.path.exists(os.path.join(store_dir, d, "_SUCCESS"))
    ]
    out = spark.read.parquet(*buckets)
    if tombstone_col is not None:
        # NULL tombstone = not a delete (same coalesce as keep_latest —
        # a bare ~col would null out and hide those keys)
        out = out.where(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return out


def merge_batch_into_store_dpo(
    batch_df: DataFrame,
    store_dir: str,
    key: str,
    order: str,
    tie: str,
    n_buckets: int = 8,
) -> None:
    """The SINGLE-JOB form of ``merge_batch_into_store``: one pruned
    read of the touched buckets ∪ the batch, one keep-latest, one
    dynamic-partition-overwrite write — Spark's committer replaces
    exactly the partitions present in the output (the touched buckets)
    and leaves the rest untouched. Same merge semantics as the
    per-bucket loop (test-pinned equal); right when a batch touches
    hundreds+ of buckets and the sequential per-bucket jobs dominate.

    The merged frame is materialized EAGERLY before the write because
    the write overwrites the very partitions the plan reads; the
    barrier (``materialize_eager`` — the default local materialize is
    lazy and would defer computation into the overwrite job itself)
    bounds that staging cost to touched-bucket data, not the store."""
    import os

    from yamr_spark.materialize import overwrite_parquet

    spark = batch_df.sparkSession
    batch = batch_df.withColumn("bucket", _bucket_of(F.col(key), n_buckets))
    batch.persist()
    try:
        touched = [r[0] for r in batch.select("bucket").distinct().collect()]
        if os.path.exists(store_dir) and any(
            d.startswith("bucket=") for d in os.listdir(store_dir)
        ):
            old = (
                spark.read.parquet(store_dir)
                .where(F.col("bucket").isin(touched))
                .select(*batch.columns)
            )
            merged = keep_latest(old.unionByName(batch), key, order, tie)
        else:
            merged = keep_latest(batch, key, order, tie)
        # overwrite_parquet = the barrier-then-overwrite guard: the
        # plan READS the very partitions the write replaces, so the
        # merged frame must be fully computed before the committer
        # starts deleting (materialize.py). dynamic=True scopes the
        # overwrite mode to THIS write (no session-conf toggling two
        # concurrent streams could interleave — ADVICE r07).
        overwrite_parquet(merged, store_dir, partition_by=["bucket"], dynamic=True)
    finally:
        batch.unpersist()
