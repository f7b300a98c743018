"""Store maintenance: small-file compaction.

The small-file problem is THE operational failure mode of a long-lived
100 TB parquet store: streaming sinks, per-batch upserts, and
fine-grained partitioning each leave thousands of KB-sized files, and
scan cost becomes per-file overhead (open/footer/seek) instead of
bytes. Compaction rewrites each partition directory into
``ceil(bytes / target)`` right-sized files.

Design:

- **Per-partition-directory, not whole-store**: each leaf directory
  compacts independently (and idempotently), so a 100 TB store
  compacts incrementally — a crashed run leaves every completed
  directory valid, and re-running skips directories already within
  budget.
- **Atomic swap**: rewrite to ``<dir>.compact.tmp`` then rename over
  the original — readers see the old or the new file set, never a mix.
- **Planning from metadata only**: file sizes come from a directory
  listing; no data is read to decide whether/how much to compact.
  (Local implementation walks the filesystem; on a cluster the same
  listing comes from the Hadoop FileSystem API — the plan/rewrite/swap
  structure is unchanged. The per-leaf loop is sequential on the
  driver; with many thousands of undersized leaves, submit the
  rewrites through a thread pool — Spark schedules concurrent jobs
  fine — or compact coarser prefixes.)
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _leaf_parquet_dirs(store_dir: str) -> list[str]:
    """Leaf directories holding parquet files (a flat store is its own
    single leaf)."""
    leaves = []
    for root, _dirs, files in os.walk(store_dir):
        if root.endswith(".compact.tmp"):
            continue
        if any(f.endswith(".parquet") for f in files):
            leaves.append(root)
    return sorted(leaves)


def compaction_plan(
    store_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> list[dict]:
    """Metadata-only plan: one entry per leaf directory with its file
    count, byte total, and the file count compaction would produce.
    ``needed`` is False when the directory is already at (or below) its
    target file count — re-running a completed compaction is a no-op."""
    plan = []
    for leaf in _leaf_parquet_dirs(store_dir):
        files = [
            os.path.join(leaf, f)
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        ]
        total = sum(os.path.getsize(f) for f in files)
        target_files = max(1, math.ceil(total / target_bytes))
        plan.append(
            {
                "dir": leaf,
                "n_files": len(files),
                "bytes": total,
                "target_files": target_files,
                "needed": len(files) > target_files,
            }
        )
    return plan


def compact_store(
    spark: SparkSession,
    store_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    max_concurrency: int = 1,
) -> list[dict]:
    """Compact every leaf directory that exceeds its target file count;
    returns the executed plan (with ``n_files_after`` filled in).
    Content-preserving by construction: each rewrite is
    read → coalesce(target) → write of the same rows, swapped in
    atomically. ``max_concurrency`` > 1 submits leaf rewrites through a
    thread pool — Spark's scheduler interleaves the independent jobs
    (FIFO within a pool is fine: each job is small) so thousands of
    tiny leaves don't serialize on driver round-trips; each leaf's
    swap stays atomic and leaves never share state."""
    plan = compaction_plan(store_dir, target_bytes)

    def _compact_leaf(entry: dict) -> None:
        if not entry["needed"]:
            entry["n_files_after"] = entry["n_files"]
            return
        leaf, n_out = entry["dir"], entry["target_files"]
        tmp = leaf + ".compact.tmp"
        # coalesce, not repartition: merging files needs no shuffle
        spark.read.parquet(leaf).coalesce(n_out).write.mode("overwrite").parquet(tmp)
        swap = leaf + ".compact.old"
        os.rename(leaf, swap)
        os.rename(tmp, leaf)
        shutil.rmtree(swap)
        entry["n_files_after"] = sum(
            1 for f in os.listdir(leaf) if f.endswith(".parquet")
        )

    if max_concurrency <= 1:
        for entry in plan:
            _compact_leaf(entry)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            list(pool.map(_compact_leaf, plan))
    return plan
