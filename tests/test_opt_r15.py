"""Round-15 optimization regression tests: block-lifetime machinery.

VERDICT r14 #1/#2/#5: localCheckpoint blocks from materialize() used to
accumulate for the whole process (the bench runs 152 queries × 3 passes
in ONE application), and the appId-keyed shared caches were never
cleared, so min-of-passes priced every consumer at its already-built
cost. materialize.py now tracks every local-mode checkpoint's internal
RDD id (pinned when built inside a shared-cache ``pinned_blocks()``
scope, freeable otherwise); ``free_blocks()`` drops the per-query
blocks and ``free_shared_caches()`` clears the caches + their blocks.
"""

from __future__ import annotations

from yamr_spark import materialize as M
from yamr_spark.registry import all_queries
from yamr_spark.tables import table


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _run(spark, sf_dir, name):
    all_queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()


def test_free_blocks_releases_per_query_frames(spark, sf_dir):
    M.free_blocks()
    M.free_shared_caches()
    base = _n_persistent(spark)
    df = M.materialize(table(spark, sf_dir, "documents").select("doc_id"))
    df.write.format("noop").mode("overwrite").save()
    assert _n_persistent(spark) == base + 1
    assert M.free_blocks() >= 1
    assert _n_persistent(spark) == base


def test_pinned_blocks_survive_free_blocks(spark, sf_dir):
    M.free_blocks()
    M.free_shared_caches()
    base = _n_persistent(spark)
    with M.pinned_blocks():
        pinned = M.materialize(
            table(spark, sf_dir, "documents").select("doc_id")
        )
    pinned.write.format("noop").mode("overwrite").save()
    M.free_blocks()
    assert _n_persistent(spark) == base + 1
    # the pinned frame is still usable after a per-query flush
    assert pinned.count() > 0
    M.free_shared_caches()
    assert _n_persistent(spark) == base


def test_shared_cache_clear_forces_rebuild_with_identical_values(
    spark, sf_dir
):
    """A consumer of a shared cache must produce bit-identical rows
    before and after ``free_shared_caches()`` (the bench clears at every
    pass start — VERDICT r14 #5)."""
    q = all_queries()["containment_pairs_bidir"]
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    M.free_blocks()
    M.free_shared_caches()
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    M.free_blocks()
    assert a == b and len(a) > 0


def test_stale_ids_are_harmless(spark):
    """Freeing is id-based (no JVM handles pinned): ids of long-gone
    RDDs must no-op rather than raise."""
    M._FREEABLE.append((spark.sparkContext, 10_000_000))
    assert M.free_blocks() == 1


def test_bench_queries_run_clean_after_full_flush(spark, sf_dir):
    """End-to-end: run a shared-cache consumer, flush everything, run a
    different consumer of the SAME cache — the rebuild path must not
    reference freed blocks."""
    _run(spark, sf_dir, "containment_pairs_stratified")
    M.free_blocks()
    M.free_shared_caches()
    _run(spark, sf_dir, "containment_pairs_bidir")
    M.free_blocks()
    M.free_shared_caches()
