"""Pluggable materialization (materialize.py): all three strategies must
produce identical results on the operators that materialize
intermediates, and each must truncate/replace the subplan so consumers
never recompute it.
"""

from __future__ import annotations

import pytest

from yamr_spark import materialize as M
from yamr_spark.plans import plan_text


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    M.set_mode(None)


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy cat again and again"),
    (3, "completely unrelated text about catalyst physical plans"),
    (4, "the quick brown fox jumps over the lazy dog again and again"),
]


@pytest.mark.parametrize("mode", ["disk", "parquet"])
def test_cc_loop_identical_across_modes(spark, mode):
    """The per-round materialize loop under the non-default strategies
    (``local`` is what the rest of the suite runs everywhere). The full
    pipelines are checked under disk/parquet by running the whole suite
    with YAMR_SPARK_MATERIALIZE set — this pins the iterative loop,
    where a strategy bug would corrupt results, cheaply in CI."""
    from yamr_spark.operators.graph import connected_components

    M.set_mode(mode)
    edges = spark.createDataFrame(
        [(1, 4), (1, 2), (7, 8)], ["doc_a", "doc_b"]
    )
    comps = connected_components(edges)
    got = {r.node: r.component for r in comps.collect()}
    assert got == {1: 1, 2: 1, 4: 1, 7: 7, 8: 7}


def test_minhash_pipeline_disk_mode(spark):
    """One full multi-materialize pipeline under the disk strategy."""
    from yamr_spark.operators.dedup import minhash_near_dup

    M.set_mode("disk")
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    pairs = minhash_near_dup(docs, threshold=0.5)
    got_pairs = sorted((r.doc_a, r.doc_b) for r in pairs.collect())
    assert (1, 4) in got_pairs and not any(3 in p for p in got_pairs)


# The physical-plan marker that proves the returned DataFrame reads the
# materialized result instead of recomputing the upstream subplan. Both
# checkpoint flavors (local & reliable) resolve to an RDD scan; parquet
# staging to a fresh file scan. Every mode must ALSO truncate lineage —
# a mode that keeps the logical plan (e.g. bare persist(DISK_ONLY))
# doubles iterative self-join plans per round and OOMs the driver during
# analysis (measured on the 200-node CC chain; that is why ``disk`` is a
# reliable checkpoint, not a persist).
_PLAN_MARKER = {
    "local": "ExistingRDD",
    "disk": "ExistingRDD",
    "parquet": "Scan parquet",
}


@pytest.mark.parametrize("mode", ["local", "disk", "parquet"])
def test_no_subplan_recompute(spark, mode):
    M.set_mode(mode)
    df = (
        spark.range(1000)
        .selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k")
        .count()
    )
    mat = M.materialize(df)
    assert _PLAN_MARKER[mode] in plan_text(mat), plan_text(mat)
    # the upstream groupBy exchange must be gone from any consumer plan
    consumer = plan_text(mat.filter("count > 0"))
    assert "Exchange" not in consumer, consumer


def test_mode_selection_env(monkeypatch):
    M.set_mode(None)
    monkeypatch.setenv("YAMR_SPARK_MATERIALIZE", "disk")
    assert M.current_mode() == "disk"
    monkeypatch.setenv("YAMR_SPARK_MATERIALIZE", "bogus")
    assert M.current_mode() == "local"
    M.set_mode("parquet")
    assert M.current_mode() == "parquet"
    with pytest.raises(ValueError):
        M.set_mode("nope")
