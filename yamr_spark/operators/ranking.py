"""Distributed EXACT global ranking — `row_number() over (order by …)`
semantics without the single-partition window Spark plans for a global
ordering.

Why this exists: an unpartitioned `Window.orderBy(...)` funnels every
row through ONE task (Spark even warns), which caps the operator at
what one executor can sort — unusable at 10⁹+ rows. But exact global
rank does not need a global sort on one machine: range-partition on the
total order, rank WITHIN each partition in parallel, and add each
partition's global start offset (the row counts of all partitions
before it — a bounded, P-row driver aggregate).

Correctness does not depend on where the range boundaries land: any
range partitioning consistent with the total order yields the same
global rank, because rank(row) = (#rows in earlier ranges) + (local
rank), and both terms are boundary-placement-invariant for a TOTAL
order (callers must pass a tie-breaking key set — e.g. append a unique
id). AQE coalescing of the range exchange merges only ADJACENT
partitions, preserving range order, and the partition id is captured as
a data column at materialization time, so the offset pass and the rank
pass can never disagree on the layout.

Scale: one range shuffle (same cost class as any global sort), one
P-row aggregate collect (P = shuffle partitions — structurally
bounded), one broadcast join of the P-row offset table, and a
partition-parallel window. No stage is single-task.

Reference parity: the reference has no ranking operator; this exists to
back rank-based quartile bucketing (quality_stratified_sample) with
pure integer arithmetic instead of cross-engine-fragile interpolated
quantile edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yamr_spark.materialize import materialize


def exact_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rnk",
    n_parts: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = exact 1-based global row number by
    ``order_cols`` (which MUST form a total order — include a unique
    tie-breaker). Equal to ``row_number() over (order by order_cols)``
    but computed with a fully partition-parallel plan (module
    docstring); pinned equal to the naive global window by
    tests/test_ranking.py under all three materialize modes.

    NULL ordering: Spark ASC places NULLS FIRST; engines defaulting to
    NULLS LAST (DuckDB, PostgreSQL) need explicit ``NULLS FIRST`` in a
    replaying ORDER BY (ADVICE r10 — the registered oracle pins it)."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # pid becomes a DATA column before the materialize barrier, so every
    # downstream pass (count + window) sees one frozen layout even when
    # the materialize mode rewrites physical partitioning (parquet mode
    # reads back by file splits).
    keyed = materialize(
        df.repartitionByRange(n_parts, *order_cols).withColumn(
            "_rank_pid", F.spark_partition_id()
        )
    )
    counts = {
        r["_rank_pid"]: r["cnt"]
        for r in keyed.groupBy("_rank_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offs, "_rank_pid int, _rank_off bigint")
    w = Window.partitionBy("_rank_pid").orderBy(*order_cols)
    return (
        keyed.join(F.broadcast(off_df), "_rank_pid")
        .withColumn(rank_col, (F.col("_rank_off") + F.row_number().over(w)).cast("long"))
        .drop("_rank_pid", "_rank_off")
    )
