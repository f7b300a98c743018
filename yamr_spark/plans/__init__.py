"""Physical-plan inspection — the engine's "did Catalyst do what we
meant" toolkit.

The reference has no optimizer (SURVEY.md §4.1: no pushdown, pruning, or
rewrites exist); in this engine those come from Catalyst, and THESE
helpers are how we hold on to them: tests assert on plan text so a
refactor that silently breaks pushdown/broadcast/codegen fails CI, not a
100 TB production run.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (mode: simple|extended|formatted|
    codegen|cost)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan ('' if none)."""
    return "\n".join(
        line.strip() for line in plan_text(df).splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema lines of every scan — what the parquet reader will
    actually materialize (column pruning check)."""
    return "\n".join(
        line.strip() for line in plan_text(df).splitlines() if "ReadSchema" in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_text(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present? (HashAggregate in partial mode before the
    exchange — the reason a groupBy ships distinct keys, not rows)."""
    txt = plan_text(df)
    return "partial" in txt.lower() and "HashAggregate" in txt


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — wider/fewer is better; 0
    means the plan fell off the codegen path entirely. Uses the codegen
    explain mode because under AQE the pre-execution plan hides the
    codegen markers ("Found N WholeStageCodegen subtrees"). AQE is
    toggled off for the inspection (the adaptive wrapper defers codegen
    until execution); ``.selectExpr("*")`` forces a fresh QueryExecution
    planned under the temporary conf."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        txt = plan_text(df.selectExpr("*"), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    for line in txt.splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split("Found")[1].split("WholeStageCodegen")[0].strip())
    return 0


def forced_broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS (``F.broadcast(...)`` /
    ``/*+ BROADCAST */``) in the ANALYZED logical plan — the forced
    kind, as opposed to broadcasts Catalyst/AQE chooses from observed
    sizes. A forced hint on an unbounded (corpus-derived) table is an
    executor/driver OOM at 100 TB no matter what AQE does, so tests pin
    the exact hint count of plans that must only ever force provably
    tiny (1-row scalar) sides."""
    txt = df._jdf.queryExecution().analyzed().toString()
    return txt.count("ResolvedHint")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (AQE may still coalesce at runtime,
    but every Exchange is a potential full-data network pass at scale)."""
    return sum(
        1
        for line in plan_text(df, "simple").splitlines()
        if "Exchange" in line and "Reused" not in line
    )
