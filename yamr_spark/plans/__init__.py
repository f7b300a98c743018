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


def single_partition_window_count(df: DataFrame) -> int:
    """Number of Window operators fed by an ``Exchange SinglePartition``
    — i.e. windows that funnel their whole input through ONE task.

    The Exchange-SinglePartition counter alone under-counts the risk
    class: a 1-row scalar aggregate and a global window both plan a
    SinglePartition exchange, but only the window sorts/streams an
    unbounded input through one task. This walks each Window node's
    unary input chain (Sort/Project/Filter/WindowGroupLimit/codegen
    wrappers) to the first non-pass-through child; a hit means the
    window is global and its input cardinality must be bounded by
    construction (every sanctioned site is pinned in
    ALLOWED_SINGLE_PARTITION_WINDOWS)."""
    import re

    lines = plan_text(df, "simple").splitlines()
    parsed = []
    for ln in lines:
        m = re.match(r"^([ :+\-]*)(?:\*\(\d+\)\s*)?(.*)$", ln)
        parsed.append((len(m.group(1)), m.group(2)))
    passthrough = ("Sort ", "Sort[", "Project ", "Project[", "Filter ",
                   "Filter[", "WindowGroupLimit ", "ColumnarToRow",
                   "InputAdapter")
    count = 0
    for i, (depth, node) in enumerate(parsed):
        if not node.startswith("Window "):
            continue
        for d2, n2 in parsed[i + 1:]:
            if d2 <= depth and n2:
                break  # left the window's subtree
            if not n2:
                continue
            if n2.startswith(passthrough):
                continue
            if n2.startswith("Exchange SinglePartition"):
                count += 1
            break  # first non-pass-through child decides
    return count


# Sanctioned single-partition-window sites (VERDICT r10 #3): every
# bench-headline query whose plan runs a Window fed by an Exchange
# SinglePartition, each audited cardinality-BOUNDED by construction.
# tests/test_plans.py pins the sweep to exactly this set, so an
# unbounded global window cannot sneak into a headline plan unnoticed.
# NOTE the detector deliberately does NOT flag windows fed by
# GlobalLimit/TakeOrdered (limit-capped seed/candidate tables — the
# vocab_coverage / codebook / mmr class): a limit bounds the input
# STRUCTURALLY, which is exactly the guarantee this audit exists to
# check. Only windows whose single-partition input has no structural
# bound — i.e. "bounded by aggregation grain" arguments — need the
# human-audited allowlist below.
ALLOWED_SINGLE_PARTITION_WINDOWS: dict[str, str] = {
    # month/day aggregate outputs ranked/lagged globally: input is the
    # GROUP-BY output, bounded by the calendar grain, not corpus size
    "revenue_mom_growth": "one row per month (queries_analytics)",
    "daily_value_median_trend": "one row per day (queries_analytics)",
    # cross-band running max over the band-aggregate table: one row per
    # price band (value-range / band_width), not per part
    "pareto_skyline_parts": "one row per price band (skyline_2d)",
}
