"""Query registry — the driver-facing inventory of implemented operators.

Every operator from SURVEY.md §2 (and the north-star extensions) gets a
named entry: a ``(spark, sf_dir) -> DataFrame`` callable plus, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle string the driver runs
side-by-side at sf=0.01. Column names/types are aligned on both sides
(the driver hashes values after sorting columns by name).

Use ``@register("name", oracle="SELECT ...")`` to add entries;
``__spark_entry__.py`` re-exports the dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_query_modules() -> None:
    """Import every module that registers queries (side-effect imports)."""
    from yamr_spark import queries_core  # noqa: F401

    for mod in (
        "queries_relational",
        "queries_dedup",
        "queries_similarity",
        "queries_text",
        "queries_streaming",
    ):
        try:
            __import__(f"yamr_spark.{mod}")
        except ImportError:
            pass  # module not built yet (build plan accretes round by round)


_LOADED = False


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    global _LOADED
    if not _LOADED:
        _load_query_modules()
        _LOADED = True
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLES)
