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

import functools
import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship yamr_spark to python workers via addPyFile (once per session).

    Operators that run python-side (mapInPandas/applyInPandas) close over
    functions cloudpickle serializes BY REFERENCE to this package, so the
    workers must be able to import it. The driver's session is vanilla
    (no PYTHONPATH for the python daemon), and on a real cluster the
    executors have no local checkout at all — addPyFile is the cluster
    answer (same mechanism as spark-submit --py-files), so it is also the
    local answer."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), f"yamr_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id)


def register(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
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
        "queries_multimodal",
        "queries_temporal",
        "queries_functions",
        "queries_compat",
        "queries_analytics",
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
