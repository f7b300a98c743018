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
    """Import every module that registers queries (side-effect imports).

    Imports are unconditional: a broken query module must fail LOUDLY here,
    not silently shrink the registry (and with it the driver's correctness
    gate). All ten modules exist; there is no 'not built yet' state."""
    for mod in (
        "queries_core",
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
        "queries_curation",
    ):
        __import__(f"yamr_spark.{mod}")


_LOADED = False

# The driver's CORRECTNESS gate checks the FIRST 50 entries of queries()
# per round. Round 1 green-checked registrations 1-50 (core, relational,
# dedup, similarity, text); this list front-loads the 30 queries that had
# no driver row in round 1 — streaming, multimodal, temporal, functions,
# compat, analytics — plus this round's new queries, then backfills with
# one representative per already-green family so regressions in the core
# plans still surface. Everything stays registered; only order changes.
DRIVER_PRIORITY = [
    # round-3 new: curation family + flagship pipeline + jsonl (no
    # driver row yet)
    "llm_prep_pipeline",
    "split_store_train_counts",
    "jsonl_roundtrip_stats",
    "jsonl_corrupt_handling",
    "pii_scrub_stats",
    "benchmark_decontaminate",
    "chunk_dup_stats",
    "hash_split_counts",
    "quota_sample_lang",
    "ngram_novelty",
    # round-3 changed plans — re-verify under the driver this round
    "ngram_jaccard_pairs",
    "repetition_stats",
    "ivf_probe_partitioned",
    "streaming_parquet_sink",
    # round-1 unchecked: compat (the reference's core C7/C8 hook)
    "compat_word_count",
    "compat_year_max_region",
    # round-1 unchecked: temporal joins
    "asof_click_purchase",
    "range_click_near_purchase",
    # round-1 unchecked: streaming (batch window twins + stream paths)
    "window_tumbling_counts",
    "streaming_tumbling_counts",
    "window_sliding_activity",
    "window_session_user",
    "streaming_user_stats",
    "streaming_click_purchase_join",
    "streaming_dedup_events",
    "streaming_event_passthrough",
    "streaming_parquet_sink",
    # round-1 unchecked: multimodal
    "multimodal_meta",
    "multimodal_large_assets",
    "multimodal_decode_stats",
    "multimodal_thumbnails",
    "multimodal_frame_sample",
    "multimodal_frame_counts",
    # round-1 unchecked: functions / skew / analytics
    "salted_value_sum",
    "orders_per_month",
    "part_name_search",
    "order_value_buckets",
    "math_price_features",
    "sql_revenue_by_segment",
    "null_handling_props",
    "json_props_stats",
    "pivot_user_event_counts",
    "grouping_sets_pricing",
    "value_percentiles",
    "approx_aggregates",
    # new this round
    "embedding_near_dup_p2",
    "ivf_probe_partitioned",
    "repetition_stats",
    "streaming_enrich_dim",
    # already-green representatives: one per plan family
    "word_count",
    "max_value_per_year",
    "pricing_summary",
    "revenue_per_nation",
    "shipping_priority",
    "moving_stats_per_user",
    "dedup_exact",
    "minhash_near_dup",
    "dedup_groups",
    "simhash_near_dup",
    "ngram_jaccard_pairs",
    "ann_brute_topk",
    "ann_ivf_topk",
    "tfidf_top_terms",
    "corpus_curation",
]


def _prioritized(d: dict) -> dict:
    head = {n: d[n] for n in DRIVER_PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    global _LOADED
    if not _LOADED:
        _load_query_modules()
        _LOADED = True
    return _prioritized(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return _prioritized(ORACLES)
