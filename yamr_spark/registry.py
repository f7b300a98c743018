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
        "queries_tpch",
    ):
        __import__(f"yamr_spark.{mod}")


_LOADED = False

# The driver's CORRECTNESS gate checks the FIRST 50 entries of queries()
# per round. Round-6 window policy (per the r05 verdict): (1) every
# query whose code/oracle CHANGED this round plus every NEW query goes
# first — these must earn fresh stamps; (2) the remaining ~33 slots
# backfill the STALEST stamps (the r01–r04-only tail the r05 verdict
# called out — with a 50-slot window the rotation needs ~2.4 rounds per
# full refresh, so the least-recently-stamped queries get this round's
# slots). Everything stays registered; only order changes.
DRIVER_PRIORITY = [
    # ---- the 50-slot r06 check window.
    # (1a) the two driver-ERR rows, now hex-projected so the driver's
    # canonicalizer can hash them (r05 verdict #1):
    "multimodal_thumbnails",
    "multimodal_frame_sample",
    # (1b) new in round 6:
    "hard_negative_mining_ivf",
    "ngram_repetition_profile",
    "neardup_triangles",
    "embedding_covariance",
    "top_event_paths",
    "quality_percentile_gate",
    "event_zscore_anomalies",
    "bigram_lm_score",
    "phrase_search_table_table",
    "recency_weighted_user_score",
    "equidepth_histogram",
    "kmv_set_ops_customers",
    "key_skew_report",
    "incremental_join_view_refresh",
    "ann_quantized_ivf_topk",
    "daily_resample_ffill",
    "sparse_cosine_pairs",
    "mad_outlier_report",
    "cdc_latest_state",
    "pareto_skyline_parts",
    "revenue_mom_growth",
    "streaming_windowed_topk",
    "llm_prep_pipeline_v3",
    "audio_frame_energy",
    "basket_type_lift",
    "quality_drift_psi",
    "containment_pairs",
    "repeat_purchase_interval",
    "daily_value_median_trend",
    "supplier_ship_latency",
    # (1c) code/oracle changed in round 6 (error-band contract, SCD2
    # insert branch, progressive PII counts, TakeOrdered vocab rank,
    # gopher zero-guard, LSH compaction + drain guard, upsert sweep):
    "approx_aggregates",
    "scd2_customer_history",
    "pii_redaction_stats",
    "vocab_coverage",
    "gopher_quality_filters",
    "streaming_lsh_incremental",
    "streaming_upsert_latest",
    # (2) changed late in round 6 (the ANSI try_divide sweep rewrote
    # every cosine expression in operators/similarity.py, and
    # domain_mix/quantize_stats gained denominator guards) — changed
    # plans outrank stale-but-unchanged stamps for the last slots.
    # One representative per changed code path, twins rotate to r07.
    "ann_brute_topk",
    "ann_quantized_topk",
    "embedding_near_dup",
    "semdedup",
    "srp_near_dup",
    "hard_negative_mining",
    "embedding_quantize_stats",
    "kmeans_centroids",
    "domain_mix_sample",
    "ann_ivf_topk",
    "ivf_assign",
    # ---- beyond slot 50: the changed-path twins and the displaced
    # r01–r04 stale backfill rotate into r07, then the rest
    "ann_ivf_kmeans_topk",
    "embedding_near_dup_p2",
    "important_part_value",
    "promo_revenue_share",
    "supplier_attr_counts",
    "discounted_brand_revenue",
    "excess_supply_suppliers",
    "nation_trade_volume",
    "top_supplier_revenue",
    "small_qty_part_revenue",
    "large_volume_customers",
    "rich_idle_customers",
    "minhash_signatures",
    "minhash_band_pairs",
    "streaming_tumbling_counts",
    "streaming_parquet_sink",
    "streaming_dedup_events",
    "streaming_enrich_dim",
    "streaming_event_passthrough",
    "split_store_train_counts",
    "benchmark_decontaminate",
    "max_value_per_year",
    "quota_sample_lang",
    "domain_mix_sample",
    "chunk_documents",
    "chunk_dup_stats",
    "corpus_curation",
    "corpus_version_diff",
    "llm_prep_pipeline",
    "quality_score",
    "unigram_lm_score",
    "window_session_user",
    "pivot_user_event_counts",
    "value_percentiles",
    "modality_interleave",
    "date_features",
    "sql_view_pipeline",
    "synthetic_source_stats",
    "observed_gate_metrics",
    "jsonl_roundtrip_stats",
    "top_words",
    "late_shipment_priority",
    "compacted_store_counts",
    "stats_moments",
    "string_features",
    "try_function_features",
    "bpe_learn_merges",
    "bpe_learn_merges_batched",
    "minhash_near_dup_parquet_staged",
    "funnel_stages",
    "cohort_retention",
    "embedding_quantize_stats",
    "ann_quantized_topk",
    "dedup_keep_best",
    "temperature_mixture_sample",
    "bpe_encode_stats",
    "schema_evolution_stats",
    "zorder_store_stats",
    "orc_roundtrip_stats",
    "hard_negative_mining",
    "ewma_user_value",
    "table_profile",
    "constraint_check_report",
    "value_histogram",
    "pagerank_near_dup",
    "incremental_agg_refresh",
    "export_manifest",
    "sorted_store_stats",
    "lang_id_eval",
    "simhash",
    "simhash_near_dup",
    "csv_roundtrip_stats",
    "word_count",
    "compat_word_count",
    "compat_year_max_region",
    "pricing_summary",
    "revenue_per_nation",
    "shipping_priority",
    "moving_stats_per_user",
    "nation_profit",
    "market_share",
    "cust_order_distribution",
    "min_cost_supplier",
    "waiting_suppliers",
    "dedup_exact",
    "dedup_incremental",
    "dedup_groups",
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "fuzzy_part_pairs",
    "ann_brute_topk",
    "ann_ivf_kmeans_topk",
    "srp_near_dup",
    "semdedup",
    "ivf_probe_partitioned",
    "tfidf_top_terms",
    "bm25_search",
    "kmv_distinct_orders",
    "benchmark_decontaminate_n3",
    "pack_sequences",
    "global_shuffle_stats",
    "llm_prep_pipeline_v2",
    "snapshot_time_travel",
    "streaming_session_windows",
    "multimodal_decode_stats",
    "variant_props_stats",
    "asof_click_purchase",
    "window_rank_family",
    "salted_dim_join",
]

# Queries not listed above keep their registration order AFTER the
# explicit list (see _prioritized) — they were stamped in the r01–r03
# registration-order windows. _ROTATION_TAIL makes them explicit so the
# round-7 window can rotate them in by name rather than rediscovering
# them; it is appended to DRIVER_PRIORITY below.
_ROTATION_TAIL = [
    "active_custkeys_intersect",
    "click_purchase_full",
    "combine_per_key",
    "cube_pricing",
    "customers_with_orders",
    "customers_without_orders",
    "dedup_lineitem_rows",
    "distinct_parts_per_flag",
    "doc_fingerprint",
    "embedding_norms",
    "forecast_revenue",
    "grouping_sets_pricing",
    "hash_split_counts",
    "inactive_custkeys_except",
    "json_props_stats",
    "jsonl_corrupt_handling",
    "kmeans_centroids",
    "kv_json_render",
    "lang_id",
    "math_price_features",
    "max_per_key",
    "multimodal_frame_counts",
    "multimodal_large_assets",
    "multimodal_meta",
    "ngram_novelty",
    "null_handling_props",
    "order_gap_days",
    "order_priority_counts",
    "order_value_buckets",
    "orders_above_avg",
    "orders_per_month",
    "part_name_search",
    "pii_scrub_stats",
    "range_click_near_purchase",
    "range_frame_revenue",
    "rank_customers_in_nation",
    "repetition_stats",
    "returned_revenue_by_customer",
    "rollup_pricing",
    "salted_value_sum",
    "sql_revenue_by_segment",
    "streaming_click_purchase_join",
    "streaming_user_stats",
    "sum_per_key",
    "supplier_nation_volume",
    "token_stats",
    "top_orders",
    "union_mapper_outputs",
    "window_sliding_activity",
    "window_tumbling_counts",
]
DRIVER_PRIORITY = DRIVER_PRIORITY + [
    n for n in _ROTATION_TAIL if n not in DRIVER_PRIORITY
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
