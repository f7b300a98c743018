"""Windowed event aggregation — batch and streaming forms of one logical
query, so streaming results are checkable against the batch plan (and
therefore against the DuckDB oracle the batch form registers).

Streaming design notes for the 100 TB / continuous case:
- Watermark bounds state: late rows beyond ``delay`` are dropped and
  window state older than the watermark is evicted, so state size is
  O(active windows × keys), independent of stream length.
- ``availableNow`` trigger gives exactly-once batch-catchup semantics for
  file sources (used by tests; in production the same query runs on a
  Kafka source unchanged).
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_event_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Batch form: per (window, event_type) count + exact value sum.

    window_start is exposed as timestamp_ntz to match the storage-side
    naive timestamps (and the DuckDB oracle's date_trunc)."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("event_cnt"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "event_cnt",
            "value_sum",
        )
    )


def sliding_user_activity(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Batch form of a sliding window: per (window, user) event count.
    Each event lands in width/slide windows (here 2)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("event_cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "user_id",
            "event_cnt",
        )
    )


def session_user_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch form of session windows: per-user sessions closed by ``gap``
    of inactivity. session_start = first event ts of the session (the
    window start Spark reports for session_window)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("event_cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "user_id",
            "event_cnt",
        )
    )


# Per-session snapshot of nanosAsLong taken when stream_events pins it,
# so restore_ns_conf restores (not clobbers) a caller's own pin and is a
# no-op when the stream never touched the conf.
_NS_CONF_PRIOR: dict = {}


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open the events table as a file-source STREAM with the same schema
    normalization as tables.table() (timestamp[ns] → timestamp_ntz)."""
    path = f"{sf_dir}/events.parquet"
    arrow_schema = pq.read_schema(path)
    ns_cols = [
        f.name
        for f in arrow_schema
        if str(f.type).startswith("timestamp[ns")
    ]
    from yamr_spark.tables import _read_parquet_ns

    # file streams need an explicit schema: derive it from a batch read
    # (nanosAsLong scoped to the read — see tables._read_parquet_ns)
    batch_schema = _read_parquet_ns(spark, path, bool(ns_cols)).schema
    # The streaming source re-resolves parquet footers against the explicit
    # schema, so the stream itself needs the conf for its whole lifetime;
    # pin it session-wide only when ns columns exist. The run_stream_*
    # drains are synchronous (availableNow + awaitTermination), and they
    # restore the conf on exit — so the session invariant outside an
    # active ns-stream stays identical to tables._read_parquet_ns's
    # scoped-per-read behavior.
    if ns_cols:
        try:
            prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        except Exception:
            prior = None
        _NS_CONF_PRIOR[spark] = prior
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The source path is a single parquet FILE. FileStreamSource force-sets
    # basePath to the source path itself for non-glob paths, and a file
    # basePath is rejected ("must be a directory") — so address the file via
    # a glob (matches exactly this file) and pin basePath to the directory.
    sdf = (
        spark.readStream.schema(batch_schema)
        .option("basePath", sf_dir)
        .parquet(path + "*")
    )
    for c in ns_cols:
        # TIMESTAMP (not NTZ): watermarks require it; session tz is UTC so
        # the post-aggregation NTZ cast preserves wall-clock values.
        # `div` not `/`: nanos exceed double's exact-integer range.
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Non-ns naive parquet timestamps (timestamp[us]/[ms]) arrive as
    # TIMESTAMP_NTZ; stream-stream joins and watermark plumbing require
    # TIMESTAMP (LTZ). Session tz is UTC, so the cast is value-preserving
    # and downstream NTZ output casts round-trip exactly.
    from pyspark.sql.types import TimestampNTZType

    for f in sdf.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            sdf = sdf.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return sdf


def streaming_tumbling_counts(
    spark: SparkSession, sf_dir: str, width: str = "1 hour", delay: str = "2 hours"
) -> DataFrame:
    """Streaming form of ``tumbling_event_counts`` with a watermark."""
    return tumbling_event_counts(
        stream_events(spark, sf_dir).withWatermark("ts", delay), width=width
    )


def restore_ns_conf(spark: SparkSession) -> None:
    """Restore the session invariant after a synchronous stream drain:
    ``stream_events`` pins nanosAsLong session-wide for the stream's
    lifetime (the file source re-resolves footers per micro-batch); once
    the availableNow drain returns, restore the pre-stream value (unset
    if it wasn't set) so unrelated batch reads see the same
    scoped-per-read behavior as tables._read_parquet_ns. No-op when the
    stream never pinned the conf (no ns columns)."""
    if spark not in _NS_CONF_PRIOR:
        return
    prior = _NS_CONF_PRIOR.pop(spark)
    if prior is None:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)


def run_stream_to_parquet(
    streaming_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain a streaming DataFrame to a parquet sink with a checkpoint —
    the production-shaped sink (exactly-once per file-source offset range;
    restarting with the same checkpoint resumes, never duplicates).
    availableNow processes everything currently available, then stops."""
    q = (
        streaming_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    restore_ns_conf(streaming_df.sparkSession)


def run_stream_to_memory(
    spark: SparkSession, streaming_df: DataFrame, name: str
) -> DataFrame:
    """Drain a streaming DataFrame with the availableNow trigger into an
    in-memory table; returns the completed result as a batch DataFrame."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    restore_ns_conf(spark)
    return spark.table(name)
