"""Stream-stream join: two watermarked streams joined on key + time
range — the streaming twin of operators/temporal.range_join_bucketed.

State-bound reasoning (the thing that makes this safe on an unbounded
stream): both sides carry a watermark and the join condition bounds
click_ts to [purchase_ts - window, purchase_ts], so Spark derives state
watermarks for both sides and evicts buffered rows older than
watermark + window. State is O(events inside the watermark horizon),
independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamr_spark.streaming.events import restore_ns_conf, stream_events


def streaming_click_purchase_join(
    spark: SparkSession,
    sf_dir: str,
    window_s: int = 3600,
    delay: str = "2 hours",
) -> DataFrame:
    """Purchases joined to same-user clicks in the preceding hour, both
    sides live streams; drained via availableNow to a memory sink."""
    purchases = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", delay)
    )
    clicks = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", delay)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            user_id = c_user_id
            AND click_ts >= purchase_ts - INTERVAL {window_s} SECONDS
            AND click_ts <= purchase_ts
            """
        ),
        "inner",
    ).select(
        "event_id",
        "user_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("ts"),
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("ts_r"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("streaming_click_purchase_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    restore_ns_conf(spark)
    return spark.table("streaming_click_purchase_join")
