"""Custom stateful streaming operator: applyInPandasWithState.

The built-in windowed aggregations (streaming/events.py) cover
time-keyed state; this is the ESCAPE HATCH for operators Spark doesn't
ship — arbitrary per-key state machines over a stream (running counters,
fraud scoring, custom sessionization). The reference has nothing like it
(SURVEY.md §2.4); it's the streaming twin of the C7 generic-reducer hook.

Scale notes: state lives in the state store keyed by user_id (RocksDB-
backed on a real cluster), one entry per key — O(distinct keys), not
O(events). Emission is outputMode=update: a row per key per micro-batch
it changed in, so downstream must treat output as upserts (the
``latest_user_stats`` collapse below does exactly that, keyed on the
monotone event_cnt)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from yamr_spark.streaming.events import restore_ns_conf, stream_events

OUTPUT_SCHEMA = "user_id long, event_cnt long, value_sum double"
STATE_SCHEMA = "cnt long, vsum double"


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import math

    cnt, vsum = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        # fsum: exact (correctly-rounded) accumulation within the batch, so
        # the sum does not depend on row arrival order inside a micro-batch
        vsum = math.fsum([vsum, *pdf["value"].tolist()])
    state.update((cnt, vsum))
    yield pd.DataFrame({"user_id": [key[0]], "event_cnt": [cnt], "value_sum": [vsum]})


def streaming_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running (count, value-sum) via explicit state;
    drained with availableNow into a memory sink and collapsed to the
    LATEST update per key (event_cnt is monotone, so max(struct) picks
    the final state even if the source splits into many micro-batches)."""
    sdf = stream_events(spark, sf_dir)
    updates = sdf.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("streaming_user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    restore_ns_conf(spark)
    return (
        spark.table("streaming_user_stats")
        .groupBy("user_id")
        .agg(F.max(F.struct("event_cnt", "value_sum")).alias("s"))
        .select(
            "user_id",
            F.col("s.event_cnt").alias("event_cnt"),
            # 6 dp on both sides (oracle rounds too): float sums are
            # order-dependent at ~1e-13, which would flake a value-hash
            F.round(F.col("s.value_sum"), 6).alias("value_sum"),
        )
    )


def streaming_dedup_events(spark: SparkSession, sf_dir: str, delay: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on event_id —
    the stream form of exact_dedup. State holds one entry per key seen
    within the watermark horizon and is evicted past it, so duplicate
    suppression is bounded-state even on an unbounded stream (a global
    dropDuplicates on a stream would grow state forever)."""
    sdf = stream_events(spark, sf_dir).withWatermark("ts", delay)
    deduped = sdf.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "event_type", "value"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("streaming_dedup_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    restore_ns_conf(spark)
    return spark.table("streaming_dedup_events")
