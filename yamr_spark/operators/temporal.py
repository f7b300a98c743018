"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference has no joins at all (SURVEY.md §2.4); these are the two
time-series join shapes a training-data/event pipeline actually needs,
implemented as compositions of built-in DataFrame ops (per the
custom-operator ladder: composition > pandas UDF > mapPartitions).

- **as-of join**: union-both-sides + one window pass. ONE shuffle on the
  join keys, no per-row python, no broadcast requirement on either side —
  this is the formulation that survives 100 TB (both sides can be huge;
  skew follows the key distribution and AQE handles it).
- **range join**: time-bucketed equi-join. A naive ``l.ts BETWEEN r.ts+a
  AND r.ts+b`` join is a nested-loop/cartesian per key at scale; bucketing
  turns it into an equi-join on (key, bucket) with a post-filter, at the
  cost of exploding each left row into O((b-a)/bucket + 1) bucket probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, the values of
    the latest right row with the same ``on`` keys and
    ``right_ts <= left_ts``; nulls when no such row exists.

    Plan shape: tag sides → unionByName → window(last, ignoreNulls) over
    (keys, ts) → keep left rows. At equal timestamps the right row sorts
    first (``__is_left`` tiebreak), so the match is inclusive — the same
    convention as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
    """
    if right_values is None:
        right_values = [c for c in right.columns if c not in on and c != right_ts]
    out_cols = [f"{c}{suffix}" for c in right_values]

    l2 = left.withColumn("__asof_ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_values],
    ).withColumn("__is_left", F.lit(0))

    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in out_cols:
        u = u.withColumn(c, F.last(F.col(c), True).over(w))
    return u.where(F.col("__is_left") == 1).drop("__is_left", "__asof_ts")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -3600,
    upper_s: int = 0,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join of left to every right row with the same keys and
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (seconds).

    Each left row probes the ``(upper_s - lower_s)/bucket_s + 1`` time
    buckets its window can touch (``sequence`` + ``explode``); each right
    row sits in exactly one bucket, so every qualifying pair joins exactly
    once and the equi-join on (keys, bucket) shuffles both sides once.
    Column collisions: right's ts arrives as ``<right_ts>_r``.
    """
    # ntz → timestamp → long (epoch s): ntz has no direct long cast; the
    # intermediate cast is wall-clock-preserving under the UTC session tz
    lsec = F.col(left_ts).cast("timestamp").cast("long")

    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((lsec + F.lit(lower_s)) / bucket_s),
                F.floor((lsec + F.lit(upper_s)) / bucket_s),
            )
        ),
    )
    rb = right.withColumnRenamed(right_ts, f"{right_ts}_r").withColumn(
        "__bucket", F.floor(F.col(f"{right_ts}_r").cast("timestamp").cast("long") / bucket_s)
    )
    joined = lb.join(rb, on=on + ["__bucket"], how="inner")
    rr = F.col(f"{right_ts}_r").cast("timestamp").cast("long")
    return joined.where(
        (rr >= lsec + F.lit(lower_s)) & (rr <= lsec + F.lit(upper_s))
    ).drop("__bucket")


def ewma_user_value(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value`` in
    event-time order (trend smoothing / anomaly baselines): a
    sequential left fold, which SQL windows can't express — done as
    ``aggregate()`` over the per-user event list, sorted by
    (ts, event_id) for tie determinism. acc starts at the first value,
    then acc = α·x + (1−α)·acc.

    Scale: state is ONE user's events (collect_list bounded by
    events-per-entity — the same per-key-bounded assumption every
    sessionizer makes; a user with unbounded history would need
    windowed chunking). The fold is JVM expression code; the
    ``ewma_user_value_pandas`` twin runs the identical recurrence as a
    grouped-map applyInPandas (Arrow-batched) and is test-pinned equal
    — the template for per-entity sequential logic that outgrows
    expression lambdas."""
    arr = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", F.col("value").alias("v")))
    )
    a, b = float(alpha), 1.0 - float(alpha)
    fold = (
        f"aggregate(__arr, cast(null as double), "
        f"(acc, x) -> if(acc is null, x.v, {a!r}d * x.v + {b!r}d * acc))"
    )
    return (
        events.groupBy("user_id")
        .agg(arr.alias("__arr"))
        .select(
            "user_id",
            F.size("__arr").cast("long").alias("n_events"),
            F.round(F.expr(fold), 6).alias("ewma"),
        )
    )


def ewma_user_value_pandas(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """The grouped-map (applyInPandas) twin of ``ewma_user_value``:
    identical recurrence, executed in Python over Arrow record batches
    — one group = one user's events in worker memory. Exists to pin
    the Arrow grouped-map seam with an exactly-comparable JVM
    reference (see tests/test_temporal.py)."""
    import pandas as pd

    a = float(alpha)

    def _ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        acc = None
        for v in pdf["value"]:
            acc = float(v) if acc is None else a * float(v) + (1.0 - a) * acc
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [round(acc, 6) if acc is not None else None],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        _ewma, "user_id bigint, n_events bigint, ewma double"
    )
