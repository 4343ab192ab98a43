"""Structured Streaming surface (SURVEY.md §7 phase 4).

Maps the reference's delivery loop onto Spark's incremental execution:
- R1 (HTTP ingest)      -> readStream file/Kafka source
- R8 (delivery watermark LastSentT) -> withWatermark: the reference's
  "no event ever appears in the past" contract (model/eventStream.go:73-75,
  SURVEY.md §1.4.2) is exactly Spark's watermark contract
- R9 (delta query)      -> micro-batch incremental delivery itself
- R3 (ticks)            -> derived tick column on event time
- sessions (R4/R5)      -> session_window on event time

These are thin declarative layers — all the load-bearing custom logic
lives in stateful.client_registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from goeventstream_spark.operators.stream_ops import tick_col

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over the event envelope. At cluster
    scale the same shape reads Kafka; the schema is fixed (the
    reference's envelope is fixed too — model/event.go:7-12)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 day", slide: str | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling (or sliding) windowed counts per event type with a
    late-data watermark."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "10 seconds", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows: the streaming form of the 10 s-gap
    client-liveness semantics (model/game.go:12,17)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def delta_delivery(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Streaming R9: every micro-batch IS the delta scan — rows flow
    exactly once, tick-stamped, never behind the watermark. The
    incremental form of stream_ops.delta_scan.

    The watermark is ENFORCED, not just annotated: a watermark on a
    stateless projection filters nothing in Spark (only stateful
    operators consult it), so the dedup-within-watermark below is what
    actually drops a row arriving behind the watermark (and any
    source-side replay of an already-delivered event_id) — the R8
    no-late-data guarantee (model/eventStream.go:52,73-75)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .withColumn("t", tick_col(F.col("ts")))
        .select("t", "event_id", "user_id", "event_type", "props")
    )


def rolling_active_firsts(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Streaming side of the batch ``rolling_active_users_7d`` query:
    watermarked first-occurrence dedup per (day, user) — the only
    stateful step, whose state is O(active users x 7 days), never
    O(events) — followed by the same map-side fan-out of each pair to
    the 7 trailing-window days it keeps alive. Each (day, user) pair is
    emitted exactly once, so a downstream per-day COUNT DISTINCT of
    user_id over the emitted rows reproduces WAU7 exactly (the distinct
    is still needed: one user can appear on several source days inside
    one target window).

    Day boundaries are the same epoch-integer math as the batch query.
    With the default 0s watermark and in-order replay the dedup is
    exact. State-eviction contract at scale: plain ``dropDuplicates``
    keys that exclude the event-time column are NEVER evicted —
    swap to ``dropDuplicatesWithinWatermark(["day", "user_id"])`` with
    a watermark of one day plus the real lateness bound, which is
    exactly equivalent here (any duplicate of a (day, user) pair
    arrives within a day-boundary of its first occurrence) and keeps
    state bounded to the watermark window.
    """
    dedup = (
        events.withWatermark("ts", watermark)
        .select(
            F.expr("unix_millis(ts) DIV 86400000").alias("day"),
            "user_id",
            "ts",
        )
        .dropDuplicates(["day", "user_id"])
    )
    return dedup.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("d"),
        F.col("day").alias("src_day"),
        "user_id",
    )
