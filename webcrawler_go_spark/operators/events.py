"""Event-stream analytics as batch DataFrame ops (SURVEY §2.10: the
reference's continuous process maps to a batch-iterative loop; these are
the windowed/stateful building blocks, each with a Structured Streaming
twin in streaming/frontier_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows per event_type: count + value sum.
    Batch twin of ``groupBy(window('ts', ...))`` in Structured Streaming
    (floor-bucketing keeps the oracle SQL identical)."""
    bucket = (F.unix_timestamp("ts") / (minutes * 60)).cast("long")
    return (
        events.groupBy(
            bucket.alias("win_id"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 4)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.timestamp_seconds(F.col("win_id") * minutes * 60).alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds the gap. Returns per-session
    (user_id, session_id, n_events, session_start, session_end).
    Batch twin of applyInPandasWithState session windows."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = gap_minutes * 60
    with_prev = events.withColumn("prev_ts", F.lag("ts").over(w))
    new_session = (
        F.col("prev_ts").isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > gap)
    )
    sessions = with_prev.withColumn(
        "session_id",
        F.sum(F.when(new_session, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def error_rate_by_window(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Derived-rate pattern over windows: error share per window (the
    reference's live stats ticker, crawler.go:338-373, as event-time
    windows)."""
    bucket = (F.unix_timestamp("ts") / (minutes * 60)).cast("long")
    return (
        events.groupBy(bucket.alias("win_id"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
        .select(
            F.timestamp_seconds(F.col("win_id") * minutes * 60).alias("win_start"),
            "n_total",
            "n_errors",
            F.round(F.col("n_errors") / F.col("n_total"), 6).alias("error_rate"),
        )
    )
