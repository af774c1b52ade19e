"""Streaming equivalents (SURVEY.md §2.10).

The reference is a continuous concurrent process; our engine is a
batch-iterative loop. Structured Streaming expresses the same dataflow
when a crawl must be *continuous* rather than round-based:

* ``stream_window_counts`` — event-time tumbling windows + watermark
  over a fetch-log / event stream (the live stats ticker,
  crawler.go:338-373, with late-data semantics).
* ``run_frontier_foreach_batch`` — ``foreachBatch`` driving ONE engine
  round per micro-batch: the frontier loop hosted by the streaming
  scheduler instead of a Python for-loop. State still lives in the
  snapshot tables, so exactly-once resume carries over unchanged.

Both are exercised by tests with file sources + availableNow triggers
(bounded, deterministic)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed counts + value sum with a watermark for late data."""
    # watermarks require TIMESTAMP (parquet often yields TIMESTAMP_NTZ);
    # session TZ is pinned to UTC so the cast preserves the instant
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 4)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            key_col,
            "n_events",
            "value_sum",
        )
    )


def stream_sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` — per-user session state carried across
    micro-batches, sessions emitted on gap timeout (the streaming twin of
    operators/events.sessionize; the reference's cookie/session state,
    crawler.go:640-645, is the same shape of per-key iteration state).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start long, last long, n long"
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return
        rows = []
        ts_all = []
        for pdf in pdf_iter:
            ts_all.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
        ts_all.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = ts_all[0]
            n = 0
        for t in ts_all:
            if t - last > gap_us:
                rows.append((user_id, start, last, n))
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        ).assign(
            session_start=lambda d: pd.to_datetime(d["session_start"], unit="us"),
            session_end=lambda d: pd.to_datetime(d["session_end"], unit="us"),
        )

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_frontier_foreach_batch(
    engine,
    seeds_stream: DataFrame,
    checkpoint_dir: str,
    max_rounds_per_batch: int = 1,
):
    """Host the frontier loop under Structured Streaming: each incoming
    micro-batch of seed URLs is folded into the engine's frontier and one
    round is executed. Returns the StreamingQuery (caller awaits).

    The engine's snapshot-table state (not Spark streaming state) is the
    source of truth — a crashed query resumes from the last committed
    round, so end-to-end semantics match the batch loop exactly."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        head = engine.frontier_t.current_snapshot()
        if head is None:
            engine.seed(batch_df)
            start = 0
        else:
            # EVERY micro-batch folds into the frontier — late seed
            # batches append at the current round (dedup against
            # url_seen happens naturally at the next round's anti-join)
            start = head["lineage"].get("round", 0)
            engine.seed(batch_df, mode="append", at_round=start)
        engine.resume(start_round=start, max_rounds=start + max_rounds_per_batch)

    return (
        seeds_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
