"""applyInPandasWithState sessionization: closed sessions emitted by the
stateful streaming operator must match the batch sessionizer for every
session that the watermark has sealed."""

from __future__ import annotations

import shutil

from webcrawler_go_spark.operators.events import sessionize
from webcrawler_go_spark.streaming.frontier_stream import stream_sessionize_stateful

SF = "/root/testdata/sf0.001"


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(events.schema).parquet(str(src))

    q = (
        stream_sessionize_stateful(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions_stateful")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.sql("SELECT * FROM sessions_stateful").collect()
    }

    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in sessionize(events, gap_minutes=30).collect()
    }
    # the stream's final watermark leaves trailing sessions open: every
    # emitted session must exist in the batch result with equal counts,
    # and emitted sessions must dominate (most sessions are sealed)
    assert got, "stateful operator emitted nothing"
    for k, n in got.items():
        assert batch.get(k) == n, k
    assert len(got) >= len(batch) * 0.5
