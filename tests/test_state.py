"""SnapshotTable: atomic commits, time travel, lineage metrics, expiry."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StructField, StructType

from webcrawler_go_spark.state import SnapshotTable

SCHEMA = StructType([StructField("x", LongType(), False)])


def _t(spark, state_dir):
    return SnapshotTable(state_dir, "t", SCHEMA).init(spark)


def test_append_and_time_travel(spark, state_dir):
    t = _t(spark, state_dir)
    m1 = t.commit(spark.range(3).selectExpr("id as x"))
    m2 = t.commit(spark.range(10, 12).selectExpr("id as x"))
    assert t.read().count() == 5
    assert t.read(m1["snapshot_id"]).count() == 3  # time travel
    assert m2["parent"] == m1["snapshot_id"]
    assert m2["total_rows"] == 5 and m2["new_rows"] == 2
    assert sum(m2["file_rows"].values()) == 2  # per-partition lineage


def test_replace_mode(spark, state_dir):
    t = _t(spark, state_dir)
    t.commit(spark.range(3).selectExpr("id as x"))
    m = t.commit(spark.range(1).selectExpr("id as x"), mode="replace")
    assert t.read().count() == 1
    assert m["total_rows"] == 1


def test_expire_snapshots(spark, state_dir):
    t = _t(spark, state_dir)
    t.commit(spark.range(3).selectExpr("id as x"), mode="replace")
    t.commit(spark.range(4).selectExpr("id as x"), mode="replace")
    t.commit(spark.range(5).selectExpr("id as x"), mode="replace")
    assert len(t.snapshots()) == 3
    removed = t.expire_snapshots(keep_last=1)
    assert removed > 0
    assert len(t.snapshots()) == 1
    assert t.read().count() == 5  # head untouched
    # all surviving files exist
    for f in t.current_snapshot()["files"]:
        assert os.path.exists(f)
