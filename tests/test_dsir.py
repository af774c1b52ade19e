"""DSIR importance resampling: selection invariants + semantic direction."""

import pandas as pd
from pyspark.sql import functions as F

from webcrawler_go_spark.operators.dsir import dsir_importance


def _run(spark, rows, frac=0.5, buckets=64):
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    return dsir_importance(
        docs,
        target_pred=(F.col("doc_id") % 7 == 0),
        n_buckets=buckets,
        select_frac=frac,
    ).collect()


def test_selection_invariants(spark):
    rows = [(i, f"common word doc number {i} alpha beta") for i in range(21)]
    out = _run(spark, rows, frac=0.5)
    assert len(out) == 21
    raw = [r for r in out if not r.is_target]
    assert sum(r.selected for r in out) == len(raw) // 2
    assert not any(r.selected for r in out if r.is_target)
    # selection is exactly the top-(weight, doc_id) prefix of raw docs
    order = sorted(raw, key=lambda r: (-r.logweight_milli, r.doc_id))
    k = len(raw) // 2
    assert all(r.selected for r in order[:k])
    assert not any(r.selected for r in order[k:])


def test_target_like_raw_docs_outscore_disjoint(spark):
    """Raw docs sharing the target domain's vocabulary must carry higher
    importance weight than vocabulary-disjoint raw docs — the entire
    point of the method."""
    target_text = "solar panel inverter grid energy storage battery"
    rows = []
    for i in (0, 7, 14):  # targets (doc_id % 7 == 0)
        rows.append((i, target_text))
    like = [1, 2, 8]
    for i in like:
        rows.append((i, "solar energy battery storage report"))
    unlike = [3, 4, 9]
    for i in unlike:
        rows.append((i, "recipe butter flour sugar oven cake"))
    out = {r.doc_id: r for r in _run(spark, rows, frac=0.5)}
    worst_like = min(out[i].logweight_milli for i in like)
    best_unlike = max(out[i].logweight_milli for i in unlike)
    assert worst_like > best_unlike
    # per-instance normalization isn't applied, so also check the
    # direction survives length: every like doc selected before any unlike
    assert all(out[i].selected for i in like)
    assert not any(out[i].selected for i in unlike)


def test_empty_text_scores_zero(spark):
    rows = [(i, "shared words here") for i in range(6)] + [(6, "")]
    out = {r.doc_id: r for r in _run(spark, rows, frac=0.3)}
    assert out[6].n_features == 0 and out[6].logweight_milli == 0
