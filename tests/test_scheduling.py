"""Spider-trap detection + recrawl priority (operators/scheduling.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from webcrawler_go_spark.operators.scheduling import (
    prune_trapped_frontier,
    recrawl_priority,
    spider_trap_scores,
    url_template,
)


def _discovered(spark):
    """40 trap URLs on h-trap (2 distinct contents, one template) + 10
    honest URLs on h-ok (unique content each) + a tiny template that
    clears the ratio but not the floor."""
    rows = [
        (f"https://h-trap.test/cal/2024/{i}", "h-trap.test", i % 2)
        for i in range(40)
    ]
    rows += [
        (f"https://h-ok.test/page/{i}", "h-ok.test", 100 + i) for i in range(10)
    ]
    rows += [(f"https://h-tiny.test/a/{i}", "h-tiny.test", 7) for i in range(5)]
    return spark.createDataFrame(rows, "url_norm string, host string, content_key long")


def test_trap_detection_golden(spark):
    out = {
        (r["host"], r["template"]): r
        for r in spider_trap_scores(_discovered(spark)).collect()
    }
    trap = out[("h-trap.test", "https://h-trap.test/cal/N/N")]
    assert trap["n_urls"] == 40 and trap["n_contents"] == 2
    assert trap["trap_ratio_milli"] == 20_000 and trap["is_trap"]
    ok = out[("h-ok.test", "https://h-ok.test/page/N")]
    assert ok["n_urls"] == 10 and ok["n_contents"] == 10
    assert ok["trap_ratio_milli"] == 1000 and not ok["is_trap"]
    # high ratio but below min_urls → not a trap (the floor guards
    # against flagging legitimately small mirrors)
    tiny = out[("h-tiny.test", "https://h-tiny.test/a/N")]
    assert tiny["trap_ratio_milli"] == 5000 and not tiny["is_trap"]


def test_template_collapses_all_digit_runs(spark):
    row = spark.range(1).select(
        url_template(F.lit("https://h1.test/2024/01/03?p=42&s=9")).alias("t")
    ).first()
    assert row["t"] == "https://hN.test/N/N/N?p=N&s=N"


def test_prune_trapped_frontier_broadcast_anti_join(spark):
    disc = _discovered(spark)
    traps = spider_trap_scores(disc).filter("is_trap")
    frontier = disc.select("url_norm", "host")
    kept = prune_trapped_frontier(frontier, traps)
    hosts = {r["host"] for r in kept.select("host").distinct().collect()}
    assert hosts == {"h-ok.test", "h-tiny.test"}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # templates are a small dim → the frontier must NOT shuffle
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def _caps(spark):
    """u-hot changes every capture; u-cold never; u-one has no history
    to estimate from; u-half changes on half its intervals."""
    rows = (
        [("u-hot", s, s) for s in range(1, 6)]
        + [("u-cold", s, 0) for s in range(1, 6)]
        + [("u-one", 1, 9)]
        + [("u-half", s, c) for s, c in [(1, 0), (2, 0), (3, 1), (4, 1), (5, 2)]]
    )
    return spark.createDataFrame(
        rows, "url_norm string, capture_seq long, content_key long"
    )


def test_recrawl_priority_golden(spark):
    out = {
        r["url_norm"]: r
        for r in recrawl_priority(_caps(spark), now_seq=8).collect()
    }
    hot = out["u-hot"]
    assert hot["n_caps"] == 5 and hot["n_changes"] == 4
    assert hot["lambda_milli"] == 1000 and hot["age"] == 3
    assert hot["priority_milli"] == math.floor(1000 * (1 - math.exp(-3.0)))
    assert hot["recrawl"]
    cold = out["u-cold"]
    assert cold["lambda_milli"] == 0 and cold["priority_milli"] == 0
    assert not cold["recrawl"]
    # single capture → zero evidence of change, lambda 0 by contract
    one = out["u-one"]
    assert one["n_caps"] == 1 and one["lambda_milli"] == 0 and one["age"] == 7
    half = out["u-half"]
    assert half["n_changes"] == 2 and half["lambda_milli"] == 500
    assert half["priority_milli"] == math.floor(1000 * (1 - math.exp(-0.5 * 3)))


def test_recrawl_single_exchange_on_url_key(spark):
    """The LAG window and the per-URL aggregate share the url_norm key:
    the plan must contain exactly ONE url-keyed exchange over the
    capture history (no second shuffle between window and groupBy)."""
    plan = (
        recrawl_priority(_caps(spark), now_seq=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("hashpartitioning(url_norm") == 1, plan


def _aimd_scalar(flags, n_rounds, base=10, mx=100):
    """Scalar reference fold for aimd_budgets."""
    b, nb = base, 0
    for r in range(n_rounds):
        if flags.get(r, False):
            b, nb = max(1, b // 2), nb + 1
        else:
            b = min(mx, b + 1)
    return b, nb


def test_aimd_budgets_laws(spark):
    """AIMD recurrence: clean history grows +1/round (capped), bad
    history halves to the floor of 1, missing rounds count clean, and
    an arbitrary mixed history matches the scalar fold exactly."""
    from webcrawler_go_spark.operators.scheduling import aimd_budgets

    rows = []
    # h-clean: 8 clean rounds; h-bad: 8 bad rounds; h-idle: no rows at
    # all (still must appear? no — aimd_budgets only emits hosts with
    # ≥1 row; give it one clean row); h-mix: deterministic mixed flags
    for r in range(8):
        rows.append(("h-clean", r, 100, 1, 0))        # 1% bad — clean
        rows.append(("h-bad", r, 100, 15, 10))        # 25% ≥ 20% — bad
        if r % 3 == 0:
            rows.append(("h-mix", r, 10, 2, 1))       # 30% — bad
        elif r % 3 == 1:
            rows.append(("h-mix", r, 10, 0, 0))       # clean
        # r % 3 == 2: missing → clean
    rows.append(("h-idle", 0, 50, 0, 0))
    hr = spark.createDataFrame(
        rows, "host string, round int, fetched long, errors long, blocked long"
    )
    out = {
        r["host"]: (r["budget"], r["n_bad_rounds"])
        for r in aimd_budgets(hr, n_rounds=8).collect()
    }
    assert out["h-clean"] == (18, 0)
    assert out["h-bad"] == (1, 8)           # 10→5→2→1→1... floor holds
    assert out["h-idle"] == (18, 0)         # 7 missing rounds are clean
    mix_flags = {r: (r % 3 == 0) for r in range(8)}
    assert out["h-mix"] == _aimd_scalar(mix_flags, 8)

    # cap law: max_budget clamps additive growth
    out2 = {
        r["host"]: r["budget"]
        for r in aimd_budgets(hr, n_rounds=8, base_budget=98, max_budget=100).collect()
    }
    assert out2["h-clean"] == 100
