"""Delay-derived budgets + crawl parity under varied shuffle
partitioning (SURVEY §7.4 risk #1: order is data-derived, not
partitioning-derived)."""

from __future__ import annotations

from webcrawler_go_spark.config import CrawlConfig
from webcrawler_go_spark.operators.politeness import budgets_from_delay
from webcrawler_go_spark.oracle import sequential
from webcrawler_go_spark.plans.frontier_loop import CrawlEngine
from webcrawler_go_spark.worldgen import World, seeds as gen_seeds


def test_budgets_from_delay(spark):
    b = spark.createDataFrame(
        [("a.test", 100, 50), ("b.test", 5, 1000), ("c.test", 100, 0)],
        "host string, max_fetches_per_round int, crawl_delay_ms int",
    )
    got = {r.host: r.max_fetches_per_round for r in budgets_from_delay(b, 1).collect()}
    # a: 1000ms/50ms = 20 < 100 → 20; b: 1000/1000 = 1 < 5 → 1; c: delay 0 → cap
    assert got == {"a.test": 20, "b.test": 1, "c.test": 100}


def test_parity_across_shuffle_partitioning(spark, state_dir):
    """The crawl order is fully data-derived: running the identical crawl
    with a pathological shuffle-partition setting (2) must produce the
    same seen set and per-host sequences as the oracle."""
    world = World(n_hosts=6, pages_per_host=30)
    cfg = CrawlConfig(max_rounds=3, default_host_budget=6)
    seeds = gen_seeds(world, 3)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        eng = CrawlEngine(spark, cfg, state_dir, world=world, salted=True)
        eng.run(
            spark.createDataFrame(seeds, "url string, priority double, seq int"),
            max_rounds=3,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    oracle = sequential.crawl(world, seeds, cfg, max_rounds=3)
    assert {r.url_norm for r in eng.url_seen().collect()} == oracle.seen
    seqs = {r["host"]: r["fetch_sequence"] for r in eng.per_host_sequences().collect()}
    assert seqs == oracle.sequences
