"""A/B: sketch-driven width knobs vs manifest-count widths (r6 #7).

Runs the bench crawl world (4 rounds growing 1k → ~684k URLs/round,
the amortized regime BENCH_AMORTIZATION.json mapped) twice in one JVM —
adaptive_width OFF then ON — and prints one JSON line with per-round
times, urls/s, and the same-window host-calibration stamp so the pair
is comparable across rounds. The knobs only change physical widths
(fetch width cap, hot-host chunk, output file count, salt engagement);
the parity suites prove outputs identical either way.

Usage: python tools/adaptive_bench.py [--quick]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def run(spark, adaptive: bool, world, cfg, n_seeds: int) -> dict:
    from webcrawler_go_spark.plans.frontier_loop import CrawlEngine
    from webcrawler_go_spark.worldgen import seeds as gen_seeds

    state = tempfile.mkdtemp(prefix=f"ab-{'on' if adaptive else 'off'}-")
    try:
        eng = CrawlEngine(
            spark, cfg, state, world=world, salted="auto",
            collect_stats=False, adaptive_width=adaptive,
        )
        eng.seed(
            spark.createDataFrame(
                gen_seeds(world, n_seeds), "url string, priority double, seq int"
            )
        )
        t0 = time.perf_counter()
        round_times, fetched = [], 0
        for r in range(cfg.max_rounds):
            tr = time.perf_counter()
            st = eng.run_round(r)
            round_times.append(round(time.perf_counter() - tr, 2))
            fetched += st.scheduled
        secs = time.perf_counter() - t0
        return {
            "adaptive": adaptive,
            "rounds": round_times,
            "secs": round(secs, 2),
            "urls": fetched,
            "urls_per_sec": round(fetched / secs, 1),
        }
    finally:
        shutil.rmtree(state, ignore_errors=True)


def main() -> None:
    quick = "--quick" in sys.argv
    from bench import host_ceiling_stamp
    from webcrawler_go_spark.config import CrawlConfig
    from webcrawler_go_spark.session import get_spark
    from webcrawler_go_spark.worldgen import World

    if quick:
        world = World(n_hosts=400, pages_per_host=400, max_links=30)
        cfg = CrawlConfig(max_rounds=4, default_host_budget=2000)
        n_seeds = 256
    else:
        world = World(n_hosts=4000, pages_per_host=4000, max_links=30)
        cfg = CrawlConfig(max_rounds=4, default_host_budget=20000)
        n_seeds = 1024

    spark = get_spark(
        app_name="adaptive-ab", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (JIT + codegen + Python workers) so neither arm pays it
    warm_world = World(n_hosts=16, pages_per_host=60, max_links=8)
    warm_cfg = CrawlConfig(max_rounds=2, default_host_budget=100)
    run(spark, False, warm_world, warm_cfg, 8)

    off = run(spark, False, world, cfg, n_seeds)
    on = run(spark, True, world, cfg, n_seeds)
    out = {
        "world": "quick" if quick else "684k",
        "off": off,
        "on": on,
        "speedup": round(off["secs"] / on["secs"], 3),
        "ceiling": host_ceiling_stamp(32),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
