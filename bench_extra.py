"""Round-8 isolation bench (guide §1.4): times individual declared
queries with the noop sink, same methodology as bench.py (one warm
build+noop, then a timed noop), without running the whole headline list.

Usage: python bench_extra.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's r7 measurement
scale), SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPEATS (default 1).

This file is NOT the driver contract — bench.py stays frozen; numbers
from here are cited in OPTIMIZATION_r08.md as isolation evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))
    names = sys.argv[1:]

    from webcrawler_go_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    rebuild_timed = {"webdata_pipeline"}
    timings: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            if name in rebuild_timed:
                df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = runs
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
