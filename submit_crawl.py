"""Cluster entry point for spark-submit (north rule).

    spark-submit --py-files dist/webcrawler_go_spark.zip submit_crawl.py \
        --seeds <seeds parquet: url,priority,seq> \
        --state <state dir (DBFS/S3/HDFS-compatible for data; manifests
                 need a shared POSIX path or an Iceberg catalog in prod)> \
        --rounds 20 [--budget 20] [--salted] [--backend synthetic|http]

On a cluster, `master` comes from spark-submit; locally it falls back to
local[*]. Resume: re-run with the same --state — the engine continues
from the last committed snapshot.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from webcrawler_go_spark.config import CrawlConfig
from webcrawler_go_spark.plans.frontier_loop import CrawlEngine


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", required=True)
    p.add_argument("--state", required=True)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--budget", type=int, default=20)
    p.add_argument("--salted", action="store_true")
    p.add_argument("--backend", default="synthetic")
    args = p.parse_args()

    spark = SparkSession.builder.appName("webcrawler-go-spark").getOrCreate()
    cfg = CrawlConfig(max_rounds=args.rounds, default_host_budget=args.budget)
    eng = CrawlEngine(
        spark, cfg, args.state, fetch_backend=args.backend, salted=args.salted
    )
    head = eng.frontier_t.current_snapshot()
    if head is None:
        eng.run(spark.read.parquet(args.seeds), max_rounds=args.rounds)
    else:
        eng.resume(max_rounds=args.rounds)
    for s in eng.stats:
        print(s)
    eng.per_host_sequences().show(20, truncate=False)


if __name__ == "__main__":
    main()
