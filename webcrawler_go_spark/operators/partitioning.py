"""Scan-width repair: round-robin spread of under-split inputs.

Parquet tasks cannot split a row group, so a single-file table with few
row groups bounds every scan-side map stage at that width no matter how
many cores the cluster has (guide §2.5 "input skew: one huge
unsplittable file"). The driver's testdata tables are exactly that
shape (1-6 row groups per table at sf1.0) — regex canonicalization,
Python codec kernels, and sketch partial aggregates were measured
running ≤6-way on 32 cores.

``spread_to_cluster`` repartitions ONLY when the frame's natural
partitioning is deficient: at production scale a multi-file table
already scans at ≥ cluster width and the function is an identity — the
extra exchange is never a standing payload tax. The check costs one
physical-planning pass (no job). Callers should project to the narrow
column set first so the one repair shuffle moves keys, not payloads,
wherever possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_cluster(df: DataFrame, mult: int = 2) -> DataFrame:
    """Repartition ``df`` to ``mult × defaultParallelism`` iff its
    current partition count is below half the target; identity
    otherwise (well-split inputs never pay the exchange)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * mult
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
