"""URL-seen dedup (SURVEY.md §2.3 J1/J2) — the Spark form of the
reference's ``visited.LoadOrStore`` (crawler.go:562-566, sitemap.go:153,
pdfcapture.go:154).

Three layers, cheapest first:

1. **within-round dedup** — the same URL discovered by many parents in one
   round: keep the FIRST discovery by the crawl-order key (round,
   parent_seq, link_pos), matching "first writer wins" in LoadOrStore.
   Implemented as a min-by aggregation (shuffle on url_hash — required
   anyway for the anti-join, so AQE can reuse the exchange).
2. **Bloom pre-filter** — a broadcast Bloom built from url_seen prunes the
   bulk of already-seen URLs BEFORE the shuffle. FPP affects performance
   only, never correctness (false positives are just re-checked by the
   anti-join; false negatives impossible). At 10^10 seen URLs one Bloom
   is ~12 GB @1% — too big to broadcast whole, so the scale design is a
   sharded filter: ``pmod(url_hash, n_shards)`` routes each URL to a
   shard-local Bloom; shards build in parallel from the partitioned seen
   table and broadcast independently (n_shards × smaller). Local mode
   uses 1 shard.
3. **exact anti-join** — ``left_anti`` on url_hash against the seen table:
   the authoritative check (Bloom is advisory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRAWL_ORDER_KEY = ["round", "parent_seq", "link_pos"]


def first_discovery(frontier: DataFrame) -> DataFrame:
    """Within-round dedup: first discovery wins (LoadOrStore semantics).

    min_by over the packed crawl-order key — one hash aggregate with
    map-side partial, cheaper than a Window over url_hash.
    """
    # pack (round, parent_seq, link_pos) into one orderable struct
    key = F.struct(*[F.col(c) for c in CRAWL_ORDER_KEY])
    others = [c for c in frontier.columns if c != "url_hash"]
    agg = frontier.groupBy("url_hash").agg(
        F.min_by(F.struct(*[F.col(c) for c in others]), key).alias("_row")
    )
    return agg.select("url_hash", *[F.col(f"_row.{c}").alias(c) for c in others])


def bloom_prefilter(
    candidates: DataFrame,
    seen: DataFrame,
    expected: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Advisory broadcast-Bloom prune before the anti-join shuffle.

    Skipped (returns candidates unchanged) when the seen set is empty.
    Uses Spark's built-in ``DataFrame.stat.bloomFilter`` (JVM-side build,
    no data to the Python driver beyond the filter bits).
    """
    n = expected if expected is not None else seen.count()
    if n == 0:
        return candidates
    bf = seen.stat.bloomFilter("url_hash", max(n, 64), fpp)
    spark = candidates.sparkSession
    bf_b = spark.sparkContext.broadcast(bf)

    # mightContain via a vectorized-ish filter: Spark exposes BloomFilter
    # only as a JVM object; calling it per-row from Python would be the
    # slow path, so route through a pandas UDF over the long hashes.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        f = bf_b.value
        return h.map(f.mightContain)

    return candidates.filter(might_contain(F.col("url_hash")))


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    use_bloom: bool = False,
    seen_count: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """J1: drop candidates whose url_hash is already in the seen set.

    Exactness comes from the left_anti join; the Bloom stage is purely a
    shuffle-volume reducer at scale (off by default in local tests where
    the broadcast outweighs the prune).
    """
    pruned = (
        bloom_prefilter(candidates, seen, seen_count, fpp)
        if use_bloom
        else candidates
    )
    return pruned.join(seen.select("url_hash"), "url_hash", "left_anti")
