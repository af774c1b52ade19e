"""Per-host politeness scheduling (SURVEY.md §2.5 W1-W3).

The reference rate-limits with sleeps (50ms/link, crawler.go:989) and a
global semaphore ≤20 (crawler.go:211, main.go:476-481). At cluster scale
sleeps don't compose, so the schedule is encoded IN DATA:

* deterministic per-host fetch order — ``row_number`` over
  Window.partitionBy(host).orderBy(round, parent_seq, link_pos); this is
  exactly BFS-with-document-order-ties, the reference's effective order;
* per-host budget — broadcast-join the (tiny) politeness_budget dim and
  keep rank ≤ budget; the overflow spills to the next round (the Spark
  analogue of "the semaphore makes them wait");
* retry backoff — ``not_before_round`` column filtered against the
  current round (crawler.go:586-588's linear backoff, data-encoded).

Skew: ``partitionBy(host)`` puts a hot host in one task. The two-phase
salted rank keeps ordering parity while spreading the sort:
rank within (host, salt) → per-salt offsets via a tiny aggregate →
global per-host rank = salt_offset + local_rank. Salting only matters
when a single host exceeds ~task-sized cardinality; below the threshold
the single-phase Window is used (fewer shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["round", "parent_seq", "link_pos", "url_hash"]
# url_hash last = total tiebreak so ranking is deterministic even if two
# links share (round, parent_seq, link_pos) (can't happen from one page,
# but keeps the op total-order-safe on arbitrary input)


def rank_per_host(frontier: DataFrame) -> DataFrame:
    """Single-phase per-host rank (host cardinality fits a task)."""
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in ORDER_COLS])
    return frontier.withColumn("host_rank", F.row_number().over(w))


def rank_per_host_salted(frontier: DataFrame, n_salts: int = 16) -> DataFrame:
    """Two-phase salted per-host rank for hot hosts (SURVEY §4.1).

    Phase 1: range-bucket each row into a salt by its order key position
    — we use ``ntile`` over the host partition? No: that is the same hot
    partition. Instead salt = pmod(url_hash, n_salts) and rank within
    (host, salt); phase 2 computes, per (host, salt), how many rows of
    OTHER salts precede each row — that requires order statistics, so we
    instead make the salted rank order-preserving by bucketing on the
    order key itself: salt = ntile-like bucket derived from a cheap
    percentile of parent_seq. Practical compromise implemented here:

      salt   = pmod(parent_seq, n_salts)      (spreads by discoverer)
      local  = row_number over (host, salt) ordered by the crawl key
      offset = for each (host, salt), count of rows in lower salts? —
               NOT order-correct.

    Order-exact two-phase ranking is only possible when the bucketing is
    order-aligned. So: bucket by the leading key component ``round`` is
    constant per call; we therefore sort-bucket by (parent_seq range).
    We compute per-host percentiles of parent_seq (approx, driver-light),
    derive range boundaries, rank within each range, then add the exact
    counts of earlier ranges. Exactness: ranges partition the order key
    space, ranking is done on the full key inside each range, and
    earlier-range counts are exact ⇒ global rank identical to the
    single-phase Window.
    """
    bounds = (
        frontier.groupBy("host")
        .agg(
            F.percentile_approx(
                "parent_seq",
                [i / n_salts for i in range(1, n_salts)],
                10_000,
            ).alias("cuts")
        )
    )
    fr = frontier.join(F.broadcast(bounds), "host", "left")
    # salt = number of cut points strictly below parent_seq (0..n_salts-1)
    fr = fr.withColumn(
        "salt",
        F.when(
            F.col("cuts").isNotNull(),
            F.size(F.filter("cuts", lambda c: c < F.col("parent_seq"))),
        ).otherwise(F.lit(0)),
    ).drop("cuts")
    w_local = Window.partitionBy("host", "salt").orderBy(
        *[F.col(c) for c in ORDER_COLS]
    )
    fr = fr.withColumn("_local_rank", F.row_number().over(w_local))
    counts = fr.groupBy("host", "salt").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy("host")
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("host", "salt", "_offset")
    return (
        fr.join(F.broadcast(offsets), ["host", "salt"], "left")
        .withColumn("host_rank", (F.col("_offset") + F.col("_local_rank")).cast("int"))
        .drop("_local_rank", "_offset", "salt")
    )


def schedule_round(
    frontier: DataFrame,
    budgets: DataFrame,
    current_round: int,
    default_budget: int = 20,
    salted: bool = False,
    n_salts: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """W1+W2+W3: returns (scheduled, deferred).

    * filters retry backoff (not_before_round > round → deferred),
    * ranks per host (salted two-phase when requested),
    * broadcast-joins the politeness budget dim (small by construction),
    * keeps host_rank ≤ budget; overflow is deferred to the next round
      with not_before_round = round+1.

    ``seq`` — the engine-wide fetch sequence used as parent_seq by the
    links this fetch discovers — packs (round, host_rank) into one long:
    per-host order across rounds is then simply ORDER BY seq, and the
    sequential oracle reproduces it exactly.
    """
    ready = frontier.filter(F.col("not_before_round") <= F.lit(current_round))
    backoff_deferred = frontier.filter(
        F.col("not_before_round") > F.lit(current_round)
    )

    ranked = (
        rank_per_host_salted(ready, n_salts) if salted else rank_per_host(ready)
    )
    ranked = ranked.join(F.broadcast(budgets), "host", "left").withColumn(
        "_budget",
        F.coalesce(F.col("max_fetches_per_round"), F.lit(default_budget)),
    )
    scheduled = (
        ranked.filter(F.col("host_rank") <= F.col("_budget"))
        .withColumn(
            "seq",
            (F.lit(current_round).cast("long") * F.lit(1 << 32))
            + F.col("host_rank"),
        )
        .drop("_budget", "max_fetches_per_round", "crawl_delay_ms")
    )
    overflow = (
        ranked.filter(F.col("host_rank") > F.col("_budget"))
        .drop("_budget", "max_fetches_per_round", "crawl_delay_ms", "host_rank")
        .withColumn("not_before_round", F.lit(current_round + 1))
    )
    deferred = overflow.unionByName(
        backoff_deferred, allowMissingColumns=False
    )
    return scheduled, deferred


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Robots allow/deny longest-prefix-match (FIXTURES.md §6; tie→allow).

    robots is a small dim → broadcast. A URL is denied iff the longest
    matching prefix rule is 'deny'.
    """
    matches = frontier.join(F.broadcast(robots), "host", "left").filter(
        F.col("path_pfx").isNull()
        | F.col("path").startswith(F.col("path_pfx"))
    )
    w = Window.partitionBy("url_hash").orderBy(
        F.length(F.coalesce(F.col("path_pfx"), F.lit(""))).desc(),
        F.col("rule").asc(),  # tie → 'allow' < 'deny' lexicographically
    )
    best = (
        matches.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .filter(F.coalesce(F.col("rule"), F.lit("allow")) != "deny")
        .drop("_r", "rule", "path_pfx")
    )
    return best
