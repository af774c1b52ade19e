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
    """Two-phase per-host rank for hot hosts (SURVEY §4.1 hard part).

    ``Window.partitionBy(host)`` puts a mega-host in ONE task; at 10^10
    URLs that task never finishes. Exact distributed ranking instead:

    1. ``repartitionByRange(n_salts, host, *key)`` — range-partition on
       the FULL order key, so each host's rows land in contiguous
       partitions in key order, and a hot host is spread across many
       partitions (Spark samples boundaries; skew is split);
    2. local ``row_number`` within (host, partition) — partitions are
       key-ranges, so local order = global order within the slice;
    3. exact per-(host, partition) counts → cumulative offset by
       partition id (tiny aggregate, broadcast back);
    4. global rank = offset + local rank.

    Exactness: range partitions tile the key space in partition-id order,
    ranking inside each tile uses the full key, and offsets are exact
    counts of earlier tiles ⇒ identical to the single-phase Window
    (asserted in tests/test_crawl_parity.py::test_salted_rank_equals_unsalted).
    """
    key_cols = [F.col(c) for c in ORDER_COLS]
    fr = frontier.repartitionByRange(n_salts, F.col("host"), *key_cols)
    fr = fr.withColumn("_pid", F.spark_partition_id())
    # pin ONE evaluation of the range exchange: the local-rank branch and
    # the counts branch must observe the same sampled range boundaries,
    # otherwise (host,_pid) offsets would not line up with local ranks
    # (rows would silently drop at the offsets join). localCheckpoint also
    # truncates lineage inside the iterative loop.
    fr = fr.localCheckpoint(eager=True)
    w_local = Window.partitionBy("host", "_pid").orderBy(*key_cols)
    fr = fr.withColumn("_local_rank", F.row_number().over(w_local))
    counts = fr.groupBy("host", "_pid").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy("host")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("host", "_pid", "_offset")
    return (
        fr.join(F.broadcast(offsets), ["host", "_pid"], "left")
        .withColumn(
            "host_rank", (F.col("_offset") + F.col("_local_rank")).cast("int")
        )
        .drop("_local_rank", "_offset", "_pid")
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


def budgets_from_delay(
    budgets: DataFrame, round_window_s: int = 60
) -> DataFrame:
    """Derive per-round fetch budgets from politeness delays: the
    reference sleeps crawl_delay_ms between links (crawler.go:989), i.e.
    at most round_window/delay fetches per host per round. The effective
    budget is the stricter of the explicit cap and the delay-implied
    rate, so both knobs of the politeness_budget dim are honored."""
    implied = F.floor(
        F.lit(round_window_s * 1000) / F.greatest(F.col("crawl_delay_ms"), F.lit(1))
    ).cast("int")
    return budgets.withColumn(
        "max_fetches_per_round",
        F.least(F.col("max_fetches_per_round"), F.greatest(implied, F.lit(1))),
    )


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Robots allow/deny longest-prefix-match (FIXTURES.md §6; tie→allow).

    robots is a small dim → broadcast. A URL is denied iff the longest
    matching prefix rule is 'deny'.
    """
    r = robots.select(
        F.col("host").alias("r_host"), "rule", "path_pfx"
    )
    # prefix match belongs in the JOIN condition: a URL whose host has
    # rules but none matching its path must fall through as allowed
    matches = frontier.join(
        F.broadcast(r),
        (F.col("host") == F.col("r_host"))
        & F.col("path").startswith(F.col("path_pfx")),
        "left",
    ).drop("r_host")
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
