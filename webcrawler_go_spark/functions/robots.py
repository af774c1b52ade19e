"""robots.txt parsing → rules dim (north rule: robots enforced in the
schedule via broadcast-joined allow/deny prefixes).

Pure column ops: split body into lines → explode → extract directives →
keep Allow/Disallow under the matched User-agent group. Longest-prefix
matching happens downstream in politeness.apply_robots. Grammar: the
practical subset (groups by User-agent, Allow/Disallow prefixes, '*'
agent); unsupported wildcards inside paths are treated literally, empty
Disallow (allow-all) is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(
    bodies: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """(host, body) → (host, rule, path_pfx) for the given user agent.

    A directive belongs to the most recent ``User-agent`` line above it.
    Group selection follows the standard (RFC 9309 §2.2.1): the MOST
    SPECIFIC matching group wins — when a host has a group naming
    ``user_agent`` exactly, the '*' group's rules are ignored for that
    host; '*' applies only where no specific group exists.
    """
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("line_no", "line"),
    ).withColumn("line", F.trim(F.regexp_replace("line", "#.*$", "")))
    directives = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract("line", "^([A-Za-z-]+)\\s*:", 1))).alias("key"),
        F.trim(F.regexp_extract("line", "^[A-Za-z-]+\\s*:(.*)$", 1)).alias("value"),
    ).filter(F.col("key") != "")
    # group id = running count of user-agent lines; agent = last UA seen
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = directives.withColumn(
        "agent",
        F.last(
            F.when(F.col("key") == "user-agent", F.lower(F.col("value"))),
            ignorenulls=True,
        ).over(w),
    )
    ua = user_agent.lower()
    # most-specific group wins: per host, if the exact-agent group EXISTS
    # (even rule-less — e.g. only a Crawl-delay, which per RFC 9309 means
    # that agent is fully allowed), the '*' group is dropped for that
    # host. Detected over ALL directives, BEFORE narrowing to
    # allow/disallow, so rule-less specific groups are seen.
    w_host = Window.partitionBy("host")
    grouped = grouped.withColumn(
        "_has_specific",
        F.max(F.when(F.col("agent") == ua, 1).otherwise(0)).over(w_host),
    )
    rules = grouped.filter(F.col("key").isin("allow", "disallow")).filter(
        F.col("agent").isin("*", ua)
    ).filter(
        (F.col("agent") == ua)
        | ((F.col("_has_specific") == 0) & (F.col("agent") == "*"))
    )
    return (
        rules.filter(F.col("value") != "")  # empty Disallow = allow-all, no rule
        .select(
            "host",
            F.when(F.col("key") == "allow", "allow").otherwise("deny").alias("rule"),
            F.col("value").alias("path_pfx"),
        )
        .distinct()
    )
