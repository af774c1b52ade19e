"""HyperLogLog sketch laws (operators/sketches.py): accuracy at the
designed operating point, the exact merge law, duplicate-insensitivity,
and register-domain bounds. The engine-vs-DuckDB bit-equality of the
estimator is covered by the oracle rows (urlseen_hll / host_url_hll)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_go_spark.operators.sketches import (
    hll_distinct,
    hll_merge,
    hll_registers,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark, n=8000):
    # n distinct urls, each duplicated a k-dependent number of times
    return (
        spark.range(0, n * 3)
        .select((F.col("id") % n).alias("k"))
        .select(F.concat(F.lit("https://h.test/page/"), F.col("k")).alias("u"))
    )


def test_estimate_within_3_sigma(spark):
    n = 8000
    est = hll_distinct(_corpus(spark, n), "u", p=10).collect()[0]
    # p=10 → σ ≈ 1.04/sqrt(1024) ≈ 3.25%; 3σ ≈ 9.8%
    assert abs(est["est_distinct"] - n) / n < 0.098
    assert est["n_registers"] <= 1024


def test_duplicate_insensitive(spark):
    df = _corpus(spark, 2000)
    once = sorted(
        (r["bucket"], r["rank"]) for r in hll_registers(df, "u", p=8).collect()
    )
    thrice = sorted(
        (r["bucket"], r["rank"])
        for r in hll_registers(df.union(df).union(df), "u", p=8).collect()
    )
    assert once == thrice


def test_merge_law_exact(spark):
    """sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) — register-for-register.
    This is what makes per-partition/per-day sketches combinable without
    touching the raw 10^10-row input again."""
    df = _corpus(spark, 4000).withColumn(
        "half", (F.length("u") % 2 == 0).cast("int")
    )
    a = df.filter(F.col("half") == 0).select("u")
    b = df.filter(F.col("half") == 1).select("u")
    merged = sorted(
        (r["bucket"], r["rank"])
        for r in hll_merge(
            hll_registers(a, "u", p=9), hll_registers(b, "u", p=9)
        ).collect()
    )
    whole = sorted(
        (r["bucket"], r["rank"])
        for r in hll_registers(df.select("u"), "u", p=9).collect()
    )
    assert merged == whole


def test_grouped_sketch_per_key(spark):
    # four balanced groups of ~750 distinct each (≫ 2.5·m at p=6)
    df = (
        spark.range(0, 3000 * 2)
        .select((F.col("id") % 3000).alias("k"))
        .select(
            F.concat(F.lit("https://h.test/page/"), F.col("k")).alias("u"),
            (F.col("k") % 4).cast("string").alias("g"),
        )
    )
    out = {
        r["g"]: r
        for r in hll_distinct(df, "u", p=6, keys=["g"]).collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert set(out) == set(exact)
    for g, row in out.items():
        assert row["n_registers"] <= 64
        # p=6 → σ ≈ 13%; allow 3.5σ
        assert abs(row["est_distinct"] - exact[g]) / exact[g] < 0.46, (
            g,
            row["est_distinct"],
            exact[g],
        )


def test_rank_domain(spark):
    regs = hll_registers(_corpus(spark, 1000), "u", p=12).collect()
    for r in regs:
        assert 0 <= r["bucket"] < 4096
        assert 1 <= r["rank"] <= 49
