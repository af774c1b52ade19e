"""Cardinality sketches for the URL-seen set (SURVEY.md §2.4 J1 at the
10^10 scale; complements the Bloom/cuckoo membership path in
``operators/dedup.py`` / ``operators/cuckoo.py``).

The reference tracks crawl cardinalities with exact in-memory maps
(crawler.go:52-63 ``visited map[string]bool`` + counters read back for
the stats block, crawler.go:1076-1110). Exact counting is free on one
box; on a 1000-executor cluster a ``COUNT(DISTINCT url)`` over a 10^10-row
frontier is a full shuffle of every distinct URL string. The scale-correct
answer is a **HyperLogLog register sketch** (Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm"): m = 2^p fixed-size registers, mergeable by element-wise MAX,
so per-partition sketches combine to the global one in O(m) bytes —
map-side partial aggregation does exactly this for free, making the only
shuffle ≤ m tiny rows per key group regardless of input size.

Everything here is *deterministic and engine-portable* so the DuckDB
oracle reproduces the estimate bit-for-bit:

* hash = first 15 hex chars of md5 (60 bits) — Spark
  ``conv(substring(md5(x),1,15),16,10)`` ≡ DuckDB
  ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``;
* register index = ``h % m`` (low p bits), witness ``w = h div m``
  (60 − p bits);
* rank = position of the lowest set bit of ``w`` (Flajolet-Martin style
  trailing-zero geometric, distributionally identical to the leading-zero
  form) computed as ``log2(w & -w) + 1`` — log2 of an exact power of two
  is exact in IEEE double on every libm, the one log2 use that cannot
  round differently across engines; ``w = 0`` → rank (61 − p);
* the estimator is integer fixed point end-to-end: the harmonic sum
  ``Z = Σ 2^-rank`` is scaled by 2^30 (every term ``2^30 div 2^rank`` is
  an exact integer for rank ≤ 30 and floors to 0 past it, a truncation
  both engines apply identically), absent registers contribute the full
  2^30 (rank 0), and the alpha_m bias constant is pre-scaled to
  micro-units. No float crosses an engine boundary.

Precision picks the register count: standard error ≈ 1.04/sqrt(2^p).
p=12 (3 KiB/sketch, ±1.6%) is the 10^10-frontier setting; the raw
estimator (no small-range correction — corrections need ln() on
data-dependent values, which is not bit-portable across libms) is
accurate once n ≳ 2.5·m, so the demo queries at sf0.01 cardinalities use
p=10 (global, n≈11k) and p=6 (per-host, n≈280). tests/test_sketches.py
asserts the error bounds and the exact merge / duplicate-insensitivity
laws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Z_SCALE = 1 << 30


def _alpha_micro(m: int) -> int:
    """alpha_m bias constant (Flajolet et al. §4) in micro-units —
    a compile-time integer, embedded identically in Spark and oracle SQL."""
    if m == 16:
        a = 0.673
    elif m == 32:
        a = 0.697
    elif m == 64:
        a = 0.709
    else:
        a = 0.7213 / (1 + 1.079 / m)
    return round(a * 1_000_000)


def est_numerator(p: int) -> int:
    """The estimator's fixed numerator alpha_m·m², pre-collapsed to one
    exact integer so per-row math stays far below 2^63."""
    m = 1 << p
    return _alpha_micro(m) * m * m // 1_000_000


def hll_prepare(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Append (bucket, rank) for ``col`` — the per-element sketch update.

    Pure codegen column math: md5 → 60-bit int → low-p-bit register
    index + trailing-zero rank of the (60−p)-bit witness.
    """
    m = 1 << p
    rank_empty = 61 - p
    h = F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("long")
    out = df.withColumn("_hll_h", h)
    out = out.withColumn("bucket", F.col("_hll_h") % m).withColumn(
        "_hll_w", F.expr(f"_hll_h div {m}")
    )
    return out.withColumn(
        "rank",
        F.expr(
            f"CASE WHEN _hll_w = 0 THEN {rank_empty} "
            "ELSE CAST(log2(_hll_w & -_hll_w) AS INT) + 1 END"
        ),
    ).drop("_hll_h", "_hll_w")


def hll_registers(
    df: DataFrame, col: str, p: int = 12, keys: list[str] | None = None
) -> DataFrame:
    """The sketch itself: per (keys…, bucket) → MAX(rank).

    MAX is associative/commutative, so Spark's partial (map-side)
    aggregation builds each partition's full sketch locally and the
    exchange carries ≤ m rows per key — the whole point at 10^10 inputs.
    """
    keys = list(keys or [])
    prepared = hll_prepare(df, col, p)
    return prepared.groupBy(*keys, "bucket").agg(F.max("rank").alias("rank"))


def hll_merge(*register_sets: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge sketches: union the register tables, re-MAX per bucket.

    Exactly the HLL merge law — ``hll_registers(A ∪ B)`` ≡
    ``hll_merge(hll_registers(A), hll_registers(B))`` (tested)."""
    keys = list(keys or [])
    merged = register_sets[0]
    for r in register_sets[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy(*keys, "bucket").agg(F.max("rank").alias("rank"))


def hll_estimate(
    registers: DataFrame, p: int = 12, keys: list[str] | None = None
) -> DataFrame:
    """Registers → integer cardinality estimate per key group.

    Z_scaled = Σ_present (2^30 div 2^rank) + (m − n_present)·2^30 (the
    absent registers are rank 0), estimate = (alpha·m²)·2^30 div Z_scaled
    — all BIGINT, floor division, engine-portable.
    """
    keys = list(keys or [])
    m = 1 << p
    num = est_numerator(p)
    term = F.expr(f"CAST({_Z_SCALE} AS BIGINT) div shiftleft(CAST(1 AS BIGINT), rank)")
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(term).alias("_z_present"),
    )
    return agg.select(
        *keys,
        "n_registers",
        F.expr(f"_z_present + ({m} - n_registers) * CAST({_Z_SCALE} AS BIGINT)").alias(
            "z_scaled"
        ),
        F.expr(
            f"CAST({num} AS BIGINT) * {_Z_SCALE} div "
            f"(_z_present + ({m} - n_registers) * CAST({_Z_SCALE} AS BIGINT))"
        ).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = 12, keys: list[str] | None = None
) -> DataFrame:
    """One-shot: sketch + estimate. The drop-in replacement for
    ``COUNT(DISTINCT col)`` when ~1.04/sqrt(2^p) relative error suffices
    and the input is huge."""
    return hll_estimate(hll_registers(df, col, p, keys), p, keys)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications") — the
# FREQUENCY member of the sketch family (Bloom/cuckoo = membership,
# HLL = cardinality). d independent hash rows × w counters; point
# estimate = MIN over rows of the hashed counter. Guarantees
# est ≥ true (pure overestimate, tested as a law) and
# est ≤ true + εN with ε = e/w at probability 1 − e^-d. Use: heavy-
# hitter URLs / hot hosts over a 10^10-row visit stream where the d·w
# counter table (a few thousand rows, broadcastable) replaces a full
# URL-keyed shuffle when only approximate counts above a threshold
# matter. Sketches from disjoint inputs merge by bucket-wise SUM
# (tested). Same engine-portable hash as HLL: per-row salt ``j:`` then
# md5-hex-15 → BIGINT.
# ---------------------------------------------------------------------------

CMS_W = 4096
CMS_D = 4


def _cms_bucket(col, j, w: int):
    h = F.conv(
        F.substring(
            F.md5(F.concat(j.cast("string"), F.lit(":"), F.col(col))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % w


def cms_build(df: DataFrame, col: str, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """Stream → sketch: (j, bucket) → COUNT. One groupBy over d·|input|
    narrow rows; partial aggregation collapses each partition to ≤ d·w
    rows before the exchange, so the shuffle is sketch-sized, not
    input-sized."""
    rows = df.select(F.col(col).alias("_x")).withColumn(
        "j", F.explode(F.array(*[F.lit(i) for i in range(d)]))
    )
    return (
        rows.select("j", _cms_bucket("_x", F.col("j"), w).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counters are linear: merge = bucket-wise SUM of the union."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("j", "bucket").agg(F.sum("c").alias("c"))


def cms_lookup(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Point estimate per candidate: MIN over the d hashed counters.

    The sketch is d·w rows by construction → broadcast hash join; the
    candidate stream never shuffles on its key."""
    cand = candidates.withColumn(
        "j", F.explode(F.array(*[F.lit(i) for i in range(d)]))
    )
    cand = cand.withColumn("bucket", _cms_bucket(col, F.col("j"), w))
    joined = cand.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )


def cms_oracle_cte(
    col_expr: str,
    src: str,
    cand_src: str,
    cand_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
    out: str = "cms",
) -> str:
    """DuckDB twin of cms_build + cms_lookup: final CTE ``out`` holds
    (cand_col, est_count)."""
    salted = (
        f"CAST('0x' || substr(md5(CAST(t.j AS VARCHAR) || ':' || {{v}}), 1, 15)"
        " AS BIGINT)"
    )
    h_build = salted.format(v=col_expr)
    h_cand = salted.format(v=cand_col)
    return f"""
{out}_rows AS (SELECT unnest([{", ".join(str(i) for i in range(d))}]) AS j),
{out}_sketch AS (
  SELECT t.j, ({h_build}) % {w} AS bucket, COUNT(*) AS c
  FROM {src}, {out}_rows t GROUP BY 1, 2
),
{out}_cand AS (
  SELECT {cand_col}, t.j, ({h_cand}) % {w} AS bucket
  FROM {cand_src}, {out}_rows t
),
{out} AS (
  SELECT c.{cand_col}, CAST(MIN(COALESCE(s.c, 0)) AS BIGINT) AS est_count
  FROM {out}_cand c LEFT JOIN {out}_sketch s USING (j, bucket)
  GROUP BY c.{cand_col}
)"""


# ---------------------------------------------------------------------------
# Histogram quantiles — the QUANTILE member of the summary family. An
# exact p99 over 10^10 fetch latencies needs a global sort (or a
# driver-side approxQuantile, which is neither distributed-output nor
# reproducible); a fixed-width histogram needs ONE bucket-keyed shuffle
# whose size is bounded by the value range, then a cumulative Window
# over the tiny per-key histogram. Quantile = lower edge of the first
# bucket whose cumulative count reaches ceil(q·n) — deterministic
# integer comparisons only (cum·100 ≥ q_pct·n), bit-portable to the
# SQL oracle. Error is bounded by the bucket width, by construction.
# ---------------------------------------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    width: int,
    quantiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-key approximate quantiles of an integer column via
    fixed-width buckets. Output: keys…, n, p{q} (bucket lower edge —
    true quantile lies within [p, p+width))."""
    from pyspark.sql import Window

    b = df.select(
        *keys, F.expr(f"{value_col} div {width}").alias("bucket")
    )
    hist = b.groupBy(*keys, "bucket").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy(*keys).orderBy("bucket")
    w_all = Window.partitionBy(*keys)
    cum = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        aggs.append(
            (
                F.min(F.when(F.expr(f"cum * 100 >= {q} * n"), F.col("bucket")))
                * width
            ).alias(f"p{q}")
        )
    return cum.groupBy(*keys).agg(*aggs)


def histogram_quantiles_sql(
    value_expr: str,
    src: str,
    keys_sql: str,
    width: int,
    quantiles: tuple[int, ...] = (50, 90, 99),
    out: str = "hq",
) -> str:
    """DuckDB twin of histogram_quantiles; final CTE ``out``."""
    kcols = [k.strip() for k in keys_sql.split(",") if k.strip()]
    ksel = "".join(k + ", " for k in kcols)
    kby = ", ".join(kcols) if kcols else ""
    part = f"PARTITION BY {kby}" if kby else ""
    qcols = ",\n         ".join(
        f"CAST(MIN(CASE WHEN cum * 100 >= {q} * n THEN bucket END) * {width}"
        f" AS BIGINT) AS p{q}"
        for q in quantiles
    )
    group = f"GROUP BY {kby}" if kby else ""
    return f"""
{out}_hist AS (
  SELECT {ksel}{value_expr} // {width} AS bucket, COUNT(*) AS c
  FROM {src} GROUP BY {(", ".join(kcols + ["bucket"]))}
),
{out}_cum AS (
  SELECT {ksel}bucket, c,
         SUM(c) OVER ({part} ORDER BY bucket) AS cum,
         SUM(c) OVER ({part}) AS n
  FROM {out}_hist
),
{out} AS (
  SELECT {ksel}CAST(MAX(n) AS BIGINT) AS n,
         {qcols}
  FROM {out}_cum {group}
)"""

def hll_oracle_cte(
    col_expr: str, p: int, src: str, keys_sql: str = "", out: str = "hll"
) -> str:
    """DuckDB CTE chain (no leading WITH) whose final member ``out``
    holds (keys…, n_registers, z_scaled, est_distinct) over ``src`` —
    the bit-exact twin of ``hll_distinct``. ``keys_sql`` is a
    comma-separated key-column list ('' for a global sketch)."""
    m = 1 << p
    rank_empty = 61 - p
    num = est_numerator(p)
    kcols = [k.strip() for k in keys_sql.split(",") if k.strip()]
    ksel = "".join(k + ", " for k in kcols)
    group_regs = "GROUP BY " + ", ".join(kcols + ["bucket"])
    group_est = ("GROUP BY " + ", ".join(kcols)) if kcols else ""
    return f"""
{out}_hashed AS (
  SELECT {ksel}CAST('0x' || substr(md5({col_expr}), 1, 15) AS BIGINT) AS h
  FROM {src}
),
{out}_ranked AS (
  SELECT {ksel}h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN {rank_empty}
              ELSE CAST(log2((h // {m}) & -(h // {m})) AS INT) + 1 END AS rank
  FROM {out}_hashed
),
{out}_regs AS (
  SELECT {ksel}bucket, MAX(rank) AS rank FROM {out}_ranked {group_regs}
),
{out}_est AS (
  SELECT {ksel}COUNT(*) AS n_registers,
         SUM(CAST({_Z_SCALE} AS BIGINT) // (CAST(1 AS BIGINT) << rank)) AS z_present
  FROM {out}_regs {group_est}
),
{out} AS (
  SELECT {ksel}CAST(n_registers AS BIGINT) AS n_registers,
         CAST(z_present + ({m} - n_registers) * CAST({_Z_SCALE} AS BIGINT) AS BIGINT)
           AS z_scaled,
         CAST(CAST({num} AS BIGINT) * {_Z_SCALE} //
              (z_present + ({m} - n_registers) * CAST({_Z_SCALE} AS BIGINT)) AS BIGINT)
           AS est_distinct
  FROM {out}_est
)"""
