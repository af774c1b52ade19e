"""Connected components via iterated min-label propagation — the
transitive-closure canonicalization step that turns near-duplicate PAIRS
into duplicate CLUSTERS (chain A~B~C collapses to one canonical even
when A~C was never emitted as a pair).

The reference's dedup is exact first-writer-wins over a concurrent map
(crawler.go:562-566); a training-data curation pipeline over near-dup
candidate pairs additionally needs the closure, otherwise duplicate
chains split into multiple canonicals at scale.

Scale notes (100 TB / 10^9 nodes):
- Each iteration is one shuffle-join (edges ⋈ labels on the edge key)
  plus a groupBy-min — both hash-partitioned by node id, no driver data.
- Convergence is O(log diameter) iterations: min-label flooding plus a
  pointer-doubling shortcut per round (duplicate clusters are short
  chains in practice, but adversarial long chains stay cheap too).
- The only driver-side values are one converged? count per iteration
  (a 1-row aggregate, same pattern as frontier_loop round stats).
- ``localCheckpoint`` truncates the lineage each iteration so the plan
  does not grow exponentially across rounds (same device as the
  frontier loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpersist_local_checkpoint(df: DataFrame) -> None:
    """Free the cached RDD behind an (eagerly) localCheckpointed frame.
    Without this an O(diameter) loop accumulates one cached label-table
    copy per iteration; the ContextCleaner only reclaims them at GC
    time."""
    try:
        plan = df._jdf.queryExecution().logical()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — cache hygiene must never fail the job
        pass


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 100,
    stats: dict | None = None,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``,
    where component = MIN node id reachable through undirected edges.

    Min-label propagation WITH pointer doubling (the shortcutting step of
    the classic large-star/small-star & hash-to-min CC families): each
    round

        label(u) := min(label(u), min over neighbors v of label(v))   (flood)
        label(u) := min(label(u), label(label(u)))                    (double)

    The flood step alone needs O(diameter) rounds; the doubling step
    halves the remaining label-tree depth each round, so long chains
    converge in O(log diameter) rounds (asserted by the diameter-50 path
    test). Labels are always ids of same-component nodes (flood
    propagates neighbor labels; doubling follows a label to that node's
    label), so correctness is unchanged — stop when no label changed.
    Deterministic, order-insensitive. If ``max_iter`` is hit while
    labels are still changing the result would be WRONG (one cluster
    split into several), so that raises instead of silently returning.

    ``stats``: optional dict, filled with {"iterations": n} on return.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.unionByName(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_cp = labels  # handle to the PREVIOUS iteration's checkpointed RDD

    converged = False
    iterations = 0
    for _ in range(max_iter):
        iterations += 1
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("v"), F.col("label").alias("vlab")),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("vlab").alias("nbr_lab"))
        )
        flooded = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_lab", "label")).alias("label"),
        )
        # pointer doubling: follow each label to ITS label (labels are
        # node ids, so self-join label→node) and take the min — a
        # shuffle-join on the label key, same partitioning family as the
        # flood join, no driver data
        hops = flooded.select(
            F.col("node").alias("label"), F.col("label").alias("lab2")
        )
        doubled = flooded.join(hops, "label", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("lab2", "label")).alias("label"),
        )
        new_labels = doubled.join(
            labels.select("node", F.col("label").alias("old_label")), "node"
        ).select(
            "node",
            "label",
            (F.col("label") < F.col("old_label")).alias("changed"),
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        _unpersist_local_checkpoint(prev_cp)
        prev_cp = new_labels
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            converged = True
            break
    if stats is not None:
        stats["iterations"] = iterations
    _unpersist_local_checkpoint(sym)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"(graph diameter exceeds the cap); raise max_iter"
        )
    return labels


def canonicalize_closure(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, canonical_id) with canonical = MIN doc id in the
    near-duplicate CLUSTER (full transitive closure over ``pairs``);
    singletons map to themselves."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    return docs.select(id_col).join(
        comp.select(F.col("node").alias(id_col), F.col("label").alias("canonical_id")),
        id_col,
        "left",
    ).select(
        id_col,
        F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over the crawl link graph — the classic frontier-
    prioritization signal (what a production crawler feeds the priority
    queue the north rule names) — in INTEGER fixed-point so every
    engine computes bit-identical ranks.

    Float PageRank is shuffle-order-dependent (double addition does not
    associate); here rank is a BIGINT in units of 1/scale: init =
    scale // N, per-edge contribution = rank // out_degree (integer
    div), update = teleport + (sum · damping_pct) // 100 with teleport
    = (scale // N) · (100 − damping_pct) // 100. Every op is exact
    integer math, so the DuckDB oracle unrolls the same iterations and
    hash-matches exactly. Dangling-node mass leaks (the standard
    simplification) — identically on both engines.

    Scale shape: per iteration one edges⋈ranks shuffle-join + one
    groupBy-sum (both hash-partitioned on node id, map-side combined),
    same as connected_components; lineage truncated per iteration."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = scale // n
    teleport = base * (100 - damping_pct) // 100
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select("dst", F.expr("rank div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        prev = ranks
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"coalesce(s, 0L) * {damping_pct} div 100")
            ).cast("long").alias("rank"),
        ).localCheckpoint(eager=True)
        _unpersist_local_checkpoint(prev)
    return ranks.select("node", F.col("rank").alias("pagerank_scaled"))


def hits_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    hyperlinked environment", JACM 1999) over the crawl link graph —
    the classic complement to PageRank for seed selection: authorities
    are the pages worth fetching, hubs are the pages worth re-crawling
    for links. INTEGER fixed-point like `pagerank_fixed_point`: float
    HITS needs an L2 normalization whose sqrt and addition order are
    engine-dependent, so this uses the L1 form — after each half-step
    the vector is rescaled to sum ≈ ``scale`` via x·scale // Σx (exact
    integer ops, flooring loss < 1 unit per node, identical in every
    engine).

        a_i(v) = Σ_{u→v} h_{i-1}(u)   then a_i ← a_i · scale // Σ a_i
        h_i(u) = Σ_{u→v} a_i(v)       then h_i ← h_i · scale // Σ h_i

    Overflow bound (why the default scale is 10⁶, not pagerank's
    10¹²): the rescale computes a·scale with a ≤ Σa ≤ scale·max_out_deg,
    so int64 safety needs scale²·max_out_deg < 2⁶³ — 10⁶ supports
    degrees to ~9·10⁶ (any real host graph), ppm precision.

    The two Σ's are 1-row scalar aggregates collected per iteration
    (the sanctioned 1-row-stats pattern; 2·iterations driver rows
    total). Per iteration the plan is two edges⋈vector shuffle-joins +
    two node-keyed groupBy-sums, map-side combined — the
    pagerank/connected-components shape; lineage truncated per step.

    Returns (node, auth_scaled, hub_scaled)."""
    if iterations < 1:
        # checked BEFORE the node-set jobs below — a bad arg must not
        # first pay two full passes over the link graph
        raise ValueError("hits_fixed_point needs iterations >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("hits_fixed_point: empty edge set (no nodes)")
    if scale // n == 0:
        # init hub would floor to 0 and every later half-step stays 0 —
        # an all-zero result that LOOKS valid. Fail loudly instead.
        raise ValueError(
            f"hits_fixed_point: scale={scale} < n={n} nodes — the "
            f"fixed-point init floors to zero; raise scale (int64 "
            f"safety bound: scale^2 * max_out_degree < 2^63)"
        )
    e = e.localCheckpoint(eager=True)
    hubs = nodes.select("node", F.lit(scale // n).cast("long").alias("hub"))
    auth = None
    for _ in range(iterations):
        a_raw = (
            e.join(hubs, e["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        a_un = nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left").select(
            "node", F.expr("coalesce(s, 0L)").alias("a")
        )
        sa = int(a_un.agg(F.sum("a")).first()[0] or 0)
        prev_a = auth
        auth = a_un.select(
            "node", F.expr(f"a * {scale} div {max(sa, 1)}").alias("auth")
        ).localCheckpoint(eager=True)
        if prev_a is not None:
            _unpersist_local_checkpoint(prev_a)
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        h_un = nodes.join(h_raw, nodes["node"] == h_raw["src"], "left").select(
            "node", F.expr("coalesce(s, 0L)").alias("h")
        )
        sh = int(h_un.agg(F.sum("h")).first()[0] or 0)
        prev_h = hubs
        hubs = h_un.select(
            "node", F.expr(f"h * {scale} div {max(sh, 1)}").alias("hub")
        ).localCheckpoint(eager=True)
        _unpersist_local_checkpoint(prev_h)
    return auth.join(hubs, "node").select(
        "node",
        F.col("auth").cast("long").alias("auth_scaled"),
        F.col("hub").cast("long").alias("hub_scaled"),
    )
