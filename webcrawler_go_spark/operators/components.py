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
- Convergence is O(graph diameter) iterations of min-label flooding;
  duplicate clusters are short chains in practice (diameter ≪ 10).
- The only driver-side values are one converged? count per iteration
  (a 1-row aggregate, same pattern as frontier_loop round stats).
- ``localCheckpoint`` truncates the lineage each iteration so the plan
  does not grow exponentially across rounds (same device as the
  frontier loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 100,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``,
    where component = MIN node id reachable through undirected edges.

    Min-label propagation: label(u) starts as u; each round
    label(u) := min(label(u), min over neighbors v of label(v)); stop
    when no label changed. Deterministic, order-insensitive. Converges
    in O(graph diameter) rounds; if ``max_iter`` is hit while labels
    are still changing the result would be WRONG (one cluster split
    into several), so that raises instead of silently returning.
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

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("v"), F.col("label").alias("vlab")),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("vlab").alias("nbr_lab"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_lab", "label")).alias("label"),
                (F.col("nbr_lab") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            converged = True
            break
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
