"""Connected components over a pair-edge list — duplicate-cluster
resolution for near-dup dedup pipelines.

Near-dup detection (MinHash/SimHash/ngram-Jaccard in operators/dedup.py)
emits PAIRS; a curation pipeline needs CLUSTERS: if A~B and B~C, all
three are one duplicate group and one survivor is kept. That grouping is
connected components on the pair graph.

Implementation: iterative min-label propagation expressed as DataFrame
joins. Each round every node adopts the minimum label among itself and
its neighbors; a fixpoint is reached after O(diameter) rounds. Duplicate
clusters are shallow (diameter rarely exceeds a handful of hops — docs
chain through shared boilerplate), so the round count stays small in
practice. Scale notes:

- The per-round work is one shuffle join on the edge list plus a
  groupBy-min — both map-side-combinable, no O(n^2) blowup.
- ``localCheckpoint(eager=True)`` truncates the plan lineage each round;
  without it the iterative plan doubles every round and the optimizer
  chokes long before the data does.
- The per-round convergence check is one count() job — iterative graph
  algorithms genuinely need a driver-side fixpoint test (same structure
  as GraphX/Pregel supersteps); this is NOT the eager-scalar anti-pattern
  flagged for single-pass queries.
- For adversarial graphs (long chains, giant components) the
  O(log n)-round alternating large-star/small-star algorithm
  [Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14] drops in behind the same signature; min-label propagation is
  chosen here because dup graphs are shallow and the constant factor per
  round is half.

Reference parity: the reference app has no graph operator — this extends
the dedup family (SURVEY.md §2 D1-D3) to the cluster-resolution step a
100 TB pipeline runs between pair detection and survivor selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node in the pair graph with its component's min id.

    Parameters
    ----------
    edges : DataFrame with two id columns (undirected pairs; duplicates
        and self-loops tolerated).
    Returns ``(node, component)`` — component = min node id reachable.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        # candidate label per node: min label among its neighbors
        prop = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("_nbr"))
        )
        new_labels = (
            labels.join(prop, labels["node"] == prop["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def duplicate_clusters(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Group near-dup pairs into clusters: one row per component with
    ``(cluster_id, n_docs, doc_ids sorted)``. cluster_id = min member id,
    so survivor selection ("keep the cluster min") reads straight off it.
    """
    comp = connected_components(edges, src, dst, max_iter)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.array_sort(F.collect_list("node")).alias("doc_ids"),
    )
