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
  chokes long before the data does. Each round's checkpoint blocks are
  unpersisted once the next round is materialized — over 25 rounds the
  stale label RDDs would otherwise pile up in executor storage.
- The per-round convergence check is one count() job — iterative graph
  algorithms genuinely need a driver-side fixpoint test (same structure
  as GraphX/Pregel supersteps); this is NOT the eager-scalar anti-pattern
  flagged for single-pass queries.
- Cluster output is a per-NODE mapping, never a per-cluster array:
  dup graphs chain through shared boilerplate, which is exactly how
  giant components form, and ``collect_list`` of a million-doc
  component would build one executor-OOM row. Survivor selection is a
  comparison against the cluster id (= min member), not an array scan.
- For adversarial graphs (long chains, giant components) pass
  ``algorithm="star"``: the alternating large-star/small-star algorithm
  [Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14] converges in O(log n) rounds instead of O(diameter).
  Min-label propagation stays the default because dup graphs are
  shallow and the constant factor per round is half.

Reference parity: the reference app has no graph operator — this extends
the dedup family (SURVEY.md §2 D1-D3) to the cluster-resolution step a
100 TB pipeline runs between pair detection and survivor selection.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Min-label propagation exhausted max_iter before the fixpoint."""


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mn"))
        .select("a", F.least(F.col("_mn"), F.col("a")).alias("m"))
    )
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: edges point large→small; every node connects
    itself and its (smaller) neighbors to the neighborhood minimum."""
    directed = edges.select(
        F.greatest(F.col("a"), F.col("b")).alias("a"),
        F.least(F.col("a"), F.col("b")).alias("b"),
    )
    mins = directed.groupBy("a").agg(F.min("b").alias("m"))
    closed = directed.union(
        directed.select(F.col("a"), F.col("a").alias("b")).distinct()
    )
    return (
        closed.join(mins, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected form (max, min), self-loops dropped."""
    return (
        edges.where(F.col("a") != F.col("b"))
        .select(
            F.greatest(F.col("a"), F.col("b")).alias("a"),
            F.least(F.col("a"), F.col("b")).alias("b"),
        )
        .distinct()
    )


def _cc_star(sym: DataFrame, max_iter: int) -> tuple[DataFrame, bool]:
    """Alternating large-star/small-star contraction [Kiveris et al.,
    SoCC'14]. Converges in O(log n) rounds regardless of diameter —
    the deep-chain / giant-component escape hatch for min-label
    propagation. Returns (per-node labels, converged)."""
    nodes = sym.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    edges = _canon(sym).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        new_edges = _canon(_small_star(_large_star(edges))).localCheckpoint(eager=True)
        # Fixpoint = edge set unchanged (both sets are canonical+distinct,
        # so two anti-joins decide equality).
        changed = (
            new_edges.join(edges, ["a", "b"], "left_anti")
            .union(edges.join(new_edges, ["a", "b"], "left_anti"))
            .limit(1)
            .count()
        )
        edges.unpersist()
        edges = new_edges
        if changed == 0:
            converged = True
            break
    # At the fixpoint every surviving edge is (member, component-min);
    # groupBy-min also degrades gracefully on a partial result.
    comp = edges.groupBy("a").agg(F.min("b").alias("_c"))
    labels = (
        nodes.join(comp, nodes["node"] == comp["a"], "left")
        .select("node", F.coalesce(F.col("_c"), F.col("node")).alias("component"))
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    nodes.unpersist()
    return labels, converged


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    on_nonconverged: str = "warn",
    algorithm: str = "label",
) -> DataFrame:
    """Label every node in the pair graph with its component's min id.

    Parameters
    ----------
    edges : DataFrame with two id columns (undirected pairs; duplicates
        and self-loops tolerated).
    max_iter : round cap. For ``algorithm="label"`` rounds needed ~
        graph diameter; for ``"star"`` ~ log2(largest component).
    on_nonconverged : what to do if ``max_iter`` rounds pass without a
        fixpoint — ``"warn"`` (default) emits a ``RuntimeWarning`` and
        returns the partial labels (one true component may appear as
        several), ``"raise"`` raises :class:`ConvergenceError`. A silent
        partial result would surface as duplicate survivors downstream
        with no signal anything went wrong.
    algorithm : ``"label"`` (min-label propagation, default — cheapest
        per round, right for shallow dup graphs) or ``"star"``
        (large-star/small-star, O(log n) rounds — right for deep chains
        and giant components).

    Returns ``(node, component)`` — component = min node id reachable.
    The result is localCheckpointed (materialized); callers may
    ``unpersist()`` it when done.
    """
    if on_nonconverged not in ("warn", "raise"):
        raise ValueError(f"on_nonconverged must be 'warn' or 'raise', got {on_nonconverged!r}")
    if algorithm not in ("label", "star"):
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    if algorithm == "star":
        try:
            labels, converged = _cc_star(sym, max_iter)
        finally:
            sym.unpersist()
        if not converged:
            msg = (
                f"connected_components(star) did not converge within "
                f"max_iter={max_iter} rounds; labels are PARTIAL."
            )
            if on_nonconverged == "raise":
                labels.unpersist()
                raise ConvergenceError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return labels

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # _ck tracks the round's CHECKPOINTED frame (unpersist must target
    # the materialized object itself, not the projection derived below)
    _ck = labels

    converged = False
    try:
        for _ in range(max_iter):
            # candidate label per node: min label among its neighbors
            prop = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("component").alias("_nbr"))
            )
            # The change flag is computed INSIDE the propagation select
            # (new label < old label ⟺ a strictly smaller neighbor
            # label arrived), and the checkpoint is LAZY so the single
            # `changed` count below both materializes the round's
            # labels and decides convergence — ONE job per round where
            # the previous form ran three (eager checkpoint, then a
            # new-vs-old join recomputing the comparison the select
            # already knew, round 14; per-round fixed cost dominates on
            # the small dup graphs every caller feeds this).
            new_labels = (
                labels.join(prop, labels["node"] == prop["a"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                    ).alias("component"),
                    (
                        F.coalesce(F.col("_nbr"), F.col("component"))
                        < F.col("component")
                    ).alias("_changed"),
                )
                .localCheckpoint(eager=False)
            )
            changed = new_labels.where(F.col("_changed")).count()
            # new_labels is materialized and the convergence count has
            # run — the previous round's checkpoint blocks are dead.
            _ck.unpersist()
            _ck = new_labels
            labels = new_labels.select("node", "component")
            if changed == 0:
                converged = True
                break
    finally:
        sym.unpersist()
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; labels are PARTIAL (one true component may be split into "
            "several clusters). Raise max_iter or switch to a logarithmic-round "
            "algorithm for deep graphs."
        )
        if on_nonconverged == "raise":
            labels.unpersist()
            raise ConvergenceError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def duplicate_clusters(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    on_nonconverged: str = "warn",
    algorithm: str = "label",
) -> DataFrame:
    """Resolve near-dup pairs into clusters as a per-node mapping:
    ``(node, cluster_id, n_docs, is_survivor)``.

    cluster_id = min member id; is_survivor marks exactly one row per
    cluster (the min member), so downstream "drop all but the survivor"
    is an anti-join on ``is_survivor = false`` — no per-cluster arrays
    are ever materialized (a giant boilerplate-chained component stays
    distributed instead of building one OOM-sized collect_list row).
    """
    comp = connected_components(edges, src, dst, max_iter, on_nonconverged, algorithm)
    sizes = comp.groupBy("component").agg(F.count("*").cast("bigint").alias("n_docs"))
    return (
        comp.join(sizes, "component")
        .select(
            "node",
            F.col("component").alias("cluster_id"),
            "n_docs",
            (F.col("node") == F.col("component")).alias("is_survivor"),
        )
    )


def cluster_doc_ids(
    clusters: DataFrame,
    max_cluster_docs: int = 10_000,
) -> DataFrame:
    """Small-scale inspection helper: materialize ``(cluster_id, n_docs,
    doc_ids sorted)`` arrays from the :func:`duplicate_clusters` mapping.

    Guarded: refuses if any cluster exceeds ``max_cluster_docs`` members,
    because a per-cluster array of a giant component is a single-row OOM.
    Use the mapping form for anything at scale.
    """
    biggest = clusters.agg(F.max("n_docs")).first()[0]
    if biggest is not None and biggest > max_cluster_docs:
        raise ValueError(
            f"largest cluster has {biggest} docs > max_cluster_docs="
            f"{max_cluster_docs}; materializing per-cluster arrays at this "
            "size risks executor OOM — work with the (node, cluster_id) "
            "mapping instead"
        )
    return clusters.groupBy("cluster_id").agg(
        F.first("n_docs").alias("n_docs"),
        F.array_sort(F.collect_list("node")).alias("doc_ids"),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "a",
    dst: str = "b",
    total_mass: float = 1.0,
    exact_contrib_decimal: str | None = None,
) -> DataFrame:
    """PageRank by fixed-iteration power method over an (``src``,
    ``dst``) directed edge list — the link-analysis sibling of
    :func:`connected_components` (importance, not membership).
    Returns ``(node, rank)``; ranks over all nodes sum to 1.

    Semantics (the standard formulation): every node starts at 1/n;
    each round a node keeps ``(1-d)/n`` plus ``d`` times the rank mass
    its in-neighbors push (their rank / out-degree). Dangling nodes
    (no out-edges) redistribute their mass uniformly — without that
    term rank leaks and the vector no longer sums to 1 (asserted
    property-based in tests/test_graph.py).

    Scale shape, per round: one join of the rank vector against the
    edge list on ``src`` (shuffle on the join key), one groupBy on
    ``dst`` with map-side partial sums, one 1-row dangling-mass
    aggregate broadcast into the update expression. Out-degrees are
    computed ONCE and reused. ``localCheckpoint`` truncates the
    iterative lineage exactly as connected_components does; a fixed
    iteration count (vs an epsilon fixpoint) keeps every round's plan
    identical and needs no extra convergence job — 10-20 rounds is
    the standard production budget at damping 0.85.

    Reference analog: none — beyond-reference graph analytics over the
    dup-pair / interaction graphs this repo's dedup family emits.

    Determinism knobs (defaults leave the classic behavior untouched):
    ``total_mass`` scales the whole vector (ranks sum to it instead of
    1) — PageRank is linear, so this is exact re-scaling, used to lift
    ranks into a magnitude where a coarse decimal cast keeps ~9
    significant digits. ``exact_contrib_decimal`` (e.g.
    ``"decimal(18,6)"``) makes the per-round contribution sum an EXACT
    decimal aggregate: the result no longer depends on partitioning or
    aggregation order, so two runs — or two ENGINES — agree double for
    double (that is what lets supplier_customer_pagerank be
    oracle-hash-checked; plain double sums reassociate). The coarse
    scale must be paired with a large ``total_mass``; at the default
    mass of 1.0 a (18,6) cast would truncate rank/degree to 6 decimals.
    """
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    # The edge list is consumed 2-3x PER ROUND (degree join, push join,
    # dangling scan). Without truncation an upstream plan — say the
    # distinct over a fact-table join that built the graph — re-executes
    # every time: measured 132s -> 12s at sf0.1 for the
    # customer-supplier graph from checkpointing e and out_deg once.
    # State is bounded by the edge list itself, the same budget every
    # distributed PageRank keeps resident.
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        e.groupBy("_src")
        .agg(F.count("*").alias("_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(total_mass / n))
    contrib = F.col("rank") / F.col("_deg")
    push_sum = (
        F.sum(contrib.cast(exact_contrib_decimal)).cast("double")
        if exact_contrib_decimal
        else F.sum(contrib)
    )
    for _ in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg._src, "left"
        ).select("node", "rank", "_deg")
        # mass from dangling nodes (no out-edges) spreads uniformly.
        # Under exact_contrib_decimal the dangling sum must use the
        # same exact-decimal discipline as the push sum — a plain
        # double sum here would reintroduce the association-order
        # dependence the mode exists to remove.
        dangling_sum = (
            F.sum(F.col("rank").cast(exact_contrib_decimal)).cast("double")
            if exact_contrib_decimal
            else F.sum("rank")
        )
        dangling = (
            with_deg.where(F.col("_deg").isNull())
            .agg(F.coalesce(dangling_sum, F.lit(0.0)).alias("_dm"))
            .first()["_dm"]
        )
        pushed = (
            with_deg.where(F.col("_deg").isNotNull())
            .join(e, F.col("node") == F.col("_src"))
            .groupBy(F.col("_dst").alias("node"))
            .agg(push_sum.alias("_in"))
        )
        base = (1.0 - damping) * total_mass / n + damping * dangling / n
        prev = ranks
        ranks = (
            nodes.join(pushed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        prev.unpersist()
    return ranks


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented)
# ---------------------------------------------------------------------------

def triangles(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Every triangle in the undirected graph, exactly once, as
    ``(n1, n2, n3)`` with ``n1 < n2 < n3`` — the cohesion primitive on
    top of the pair graphs this module's dedup family emits (a triangle
    is three MUTUALLY similar docs; a dup-pair edge with no closing
    third side is far weaker evidence of a real cluster).

    Degree-oriented wedge join [Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11]: each
    undirected edge is directed from the lower to the higher endpoint
    under the total order (degree, node), wedges are generated per
    SOURCE node from its out-neighbors, and a wedge (v, w) is a
    triangle iff the oriented edge (v, w) exists. Orientation bounds
    every node's out-degree at O(√m) regardless of its real degree —
    the hub that would generate deg² wedges under naive a<b ordering
    generates almost none, because high-degree nodes sort LAST and
    receive edges instead of emitting them. Work is O(Σ outdeg²) ≤
    O(m^1.5), the sequential optimum for triangle listing, in three
    shuffles (degree agg, wedge self-join, closing-edge semi-join).
    Self-loops are dropped; parallel edges count once.
    """
    return _triangles_canonical(_canon_undirected(edges, src, dst))


def _canon_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list as distinct ``(_u < _v)`` rows — self-loops
    dropped, parallel edges collapsed."""
    lo, hi = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    return (
        edges.select(lo.alias("_u"), hi.alias("_v"))
        .where(F.col("_u") != F.col("_v"))
        .distinct()
    )


def _triangles_canonical(e: DataFrame) -> DataFrame:
    """:func:`triangles` on an already-canonical ``(_u, _v)`` edge list
    (the shared core, so :func:`triangle_stats` never canonicalizes —
    or re-executes the upstream pair computation — twice)."""
    deg = (
        e.select(F.col("_u").alias("node"))
        .unionByName(e.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    du = deg.select(F.col("node").alias("_u"), F.col("_deg").alias("_du"))
    dv = deg.select(F.col("node").alias("_v"), F.col("_deg").alias("_dv"))
    ranked = e.join(du, "_u").join(dv, "_v")
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("_u")).otherwise(F.col("_v")).alias("_s"),
        F.when(u_first, F.col("_v")).otherwise(F.col("_u")).alias("_t"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("_dt"),
    )
    w1 = oriented.select(
        F.col("_s"), F.col("_t").alias("_x"), F.col("_dt").alias("_dx")
    )
    w2 = oriented.select(
        F.col("_s"), F.col("_t").alias("_y"), F.col("_dt").alias("_dy")
    )
    # wedge (x, y) ordered by the same (deg, node) rank so each wedge is
    # generated once and matches the oriented closing edge's direction.
    wedges = w1.join(w2, "_s").where(
        (F.col("_dx") < F.col("_dy"))
        | ((F.col("_dx") == F.col("_dy")) & (F.col("_x") < F.col("_y")))
    )
    closing = oriented.select(
        F.col("_s").alias("_x"), F.col("_t").alias("_y")
    )
    tri = wedges.join(closing, ["_x", "_y"]).select("_s", "_x", "_y")
    nodes = F.array_sort(F.array("_s", "_x", "_y"))
    return tri.select(
        nodes[0].alias("n1"), nodes[1].alias("n2"), nodes[2].alias("n3")
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """One-row global cohesion summary of the undirected graph:
    ``(n_edges, n_wedges, n_triangles, transitivity)`` where wedges are
    unordered length-2 paths (Σ C(deg, 2)) and transitivity is the
    global clustering coefficient 3·triangles / wedges (0.0 when the
    graph has no wedge). All three counts are exact INTEGER arithmetic
    (``deg·(deg−1) DIV 2`` summed as bigint — no double sum to go
    inexact past 2^53 on hub-heavy graphs); the one ratio is a single
    double division — deterministic across engines. Three 1-row
    aggregates broadcast-crossJoined, never collected. The canonical
    edge list is localCheckpointed once: three aggregates consume it,
    and without truncation each would re-execute the (often expensive
    — e.g. an inverted-index self-join) upstream pair plan.
    """
    e = _canon_undirected(edges, src, dst).localCheckpoint(eager=True)
    n_edges = e.agg(F.count("*").alias("n_edges"))
    wedges = (
        e.select(F.col("_u").alias("node"))
        .unionByName(e.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
        .agg(
            F.coalesce(
                F.sum(F.expr("_deg * (_deg - 1) DIV 2")), F.lit(0)
            )
            .cast("bigint")
            .alias("n_wedges")
        )
    )
    n_tri = _triangles_canonical(e).agg(F.count("*").alias("n_triangles"))
    return (
        n_edges.join(F.broadcast(wedges))
        .join(F.broadcast(n_tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") > 0,
                   3.0 * F.col("n_triangles") / F.col("n_wedges"))
            .otherwise(F.lit(0.0))
            .alias("transitivity"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "a",
    dst: str = "b",
    node_col: str = "node",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Level-synchronous BFS: minimum hop count from a seed SET to
    every node within ``max_hops`` — the reachability primitive
    (contamination spread through a dup graph, supply-chain blast
    radius, k-hop feature neighborhoods).

    ``edges`` is a DIRECTED (``src``, ``dst``) list — pass both
    directions for undirected semantics. ``seeds`` is a 1-column frame
    of start nodes (hop 0). Returns ``(node, hops)`` with one row per
    reached node; because each level excludes everything already
    visited, the first time a node appears IS its minimum distance —
    no min-aggregate needed, and the loop can stop early when a
    frontier empties.

    Scale shape, per level: one equi-join shuffle of the CURRENT
    frontier (never the visited set) against the edge list on
    ``src``, a distinct on the new frontier, and a left_anti against
    the accumulated visited set — all hash-partitioned on the node
    key; nothing is ever collected to the driver and no window is
    used. The frontier-dedup bounds every level at |V| rows no matter
    how many paths exist (the path-enumeration blowup is the classic
    BFS-in-SQL mistake). ``localCheckpoint`` truncates the loop
    lineage every ``checkpoint_every`` levels, same discipline as
    :func:`pagerank`; ``max_hops`` bounds the join count, making the
    whole plan k·(join+distinct+anti) — deterministic, shuffle-least,
    and skew-tolerant under AQE.

    Reference analog: none — beyond-reference graph reachability over
    the trade/dup graphs (SURVEY.md §2 extensions).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    visited = (
        seeds.select(F.col(seeds.columns[0]).alias(node_col))
        .distinct()
        .withColumn("hops", F.lit(0))
    )
    frontier = visited.select(node_col)
    for h in range(1, max_hops + 1):
        # Alias both sides: from hop 2 on the frontier DERIVES from
        # edges, and un-aliased self-referencing joins hit Spark's
        # ambiguous-attribute resolution.
        nxt = (
            frontier.alias("_f")
            .join(edges.alias("_e"), F.col(f"_f.{node_col}") == F.col(f"_e.{src}"))
            .select(F.col(f"_e.{dst}").alias(node_col))
            .distinct()
            .join(visited.select(node_col), node_col, "left_anti")
            .withColumn("hops", F.lit(h))
        )
        if checkpoint_every and h % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
            if not nxt.take(1):  # early exit only when already materialized
                break
        visited = visited.unionByName(nxt)
        frontier = nxt.select(node_col)
    return visited


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "a",
    dst: str = "b",
    total_mass: float = 1.0,
    exact_contrib_decimal: str | None = None,
) -> DataFrame:
    """Personalized PageRank: importance RELATIVE TO a seed set — the
    teleport vector is uniform over ``seeds`` instead of all nodes, so
    rank mass concentrates in the seeds' neighborhood. The standard
    similarity/recommendation primitive ("which entities matter from
    HERE"), and the weighted cousin of :func:`bfs_hops`' 0/1
    reachability.

    Semantics: mass starts uniform on the seeds; each round a node
    receives ``d`` times its in-neighbors' pushed mass, and the
    teleport share ``(1−d)·M`` plus ALL dangling mass returns to the
    seeds uniformly (the standard PPR dangling rule — sending it to
    every node would leak mass out of the personalization). Ranks sum
    to ``total_mass`` every round (property-pinned with dangling
    nodes in tests/test_graph.py).

    Scale shape per round is :func:`pagerank`'s (one src-keyed push
    join, one dst-keyed partial-sum aggregate, a 1-row dangling
    aggregate, checkpointed lineage); the seed membership flag rides
    the rank vector as a column, so the per-round plan adds no join.
    ``exact_contrib_decimal`` + large ``total_mass`` give the same
    cross-engine bit-exactness as the global variant.
    """
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).localCheckpoint(eager=True)
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("_seed", F.lit(1))
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .union(seed_nodes.select("node"))
        .distinct()
        .join(seed_nodes, "node", "left")
        .select("node", F.coalesce("_seed", F.lit(0)).alias("_seed"))
        .localCheckpoint(eager=True)
    )
    k = nodes.agg(F.sum("_seed")).first()[0]
    if not k:
        raise ValueError("seed set is empty (or disjoint from itself?)")
    out_deg = (
        e.groupBy("_src")
        .agg(F.count("*").alias("_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn(
        "rank", F.when(F.col("_seed") == 1, total_mass / k).otherwise(0.0)
    )
    contrib = F.col("rank") / F.col("_deg")
    push_sum = (
        F.sum(contrib.cast(exact_contrib_decimal)).cast("double")
        if exact_contrib_decimal
        else F.sum(contrib)
    )
    for _ in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg._src, "left"
        ).select("node", "_seed", "rank", "_deg")
        dangling_sum = (
            F.sum(F.col("rank").cast(exact_contrib_decimal)).cast("double")
            if exact_contrib_decimal
            else F.sum("rank")
        )
        dangling = (
            with_deg.where(F.col("_deg").isNull())
            .agg(F.coalesce(dangling_sum, F.lit(0.0)).alias("_dm"))
            .first()["_dm"]
        )
        pushed = (
            with_deg.where(F.col("_deg").isNotNull())
            .join(e, F.col("node") == F.col("_src"))
            .groupBy(F.col("_dst").alias("node"))
            .agg(push_sum.alias("_in"))
        )
        seed_base = ((1.0 - damping) * total_mass + damping * dangling) / k
        prev = ranks
        ranks = (
            nodes.join(pushed, "node", "left")
            .select(
                "node",
                "_seed",
                (
                    F.when(F.col("_seed") == 1, F.lit(seed_base)).otherwise(0.0)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        prev.unpersist()
    return ranks.select("node", "rank")
