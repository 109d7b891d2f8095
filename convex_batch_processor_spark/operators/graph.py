"""Connected components over a pair/edge table — the cluster-collapse step
of near-duplicate deduplication.

The near-dup operators (llmops.dedup, llmops.similarity) emit PAIRS
(id_a, id_b, score). A training-data pipeline needs CLUSTERS: the
transitive closure of "is a near-dup of", so each duplicate group keeps
exactly one representative. This module turns pairs into
(node, component_id) with component_id = min node id in the component —
deterministic, engine-independent, and therefore oracle-checkable
(DuckDB: recursive-CTE transitive closure).

Algorithm: iterative min-label propagation.
  label(n) := n; repeat: label(n) := min(label(n), min over neighbors
  label(m)) until no label changes. Each round is one join + one
  aggregation, all DataFrame ops; convergence is detected by the sum of
  labels (strictly decreasing until fixpoint — labels only ever shrink,
  so equal checksums <=> no change).

Scale notes (100 TB):
- Rounds needed = graph diameter. Near-dup graphs are unions of SMALL
  dense clusters (diameter 2-4 in practice), so propagation converges in
  a handful of rounds. For adversarial long-chain graphs use
  ``connected_components_star`` below — the large-star/small-star
  alternation (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14), which converges in O(log n) rounds with the same
  per-round join shape. Same output contract, drop-in.
- Every round shuffles O(|E|) on node id; duplicate clusters are small so
  keys are near-uniform (no skew salting needed).
- ``localCheckpoint`` truncates the lineage each round — without it the
  plan doubles per iteration and Catalyst analysis time explodes long
  before data size matters.

Reference parity note: the reference has no graph operator (its only
"grouping" is retention rank, lib.ts:679-692); this is a north-star
addition per SURVEY.md §2.11 (near-dup detection end-game).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``.

    ``component_id`` is the minimum node id reachable via undirected
    edges — a canonical, deterministic cluster label. Raises if the
    propagation hasn't converged after ``max_iter`` rounds (near-dup
    graphs converge in ~diameter rounds; see module docstring for the
    log-round alternative on adversarial graphs).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialize once: the edge lineage (e.g. a full near-dup pair
    # computation) must not re-execute in every propagation round
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        # fixpoint = ZERO labels changed this round — an exact, type-
        # agnostic test over the already-checkpointed frame. (The earlier
        # sum('comp') checksum broke for every non-small-numeric id type:
        # ANSI CAST_INVALID_INPUT on string ids, long overflow on
        # hash-range ids, and NULL==NULL false convergence with ANSI off.)
        # ONE action per round: the checkpoint is lazy and the FULL
        # convergence count (no limit — every partition must compute so
        # the checkpoint covers them all) materializes it — the former
        # eager-checkpoint + count pair cost two scheduler round-trips
        # per round for the same work (guide §1.2: per-round fixed costs
        # dominate iterative operators on bounded label tables).
        stepped = (
            labels.join(neigh_min, labels.node == neigh_min.a, "left")
            .select(
                "node",
                F.col("comp").alias("_prev"),
                F.least(F.col("comp"), F.coalesce("neigh_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("comp") != F.col("_prev")).count()
        labels = stepped.select("node", "comp")
        if changed == 0:
            return labels.select("node", F.col("comp").alias("component_id"))

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use connected_components_star for long-chain graphs"
    )


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as distinct (lo, hi) pairs, self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _edge_checksum(e: DataFrame) -> tuple[int, int]:
    # bit_xor: order-independent, overflow-free (edge sets are distinct, so
    # no duplicate-cancellation concern); count guards xor collisions.
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("lo", "hi")), F.lit(0)).alias("h"),
    ).first()
    return row.n, row.h


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component_id) via large-star/small-star alternation —
    O(log n) rounds on ANY graph shape (Kiveris et al., SoCC'14).

    Use this instead of ``connected_components`` when clusters may be
    long chains / high diameter (e.g. transitively-chained near-dups
    from low similarity thresholds): min-label propagation needs
    diameter rounds, this needs ~log₂(n).

    Each round: large-star hangs every neighbor v > u onto
    min(Γ(u) ∪ {u}); small-star re-hangs the smaller neighbors. Both are
    one groupBy + one equi-join over the edge list (shuffle O(|E|) on
    node id). Fixpoint = the edge set is unchanged, at which point every
    edge is (component-min, node) — a star per component.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = _canonical(edges, src, dst).localCheckpoint(eager=True)
    prev = _edge_checksum(e)

    for _ in range(max_iter):
        # --- large-star: for each center u, emit (m, v) for neighbors v > u,
        # m = min(Γ(u) ∪ {u}). Centers are BOTH endpoints (symmetrized).
        und = e.union(e.select(F.col("hi").alias("lo"), F.col("lo").alias("hi")))
        und = und.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        mins = (
            und.groupBy("u")
            .agg(F.min("v").alias("nm"))
            .select("u", F.least("u", "nm").alias("m"))
        )
        e = _canonical(
            und.join(mins, "u").filter(F.col("v") > F.col("u")).select("v", "m"),
            "v",
            "m",
        ).localCheckpoint(eager=True)

        # --- small-star: group by the larger endpoint; re-hang its smaller
        # neighbors (and itself) onto the minimum of those neighbors.
        mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
        rehung = e.join(mins, "hi").select(F.col("lo").alias("v"), "m")
        center = mins.select(F.col("hi").alias("v"), "m")
        e = _canonical(rehung.union(center), "v", "m").localCheckpoint(eager=True)

        cur = _edge_checksum(e)
        if cur == prev:
            star = e.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
            return (
                nodes.join(star, "node", "left")
                .select(
                    "node",
                    F.coalesce("comp", "node").alias("component_id"),
                )
            )
        prev = cur

    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )
