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
  a handful of rounds. For adversarial long-chain graphs use the
  large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14), which converges in
  O(log n) rounds with the same join-shape per round — same API, drop-in.
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
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]

    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("neigh_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:  # labels only shrink: equal sum <=> fixpoint
            return labels.select("node", F.col("comp").alias("component_id"))
        prev_sum = new_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use large-star/small-star for long-chain graphs"
    )
