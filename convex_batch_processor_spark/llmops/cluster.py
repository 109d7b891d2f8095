"""Distributed k-means clustering over an embedding column (Lloyd's
algorithm) — the unsupervised counterpart of the label-seeded IVF coarse
quantizer in similarity.py, and the missing piece for clustering-based
curation (cluster-balanced sampling, SemDeDup-style per-cluster dedup).

Spark shape per iteration (scale-first):
- centroids are k·dim doubles — always broadcast; the assignment step is
  a map-side argmin over the corpus (no shuffle of vectors).
- centroid recomputation is ONE aggregation shuffle keyed by
  (cluster, dim) after a posexplode — the same distributed elementwise
  mean as similarity.label_centroids, uniform keys, no skew beyond the
  cluster-size imbalance inherent to the data.
- the new centroid table is ``localCheckpoint``ed each round so the plan
  does not grow with iterations (the graph.py / IVF lesson: an iterative
  lineage re-executes the whole history every action otherwise).

Determinism: init picks the ``k`` lowest-id vectors (no RNG), distances
are exact double folds with an (dist asc, cluster_id asc) tiebreak — the
numpy replica in tests reproduces the same assignments and centroids to
float tolerance.

Total cost for ``n_iter`` rounds: n_iter corpus scans + n_iter (cluster,
dim)-keyed shuffles of k·dim·P partial rows — at 100 TB the scans
dominate and are embarrassingly parallel; nothing is ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot_col


def _l2_assign(
    embeddings: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cluster_id, dist2): nearest centroid per vector by squared L2.

    dist² = |v|² − 2·v·c + |c|² with the |c|² term precomputed on the tiny
    centroid table; the per-pair work is one dot product fold, JVM-side.
    """
    c = centroids.select(
        "cluster_id",
        "centroid",
        dot_col(F.col("centroid"), F.col("centroid")).alias("c2"),
    )
    v2 = dot_col(F.col(vec_col), F.col(vec_col))
    dist2 = v2 - 2.0 * dot_col(F.col(vec_col), F.col("centroid")) + F.col("c2")
    w = Window.partitionBy(id_col).orderBy(F.col("dist2").asc(), F.col("cluster_id").asc())
    return (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(c))
        .select(F.col(id_col), F.col("cluster_id"), dist2.alias("dist2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means: returns the trained (cluster_id, centroid) table.

    Init = the k lowest-id vectors (deterministic, no RNG; at real scale
    swap in k-means|| style sampled init — the iteration body is
    unchanged). Empty clusters keep their previous centroid (the join
    below is left on the previous table).
    """
    w = Window.orderBy(F.col(id_col).asc())
    centroids = (
        embeddings.select(id_col, vec_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            (F.col("rn") - 1).alias("cluster_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iter):
        assign = _l2_assign(embeddings, centroids, id_col, vec_col)
        dim_means = (
            embeddings.select(id_col, vec_col)
            .join(assign.select(id_col, "cluster_id"), id_col)
            .select("cluster_id", F.posexplode(F.col(vec_col)).alias("dim", "val"))
            .groupBy("cluster_id", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
        )
        new_c = dim_means.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
        # left join: a cluster that captured no vectors keeps its centroid
        centroids = (
            centroids.select("cluster_id", F.col("centroid").alias("prev"))
            .join(new_c, "cluster_id", "left")
            .select(
                "cluster_id", F.coalesce("centroid", "prev").alias("centroid")
            )
            .localCheckpoint(eager=True)
        )
    return centroids


def kmeans_clusters(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (id, cluster_id, dist2 rounded to 6 dp)."""
    centroids = kmeans_fit(embeddings, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    out = _l2_assign(embeddings, centroids, id_col, vec_col)
    return out.select(id_col, "cluster_id", F.round("dist2", 6).alias("dist2"))
