"""Connected components over near-duplicate pairs — the clustering stage
of a training-data dedup pipeline (pairs → clusters → one canonical doc
per cluster).

The reference has no counterpart (osmcha scores changesets one at a time);
this is the engine-side operator a 100 TB corpus needs after any of the
near-dup pair generators (q19/q22/q38/q39): merge overlapping pairs into
clusters so "keep one copy" is well-defined when A~B and B~C but A≁C.

Algorithm: hash-min label propagation. Every vertex starts labeled with
its own id; each round every vertex takes the min label among itself and
its neighbors; fixpoint = every vertex carries the min id of its
component. Rounds needed = graph diameter — and near-dup graphs are
shallow (clusters are dense blobs of mutual near-dups, not long chains),
so the fixpoint arrives in a handful of rounds. For adversarially deep
graphs the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) converges in O(log² n)
rounds with the same join-per-round shape; hash-min is the right default
for the dedup workload.

Scale shape (100 TB): each round is ONE shuffle — an equi-join of the
label frame against the edge list on the vertex key, followed by a
min-agg on the same key (partial aggregation makes the shuffle carry one
row per (dst) vertex, not one per edge). The driver-side loop holds no
data — only the convergence COUNT crosses to the driver. Lineage is
truncated every round (localCheckpoint) so plan growth stays O(1) per
round instead of O(rounds) at re-optimization time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iter: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """(id) + (a, b) undirected edges → (id, cluster_id) where cluster_id
    is the minimum vertex id reachable from ``id``. Singletons map to
    themselves.

    ``vertices`` must contain every endpoint (extra vertices become
    singletons). Raises after ``max_iter`` non-converged rounds.
    """
    # symmetrize once; labels then only need to flow a->b per round
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("lab")
    )
    if checkpoint:
        sym = sym.localCheckpoint()
        labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # min neighbor label per vertex: join on the SOURCE key, agg on the
        # destination — one shuffle, map-side partial min.
        nbr_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["dst"], "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nbr_lab"), F.col("lab"))
                ).alias("lab"),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node").alias(id_col), F.col("lab").alias("cluster_id")
            )
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end dedup decision: docs + near-dup (a, b) pairs →
    (id, cluster_id, is_canonical, cluster_size). The kept copy is the
    min-id member of each cluster (deterministic, join-free tie-break)."""
    from pyspark.sql import Window

    comps = connected_components(
        docs.select(id_col), pairs, id_col=id_col
    )
    # cluster_size via a window count: one shuffle on cluster_id, no join —
    # cluster count is O(#docs), so a broadcast would not survive 100 TB
    size = F.count("*").over(Window.partitionBy("cluster_id"))
    return comps.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
        size.alias("cluster_size"),
    )
