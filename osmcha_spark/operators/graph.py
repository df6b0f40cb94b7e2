"""PageRank over an edge table — one exact integer step + the iterated
driver loop.

Together with connected components (operators/components.py) this gives
the engine both flavors of iterative graph computation a corpus pipeline
uses: CC for "which docs are the same" (dedup clusters), PageRank for
"which docs/hosts matter" — the classic quality prior for crawl-corpus
curation (link-graph authority feeding sampling weights, e.g. via
:func:`~osmcha_spark.operators.sampling.priority_sample`).

Integer-exact semantics (the repo's oracle-portability discipline,
synth.py): ranks live in parts-per-million (ppm). One step computes

    contrib(e)   = rank_ppm(src) div out_degree(src)      -- integer div
    rank'_ppm(v) = (1-d)·10^6 + (d_ppm · Σ inflow(v)) div 10^6

with d_ppm the damping in ppm (850_000 = 0.85). Every quantity is an
int64 pure function of the input graph, so the q74 oracle checks VALUES.
Truncation loses < 1 ppm per edge — the same order as float PageRank's
convergence tolerance, with none of float's reduction-order sensitivity.
Overflow: Σ inflow ≤ N·10^6, so ``d_ppm·Σ`` needs N < 2^62/(10^6·850e3)
≈ 5·10^9 nodes — comfortable; shift to ppb arithmetic past that.

Dangling nodes (out-degree 0) contribute nothing — their mass leaks,
matching the "no redistribution" PageRank variant; nodes with no
in-edges settle at the base (1-d)·10^6. The step is defined over the
NODES frame, so isolated vertices keep a rank.

Scale shape per step: ranks ⋈ edges on src (the fact-sized shuffle;
pre-partitioning both frames on the join key makes every later round
reuse the layout), map-side-combined sum per dst, left join back to
nodes (one more key shuffle). The iterated driver mirrors
components.py/knn.py: lineage truncated per round — localCheckpoint by
default, RELIABLE checkpoints via ``checkpoint_dir`` for executor-loss
safety on a real cluster — and only the round counter crosses to the
driver.

Reference counterpart: none (osmcha has no graph surface); mandated by
the training-pipeline inventory (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def pagerank_step(
    nodes: DataFrame,
    edges: DataFrame,
    ranks: DataFrame,
    damping_ppm: int = 850_000,
    id_col: str = "node_id",
) -> DataFrame:
    """One exact integer PageRank step.

    ``nodes``: (id_col); ``edges``: (src, dst); ``ranks``:
    (id_col, rank_ppm). Returns (id_col, rank_ppm) for every node.
    """
    if not 0 <= damping_ppm <= PPM:
        raise ValueError("damping_ppm must be in [0, 10^6]")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    contrib = (
        edges.join(deg, "src")
        .join(ranks.select(F.col(id_col).alias("src"), "rank_ppm"), "src")
        .select(
            "dst", F.expr("rank_ppm div _od").alias("_c")
        )
    )
    inflow = contrib.groupBy("dst").agg(F.sum("_c").alias("_in"))
    base = PPM - damping_ppm
    return (
        nodes.join(
            inflow, nodes[id_col] == inflow["dst"], "left"
        )
        .select(
            nodes[id_col],
            (
                F.lit(base)
                + F.expr(
                    f"({damping_ppm}L * coalesce(_in, 0L)) div {PPM}L"
                )
            ).cast("long").alias("rank_ppm"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping_ppm: int = 850_000,
    id_col: str = "node_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``n_iter`` steps from the uniform start (10^6 ppm each), lineage
    truncated per round; reliable checkpoints when ``checkpoint_dir`` is
    given (the knn_join_adaptive durability tradeoff — see its
    docstring)."""
    if checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.localCheckpoint() if checkpoint_dir is None
            else df.checkpoint()
        )

    ranks = nodes.select(
        F.col(id_col), F.lit(PPM).cast("long").alias("rank_ppm")
    )
    edges = _ckpt(edges)
    for _ in range(int(n_iter)):
        ranks = _ckpt(
            pagerank_step(
                nodes, edges, ranks, damping_ppm=damping_ppm, id_col=id_col
            )
        )
    return ranks
