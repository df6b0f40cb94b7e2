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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, tri_cnt) — exact per-node triangle participation counts
    over an undirected simple graph given as canonical edges (a < b,
    distinct). Global triangle count = sum(tri_cnt) / 3.

    Algorithm: degree-ordered orientation (Schank & Wagner's *forward* /
    Cohen's MapReduce formulation): orient every edge from its lower
    (degree, id) endpoint to the higher. Wedges are then built only at
    each triangle's MINIMUM-(degree, id) apex — join oriented edges on
    the apex, keep target pairs ordered by the same key — and a triangle
    closes iff the oriented edge (x → y) between the two targets exists
    (its orientation is forced to x → y by the wedge's own ordering, so
    ONE equi-join closes it; no OR-join, no second pass).

    Why this is the 100-TB shape and a naive 3-way self-join is not: a
    hot vertex of degree d contributes d(d-1)/2 wedges when it is the
    apex, but under degree ordering a max-degree vertex is NEVER an apex
    — every vertex's oriented out-degree is bounded by O(sqrt(m)) on any
    graph (arboricity bound), so the wedge join fans out O(m^1.5) total
    instead of Σ d² (which a power-law hub turns quadratic). The skew
    moves from an unfixable join explosion to an ordinary aggregation
    hot key, which map-side combine absorbs.

    Shuffles: degree agg, two dim joins to attach degrees, the wedge
    self-join on the apex, the closing equi-join on (x, y), one final
    count agg. All equi-joins on derived keys — AQE-splittable.
    """
    e = edges.select("a", "b")
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")),
               "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")),
              "b")
    )
    # a < b always, so lower key is a iff (da < db) or (da == db)
    a_first = (F.col("da") < F.col("db")) | (F.col("da") == F.col("db"))
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dw"),
    )
    o1 = oriented.select("u", F.col("w").alias("x"), F.col("dw").alias("dx"))
    o2 = oriented.select("u", F.col("w").alias("y"), F.col("dw").alias("dy"))
    wedges = o1.join(o2, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("w").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("tri_cnt")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    id_col: str = "node_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS: ``(node_id, hops)`` — the minimum number of
    directed ``src → dst`` edges from ANY seed, bounded by ``max_hops``
    (pass the symmetrized edge table for undirected semantics). The
    traversal primitive behind crawl-frontier expansion, seed-set
    contamination spread, and "within k links of a known-bad host"
    curation filters.

    BSP frontier expansion, O(diameter) rounds like components.py: each
    round joins ONLY the newest frontier against edges (frontier-sized,
    never visited-sized), dedups the targets, and LEFT-ANTI joins the
    visited set so a node keeps its FIRST (minimal) hop count — that
    anti-join is what makes level-synchronous BFS compute min-hops
    without a min-aggregate over all paths (path enumeration is
    exponential; the frontier is bounded by |V|). Lineage truncates per
    round (localCheckpoint, or reliable via ``checkpoint_dir`` — the
    knn_join_adaptive durability tradeoff) and the only thing crossing
    to the driver is each round's frontier count, which doubles as the
    early-exit signal when the reachable set saturates before
    ``max_hops``.
    """
    if checkpoint_dir is not None:
        seeds.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.localCheckpoint() if checkpoint_dir is None
            else df.checkpoint()
        )

    visited = _ckpt(
        seeds.select(F.col(id_col))
        .distinct()
        .select(id_col, F.lit(0).cast("int").alias("hops"))
    )
    frontier = visited.select(id_col)
    for h in range(1, int(max_hops) + 1):
        nxt = _ckpt(
            frontier.join(edges, frontier[id_col] == edges["src"])
            .select(F.col("dst").alias(id_col))
            .distinct()
            .join(visited.select(id_col), id_col, "left_anti")
            .select(id_col, F.lit(h).cast("int").alias("hops"))
        )
        if nxt.isEmpty():
            break
        visited = _ckpt(visited.unionByName(nxt))
        frontier = nxt.select(id_col)
    return visited


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int,
    id_col: str = "node_id",
    weight_col: str = "w",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source weighted shortest paths, bounded: ``(node_id,
    dist)`` = the minimum total edge weight from ANY seed over paths of
    at most ``max_rounds`` directed edges — the weighted rung above
    bfs_hops (hop counts are the ``w = 1`` special case). Weights must
    be non-negative integers for the exact cross-engine contract
    (documented like kmeans_step's nonnegativity rule); negative
    weights relax correctly too but the bounded-path semantics is the
    only oracle-expressible one either way.

    Delta-stepping-flavored Bellman-Ford: each round relaxes ONLY the
    frontier (nodes whose distance improved last round) against edges,
    min-combines per target map-side, and keeps a candidate only when
    it beats the settled table — so work per round is frontier-sized,
    not |V|-sized, and the loop exits early when no distance improves.
    After round k the settled table is EXACTLY min-cost over <=k-edge
    paths (each relaxation consumes one edge), which is what the
    recursive-CTE oracle enumerates at gate scale. Lineage truncates
    per round (localCheckpoint, or reliable via ``checkpoint_dir`` —
    the bfs_hops durability tradeoff); only per-round improved-counts
    cross to the driver.
    """
    if checkpoint_dir is not None:
        seeds.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.localCheckpoint() if checkpoint_dir is None
            else df.checkpoint()
        )

    dist = _ckpt(
        seeds.select(F.col(id_col))
        .distinct()
        .select(id_col, F.lit(0).cast("long").alias("dist"))
    )
    frontier = dist
    for _ in range(int(max_rounds)):
        cand = (
            frontier.join(edges, frontier[id_col] == edges["src"])
            .select(
                F.col("dst").alias(id_col),
                (F.col("dist") + F.col(weight_col).cast("long"))
                .alias("dist"),
            )
            .groupBy(id_col)
            .agg(F.min("dist").alias("dist"))
        )
        improved = _ckpt(
            cand.join(
                dist.select(id_col,
                            F.col("dist").alias("__old")),
                id_col, "left",
            )
            .where(F.col("__old").isNull()
                   | (F.col("dist") < F.col("__old")))
            .select(id_col, "dist")
        )
        if improved.isEmpty():
            break
        dist = _ckpt(
            dist.join(improved.select(id_col), id_col, "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    return dist


def lpa_step(
    nodes: DataFrame,
    edges: DataFrame,
    labels: DataFrame,
    id_col: str = "node_id",
    label_col: str = "label",
) -> DataFrame:
    """One SYNCHRONOUS label-propagation round (Raghavan et al. 2007
    community detection; the Pregel-style synchronous variant — every
    node updates from the SAME previous labeling, which is what makes
    the round order-independent and therefore oracle-exact, the
    q62/q74/q160 one-step rule). Communities are the "which docs cluster
    together" rung between connected components (any path joins) and
    PageRank (authority): dense link neighborhoods converge onto one
    label in a few rounds.

    ``nodes``: (id_col); ``edges``: (src, dst) — treated UNDIRECTED
    via symmetrization, multi-edges vote multiply, a self-loop votes
    the node's own label TWICE (symmetrization emits both directions); ``labels``: (id_col, label_col) with
    NONNEGATIVE integer labels (init: each node its own id).

    new_label(v) = argmax over neighbor-label vote counts, ties broken
    toward the SMALLEST label (the deterministic tiebreak — classic
    async LPA breaks ties randomly, which no oracle can check);
    isolated nodes keep their current label.

    Scale shape per round: one fact-sized equi-join (symmetrized edges
    ⋈ labels on the neighbor id), a map-side-combined (v, label) vote
    count, and the argmax as ``max(struct(count, -label))`` inside a
    second combined groupBy — no window, no per-node sort; the iterated
    driver loop mirrors pagerank/components (truncate lineage per
    round)."""
    sym = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    cur = labels.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__cur"),
    )
    votes = (
        sym.join(cur.select(F.col("__id").alias("u"),
                            F.col("__cur").alias("__nl")), "u")
        .groupBy("v", "__nl")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    best = votes.groupBy("v").agg(
        F.max(F.struct(F.col("__c").alias("c"),
                       (-F.col("__nl")).alias("neg"))).alias("__b")
    )
    return (
        cur.join(best, cur["__id"] == best["v"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(-F.col("__b.neg"), F.col("__cur"))
            .cast("long").alias(label_col),
        )
    )


def k_core_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``rounds`` synchronous peel iterations toward the k-core
    (Seidman 1983; Batagelj & Zaveršnik's peeling formulation) over an
    undirected simple graph given as canonical edges (``a < b``,
    distinct — the triangle_counts contract). Each round removes every
    vertex whose CURRENT degree is below ``k`` (and the edges touching
    it); removals cascade, which is exactly why the k-core is not a
    one-shot degree filter. Returns ``(node, deg)`` — the surviving
    vertices with their degree in the surviving edge set.

    ``rounds`` is EXPLICIT, the q62/q74 step discipline: a fixed round
    count is what the SQL oracle can mirror CTE-for-CTE (q187 chains
    three degree→filter rounds), and the caller loops to the fixed
    point for the true core (each round is monotone — the survivor set
    only shrinks — so `rounds` ≥ the cascade depth converges; on a
    10^12-edge graph cascade depth is the long tail, checkpoint every
    round and stop when the survivor count stabilizes). Note the
    returned degrees may still be below ``k`` when the cascade hasn't
    converged — the NEXT round's removals, visible by construction.

    Scale shape per round: one map-side-combined degree aggregation
    (endpoints union → groupBy) and two broadcast-eligible LEFT SEMI
    joins of the edge set against the survivor dim (survivors ≤
    vertices ≪ edges); lineage truncated per round (localCheckpoint,
    or reliable checkpoints via ``checkpoint_dir`` — the pagerank/bfs
    durability tradeoff). Isolated vertices never appear (no edges),
    matching k ≥ 1 semantics.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.localCheckpoint() if checkpoint_dir is None
            else df.checkpoint()
        )

    def _deg(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )

    e = edges.select("a", "b")
    for _ in range(int(rounds)):
        keep = _deg(e).where(F.col("deg") >= int(k)).select("v")
        e = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
        )
        e = _ckpt(e)
    return _deg(e).select(F.col("v").alias("node"), "deg")
