"""Connected components by min-label propagation -- the step that turns
pairwise near-dup matches into dedup CLUSTERS (every doc gets the
lowest doc id of its transitive component as `cluster_id`; the cluster
representative keeps, the rest drop).

The reference has nothing iterative (it is a straight-line batch job);
this is the north-star dedup extension's closing step, and the one
corpus algorithm that is NOT a single Catalyst plan: label propagation
is a driver-side loop of DataFrame rounds, the same structure GraphX /
GraphFrames use for their `connectedComponents`.

Scale design per round: one equi-join (labels onto symmetric edges,
shuffle on vertex id) + one min-aggregate (map-side combined) + one
left join back -- all key-partitioned, no broadcast of anything
O(|V|).  Rounds needed = component diameter (near-dup clusters are
shallow; a cap guards pathological chains).  Each round ends in
`localCheckpoint(eager=True)`, which truncates the lineage so round N
does not replay rounds 1..N-1 (without it the plan doubles every
iteration), and doubles as the convergence action.  The per-round
convergence check is a driver-side count of changed labels -- O(1)
result, not a collect of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(vertices: DataFrame, edges: DataFrame,
                         id_col: str, src_col: str, dst_col: str,
                         max_rounds: int = 25) -> DataFrame:
    """(id, cluster_id): cluster_id = min vertex id reachable from id
    over undirected ``edges`` (self if isolated).  Exact, deterministic.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["vid"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        proposed = (
            labels.join(neighbor_min, labels["vid"] == neighbor_min["src"], "left")
            .select(
                "vid",
                F.col("label").alias("old_label"),
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
            )
        ).localCheckpoint(eager=True)
        changed = proposed.filter(F.col("label") != F.col("old_label")).count()
        labels = proposed.select("vid", "label")
        if changed == 0:
            break

    return labels.select(F.col("vid").alias(id_col), F.col("label").alias("cluster_id"))


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             iterations: int = 3, damping: float = 0.85) -> DataFrame:
    """(node, rank): fixed-iteration PageRank over directed ``edges``
    (duplicate edges collapsed), the simplified SQL-standard form --
    rank(v) = (1-d)/N + d * sum(rank(u)/outdeg(u) over in-edges), with
    no dangling-mass redistribution (dangling nodes' rank decays to the
    teleport term; deterministic and identical in any engine, which is
    what makes the result exactly oracle-able).

    Scale design: the node set, out-degrees and deduped edge list are
    computed once and persisted -- every iteration reuses the cached
    exchanges (AQE TableCacheQueryStage) instead of replaying the
    fact-table lineage.  Each iteration is one key-partitioned
    equi-join of the current ranks onto the edge list (shuffle on
    src/node), one map-side-combined sum over dst, and one left join
    back onto the node set; nothing of O(|V|) or O(|E|) is broadcast
    or collected.  N rides along the node set as a column (1-row
    broadcast cross join), so the whole computation is ONE lazy plan:
    with a fixed, small iteration count the lineage stays shallow and
    Catalyst sees every round -- for open-ended convergence loops use
    the :func:`connected_components` localCheckpoint-per-round
    structure instead.
    """
    edges = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count("*").alias("__n"))
    nodes = nodes.join(F.broadcast(n)).persist()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.select("node", (F.lit(1.0) / F.col("__n")).alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks, F.col("src") == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("__in"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
