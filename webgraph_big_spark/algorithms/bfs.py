"""Breadth-first distances — the frontier loop.

Analogue of ``ParallelBreadthFirstVisit`` (``algo/ParallelBreadthFirstVisit.java:79``):
its shared queue + CAS ``marker`` array + per-level CyclicBarrier map to a
``visited`` state DataFrame, a ``frontier`` DataFrame and one Spark job
per level (SURVEY.md §3.3).  ``visit_all`` reproduces ``visitAll()``
(``:272``): restart from the smallest unvisited node until every node is
reached; the per-node "round" is the BFS index — which is exactly how the
reference derives WCC (``algo/ConnectedComponents.java:107``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.graph import Graph
from webgraph_big_spark.transforms import symmetrize


def bfs_distances(
    g: Graph,
    sources: list[int] | DataFrame,
    symmetric: bool = False,
    max_depth: int = 10_000,
    fixed_rounds: int | None = None,
    parents: bool = False,
) -> DataFrame:
    """(id, dist[, parent]) for nodes reachable from any source
    (multi-source BFS).

    Unreached nodes are absent from the result (dist would be ∞).
    ``fixed_rounds`` runs exactly k expansion rounds (oracle gate mode).
    ``parents=True`` adds the BFS-tree parent — the reference's
    ``marker`` holding the parent instead of the round
    (``ParallelBreadthFirstVisit.java:183``); ties are broken
    deterministically by minimum parent id (sources get parent = own
    id, as the reference's roots point at themselves).
    """
    spark = g.edges.sparkSession
    gs = g if symmetric else symmetrize(g)
    edges = gs.edges.select("src", "dst").cache()

    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col("id").cast("long"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "id long")

    first_cols = ["id", F.lit(0).alias("dist")] + (
        [F.col("id").alias("parent")] if parents else []
    )
    visited = src_df.select(*first_cols).localCheckpoint(eager=True)
    frontier = visited
    depth = 0
    limit = fixed_rounds if fixed_rounds is not None else max_depth
    while depth < limit:
        depth += 1
        expand = edges.join(frontier.select(F.col("id").alias("src")), "src")
        if parents:
            nxt_base = expand.groupBy(F.col("dst").alias("id")).agg(
                F.min("src").alias("parent")
            )
        else:
            nxt_base = expand.select(F.col("dst").alias("id")).distinct()
        nxt = (
            nxt_base.join(visited.select("id"), "id", "left_anti")
            .select(
                "id",
                F.lit(depth).alias("dist"),
                *(["parent"] if parents else []),
            )
            .localCheckpoint(eager=True)  # truncate per-level lineage
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt)
        frontier = nxt
        # the union chain itself grows linearly; re-materialize periodically
        if depth % 10 == 0:
            visited = visited.localCheckpoint(eager=True)
    edges.unpersist()
    return visited


def visit_all(g: Graph, symmetric: bool = False) -> DataFrame:
    """(id, round, dist): BFS from node 0, then from the smallest
    unvisited node, etc. — ``ParallelBreadthFirstVisit.visitAll``
    (``algo/ParallelBreadthFirstVisit.java:272``).  ``round`` equals the
    reference's component marker for symmetric graphs."""
    spark = g.edges.sparkSession
    all_nodes = g.nodes().cache()
    remaining = all_nodes
    out = spark.createDataFrame([], "id long, round long, dist int")
    rnd = 0
    while True:
        head = remaining.agg(F.min("id").alias("m")).first()["m"]
        if head is None:
            break
        d = bfs_distances(g, [int(head)], symmetric=symmetric)
        out = out.union(d.select("id", F.lit(rnd).cast("long").alias("round"), F.col("dist").cast("int")))
        remaining = remaining.join(d.select("id"), "id", "left_anti").cache()
        if remaining.isEmpty():
            break
        rnd += 1
    all_nodes.unpersist()
    return out
