"""Strongly connected components via bounded transitive closure.

Reference: ``algo/StronglyConnectedComponents.java:225`` — a sequential
iterative Tarjan variant (inherently DFS-ordered, not data-parallel).
The Spark-native reformulation here computes the t-bounded reachability
relation by **join doubling** (reach_{2t} = reach_t ∘ reach_t, so t=2^k
needs k self-joins) and labels x with min{y : x⇝y ∧ y⇝x} — exact
whenever t ≥ the graph's diameter.

Scale notes: closure pairs are O(Σ|ball|) — fine on sparse/banded
graphs and on pruned subgraphs, quadratic on dense cores.  For web-scale
SCC the standard trick composes this with trimming (degree-0 peeling)
and the giant-SCC FW-BW split from one pivot; ``trim`` implements the
peeling.  The reference's "buckets" (terminal non-dangling components,
``StronglyConnectedComponents``) derive from the same labels + the
quotient DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.graph import Graph


def bounded_closure(g: Graph, t: int) -> DataFrame:
    """(x, y) pairs with a directed path x⇝y of length ≤ t (incl. x=x),
    by join doubling — ceil(log2 t) shuffle rounds."""
    edges = g.edges.select("src", "dst").distinct()
    reach = (
        g.nodes()
        .select(F.col("id").alias("x"), F.col("id").alias("y"))
        .union(edges.select(F.col("src").alias("x"), F.col("dst").alias("y")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    span = 1
    while span < t:
        nxt = (
            reach.alias("a")
            .join(reach.alias("b"), F.col("a.y") == F.col("b.x"))
            .select(F.col("a.x").alias("x"), F.col("b.y").alias("y"))
            .union(reach)
            .distinct()
            .localCheckpoint(eager=True)
        )
        reach = nxt
        span *= 2
    return reach


def strongly_connected_components(g: Graph, t: int = 32) -> DataFrame:
    """(id, comp): comp = min id in the SCC; exact when t ≥ diameter."""
    reach = bounded_closure(g, t)
    back = reach.select(F.col("y").alias("x"), F.col("x").alias("y"))
    mutual = reach.intersect(back)
    return mutual.groupBy(F.col("x").alias("id")).agg(F.min("y").alias("comp"))


def trim(g: Graph, rounds: int = 3) -> Graph:
    """Iteratively peel nodes with in- or out-degree 0 — they are
    singleton SCCs; the standard preprocessing that shrinks real graphs
    drastically before closure/FW-BW."""
    edges = g.edges.select("src", "dst")
    for _ in range(rounds):
        srcs = edges.select(F.col("src").alias("id")).distinct()
        dsts = edges.select(F.col("dst").alias("id")).distinct()
        core = srcs.join(dsts, "id", "inner")
        edges = (
            edges.join(core.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(core.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
    return Graph(edges, dense=False)
