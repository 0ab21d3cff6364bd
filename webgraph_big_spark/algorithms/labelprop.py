"""Synchronous label propagation with deterministic tie-breaking.

North-rule algorithm (lives in the reference's LAW companion; built here
over the reference's data model — dense long ids, directed arcs used
symmetrically).

Semantics (documented to match the pure-Python oracle exactly):

    l⁰(x) = x
    l^{t+1}(x) = argmax over labels l of |{y ∈ N(x): l^t(y) = l}|,
                 ties broken by the smallest label; nodes with no
                 neighbours keep their label.

Synchronous rounds + total-order tie-break make runs reproducible across
partitionings/cluster sizes (SURVEY.md §7 hard part 5).

Per round: one join (labels → edges) + one count aggregation + one
window argmax partitioned by node.  The window runs over the (node,
label, cnt) table, which is ≤ one row per distinct (node, neighbour
label) — much smaller than the edge table after the count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from webgraph_big_spark.checkpoint import IterativeRunner
from webgraph_big_spark.graph import Graph, co_partitioned
from webgraph_big_spark.transforms import symmetrize


def label_propagation(
    g: Graph,
    rounds: int = 10,
    symmetric: bool = False,
    until_stable: bool = False,
    run_dir: str | None = None,
    checkpoint_every: int = 5,
    initial_labels: DataFrame | None = None,
) -> DataFrame:
    """Returns (id, label) after ``rounds`` synchronous rounds (or at the
    fixpoint if ``until_stable``)."""
    spark = g.edges.sparkSession
    gs = g if symmetric else symmetrize(g)
    # hash-partitioned by the per-round join key and pinned: only label
    # rows move per round (see co_partitioned for the full recipe)
    edges = co_partitioned(gs.edges.select("src", "dst"), "src")
    nodes = g.nodes().cache()

    def initial() -> DataFrame:
        if initial_labels is not None:
            return nodes.join(initial_labels, "id", "left").select(
                "id", F.coalesce("label", "id").alias("label")
            )
        return nodes.select("id", F.col("id").alias("label"))

    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))

    def step(labels: DataFrame, it: int):
        # shuffle_hash on the stats-less state side — without it each
        # round falls back to SMJ and re-Exchanges the cached edges
        votes = (
            edges.join(
                labels.select(F.col("id").alias("src"), "label").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        new_labels = labels.join(winner, "id", "left").select(
            "id", F.coalesce("new_label", "label").alias("label")
        )
        if not until_stable:
            return new_labels, (None if it + 1 < rounds else 0)
        return new_labels, None

    def check(old: DataFrame, new: DataFrame, it: int) -> int:
        return (
            new.join(old.withColumnRenamed("label", "prev"), "id")
            .filter(F.col("label") != F.col("prev"))
            .count()
        )

    runner = IterativeRunner(
        spark,
        run_dir=run_dir,
        checkpoint_every=checkpoint_every,
        max_iterations=rounds if not until_stable else 1000,
    )
    result = runner.run(initial, step, check=check if until_stable else None)
    edges.unpersist()
    nodes.unpersist()
    return result.state
