"""PageRank — power iteration as a join/aggregate loop.

The north rule's flagship algorithm (PageRank lives in the reference's
LAW companion, not webgraph-big itself — SURVEY.md scope note; the data
model, dense long ids + sorted successor semantics, is the reference's,
``ImmutableGraph.java:201``).

Semantics (documented to match the NumPy oracle exactly):

    r⁰(x)   = 1/n
    r^{t+1}(x) = (1−α)/n + α·( Σ_{y→x} r^t(y)/outdeg(y) + D^t/n )

where D^t = Σ over dangling nodes y (outdeg 0) of r^t(y) — dangling mass
is redistributed uniformly.  α defaults to 0.85.  Ranks sum to 1 every
iteration.  Convergence: L∞(r^{t+1} − r^t) < tol.

Execution shape per iteration (two shuffles, both on node id):
  1. contribs: ranks (n rows, small) ⨝ edges on src — ranks are the
     *small* side; at 100 TB the edge table stays partitioned by src
     across iterations so only ranks move.
  2. groupBy(dst).sum — map-side partial aggregation combines hub fan-in
     before the shuffle; AQE skew-join handles residual hub skew
     (see skew.py for the explicit salting path + metrics).

Dangling mass + delta are computed in the same pass via a join of old and
new ranks (one action per iteration).  Lineage is truncated through
IterativeRunner parquet checkpoints (resumable per the north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.checkpoint import IterativeRunner
from webgraph_big_spark.graph import Graph


def pagerank(
    g: Graph,
    alpha: float = 0.85,
    tol: float = 1e-8,
    max_iterations: int = 200,
    run_dir: str | None = None,
    checkpoint_every: int = 20,
    resume: bool = True,
    fixed_iterations: int | None = None,
    check_every: int = 4,
) -> DataFrame:
    """Returns (id, rank) over all n nodes.

    ``fixed_iterations`` runs exactly that many rounds with no convergence
    test (used by the SQL-oracle gate); otherwise the L∞ delta is tested
    every ``check_every`` rounds (a convergence probe is an extra action;
    probing every round would double driver latency for no benefit —
    power iteration's delta decays geometrically).
    """
    spark = g.edges.sparkSession
    n = g.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    # Static per-iteration input: edges pre-joined with the source
    # outdegree, built once and lineage-truncated.  The degree join
    # shuffles by src, which would leave every mega-hub's arcs in ONE
    # partition for the rest of the run — rebalance round-robin so scan
    # tasks are even (locality is irrelevant on the broadcast-join path).
    spark_parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_w = (
        g.edges.select("src", "dst")
        .join(g.out_degrees().withColumnRenamed("id", "src"), "src")
        .repartition(spark_parallelism)
        .localCheckpoint(eager=True)
    )

    def initial() -> DataFrame:
        return g.nodes().select("id", F.lit(1.0 / n).alias("rank"))

    def step(ranks: DataFrame, it: int):
        # One lazy plan per round.  Σ ranks ≡ 1 (the update preserves it),
        # so dangling mass = 1 − Σ inflow — computed from the SAME
        # aggregated exchange (Catalyst reuses it) instead of a second
        # scan, and folded in via a 1-row broadcast cross-join.
        # After localCheckpoint the rank DataFrame is a LogicalRDD with no
        # size statistics, so Catalyst would silently fall back to a
        # sort-merge join that reshuffles the whole edge table every
        # round.  Broadcast the rank side explicitly while it fits (n
        # rows × ~24 B); beyond that, a real deployment buckets edges_w
        # by src so the SMJ shuffles only ranks.
        rank_side = ranks.select(F.col("id").alias("src"), "rank")
        if n <= 20_000_000:
            rank_side = F.broadcast(rank_side)
        contribs = (
            edges_w.join(rank_side, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("inflow"))
        )
        tot = contribs.agg(F.coalesce(F.sum("inflow"), F.lit(0.0)).alias("_tot"))
        new_ranks = (
            ranks.select("id")
            .join(contribs, "id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "id",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + (F.lit(1.0) - F.col("_tot")) / n
                    )
                ).alias("rank"),
            )
        )
        if fixed_iterations is not None:
            changed = None if it + 1 < fixed_iterations else 0
            return new_ranks, changed
        return new_ranks, None

    def check(old: DataFrame, new: DataFrame, it: int):
        if (it + 1) % check_every != 0:
            return None
        # L∞ delta probe over the two materialized (checkpointed) states
        delta = (
            new.join(old.withColumnRenamed("rank", "prev"), "id")
            .agg(F.max(F.abs(F.col("rank") - F.col("prev"))))
            .first()[0]
        )
        return 0 if delta < tol else 1

    runner = IterativeRunner(
        spark,
        run_dir=run_dir,
        checkpoint_every=checkpoint_every,
        max_iterations=fixed_iterations or max_iterations,
    )
    result = runner.run(initial, step, check=None if fixed_iterations else check, resume=resume)
    return result.state
