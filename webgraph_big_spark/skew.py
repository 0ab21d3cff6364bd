"""Skew defense: hub detection, salted two-phase aggregation, and
degree-aware (arc-balanced) repartitioning.

The reference's arc-balanced work splitting is
``EliasFanoCumulativeOutdegreeList`` (``algo/EliasFanoCumulativeOutdegreeList.java:30-41``,
used by HyperBall at ``algo/HyperBall.java:748-771``): tasks cover equal
numbers of *arcs*, not nodes, so hub vertices don't stall cores
(``algo/ParallelBreadthFirstVisit.java:72-77`` warns about exactly this).

Spark translation:
- AQE skew-join splitting handles the join side automatically (enabled in
  session.py), but per-iteration aggregation fan-in on hub keys is ours:
  ``salted_sum`` splits a hub key into K salted partials, partially
  aggregates, then re-aggregates — two small shuffles instead of one
  skewed one.
- ``repartition_by_cumulative_degree`` assigns partition = bucket of the
  running arc count, the direct analogue of ``skipTo(k)`` splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.functions import global_cumsum
from webgraph_big_spark.graph import Graph


def hub_nodes(g: Graph, threshold: int | None = None, direction: str = "in") -> DataFrame:
    """Nodes whose degree exceeds ``threshold`` (default: 16× the mean) —
    the salting candidates.  Returns (id, deg)."""
    deg = g.in_degrees() if direction == "in" else g.out_degrees()
    col = "indeg" if direction == "in" else "outdeg"
    if threshold is None:
        # mean degree m/n over ALL nodes (a degree table without zero-degree
        # nodes would inflate the mean on exactly the graphs that need this)
        n = max(g.num_nodes(), 1)
        mean = g.num_arcs() / n
        threshold = int(max(16.0 * mean, 64))
    return deg.filter(F.col(col) > threshold).select("id", F.col(col).alias("deg"))


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    hubs: DataFrame,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase sum aggregation with hub salting.

    Rows whose ``key`` is in ``hubs`` get a salt column derived from a
    sibling hash, are partially summed per (key, salt), then finally
    summed per key together with the non-hub rows.  ``hubs`` is broadcast
    (it is tiny by construction — the tail of the degree distribution).

    Note: Spark's hash aggregation already does map-side partial combine,
    which covers most hub fan-in; this explicit variant exists for (a) the
    reduce-side case where a single post-shuffle partition would still
    own a mega-key's partials, and (b) observability (metrics on how much
    mass flowed through hubs).

    Where salting IS load-bearing in this engine: the co-partitioned
    iterative joins.  A mega-OUT-hub's arcs hash to one cached partition
    (hash(src) is constant over them), and AQE cannot split a cached
    non-shuffle join side — so ``pagerank(salt_buckets=B)`` co-partitions
    edges on (src, salt(dst)) and replicates the rank side ×B (the
    integrated production path; hub benchmark in BENCH.md).  For pure
    SUM aggregations the measured benchmark shows partial aggregation
    alone collapses hub fan-in to ≤ one partial row per map task — use
    this function only for the (a)/(b) cases above.
    """
    h = F.broadcast(hubs.select(F.col("id").alias(key), F.lit(True).alias("_is_hub")))
    tagged = df.join(h, key, "left")
    salted = tagged.withColumn(
        "_salt",
        F.when(
            F.col("_is_hub").isNotNull(),
            F.pmod(F.xxhash64(*[c for c in df.columns if c != key]), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)),
    )
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(value))


def repartition_by_cumulative_degree(g: Graph, num_partitions: int) -> DataFrame:
    """Repartition edges so every partition holds ~m/num_partitions arcs
    regardless of degree skew — ``EliasFanoCumulativeOutdegreeList.skipTo``
    as a Spark layout step.

    Computes per-source outdegree, the running (cumulative) arc count in
    src order, buckets it, and range-repartitions the edges on the bucket.
    The degree scan is one extra aggregation; do this once before an
    iterative job, not per iteration.

    The prefix sum uses :func:`global_cumsum` (range-partitioned parallel
    sort + driver offset cumsum) — never a single-task global window,
    which at 10⁹ nodes would serialize the whole degree table through
    one core.
    """
    deg = g.out_degrees()
    cum = global_cumsum(deg, ["id"], "outdeg", out="cum").select("id", "cum")
    total = g.num_arcs()
    per_part = max(1, total // num_partitions)
    buckets = cum.select(
        F.col("id").alias("src"),
        (F.col("cum") / F.lit(per_part)).cast("long").alias("_bucket"),
    )
    return (
        g.edges.join(F.broadcast(buckets), "src")
        # dst in the range key lets the partitioner split INSIDE a single
        # mega-hub's arc range (a hub bigger than one fair share would
        # otherwise land whole in one partition)
        .repartitionByRange(num_partitions, "_bucket", "src", "dst")
        .drop("_bucket")
    )


def skew_metrics(df: DataFrame, key: str) -> dict:
    """Per-key skew report for the runs/metrics table: max/mean/percentile
    of group sizes — recorded each iteration per the north rule."""
    stats = (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.max("cnt").alias("max_cnt"),
            F.avg("cnt").alias("mean_cnt"),
            F.expr("percentile_approx(cnt, 0.99)").alias("p99_cnt"),
            F.count("*").alias("n_keys"),
        )
        .first()
    )
    d = stats.asDict()
    d["skew_ratio"] = float(d["max_cnt"]) / max(float(d["mean_cnt"]), 1e-12)
    return d
