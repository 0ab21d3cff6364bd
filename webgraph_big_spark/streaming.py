"""Structured Streaming ingest — incremental graph maintenance.

The reference engine is batch-only (``ImmutableGraph`` is immutable by
contract; updates mean a full ``BVGraph.store`` rebuild).  The
Spark-native extension: arcs arrive continuously (crawl frontier,
repo-commit feed), and the engine maintains derived graph state
incrementally with Structured Streaming:

- :func:`stream_arc_files` — file-source stream of (src, dst[, ts]) arc
  batches (each dropped parquet file = one micro-batch of new arcs).
- :func:`incremental_degrees` — cumulative out/in-degree counts kept in
  a versioned parquet state table, updated per micro-batch via
  ``foreachBatch`` (read current state → full-outer merge → write next
  version → atomically flip a pointer file).  This is the streaming
  analogue of ``outdegrees()`` and the pattern to extend to any
  decomposable aggregate (degree histograms, host counts, …).
- :func:`windowed_arc_counts` — event-time windowed arc rates with a
  watermark: late arcs beyond the watermark are dropped, closed windows
  append to a parquet log (the readStream → watermark → window → agg →
  writeStream shape).

At scale: per-batch work is one partial aggregation of the batch (small)
plus one merge join against the state table keyed by node id — state is
O(nodes) and partitioned; no unbounded executor state is held because
the running totals live in the parquet table, not in the streaming
state store (that is what makes the aggregate restart-safe and
rescalable).  Exactly-once: the checkpointLocation dedups replayed
batches by batch id — the merge function is called with each batch at
most once per successful commit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

ARC_STREAM_SCHEMA = "src long, dst long, ts timestamp"


def stream_arc_files(
    spark: SparkSession, src_dir: str, schema: str = ARC_STREAM_SCHEMA
) -> DataFrame:
    """File-source arc stream: every parquet file that appears under
    ``src_dir`` becomes part of a micro-batch."""
    return spark.readStream.schema(schema).parquet(src_dir)


def _current_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    ptr = os.path.join(state_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        version = json.load(fh)["version"]
    return spark.read.parquet(os.path.join(state_dir, f"v{version}"))


def _commit_state(df: DataFrame, state_dir: str) -> int:
    ptr = os.path.join(state_dir, "_CURRENT")
    version = 0
    if os.path.exists(ptr):
        with open(ptr) as fh:
            version = json.load(fh)["version"] + 1
    df.write.mode("overwrite").parquet(os.path.join(state_dir, f"v{version}"))
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, ptr)  # atomic pointer flip
    return version


def read_degree_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """(id, outdeg, indeg) as of the last committed micro-batch."""
    cur = _current_state(spark, state_dir)
    if cur is None:
        return spark.createDataFrame([], "id long, outdeg long, indeg long")
    return cur


def incremental_degrees(
    arcs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Maintain cumulative (id, outdeg, indeg) across the arc stream.

    Returns the started StreamingQuery.  ``available_now=True``
    processes everything currently in the source then stops — the
    testable/batch-catchup trigger.
    """
    spark = arcs.sparkSession

    def merge(batch: DataFrame, batch_id: int) -> None:
        out = batch.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("d_out")
        )
        inn = batch.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("d_in")
        )
        delta = out.join(inn, "id", "full").select(
            "id",
            F.coalesce("d_out", F.lit(0)).alias("d_out"),
            F.coalesce("d_in", F.lit(0)).alias("d_in"),
        )
        cur = _current_state(spark, state_dir)
        if cur is None:
            merged = delta.select(
                "id",
                F.col("d_out").alias("outdeg"),
                F.col("d_in").alias("indeg"),
            )
        else:
            merged = (
                cur.join(delta, "id", "full")
                .select(
                    "id",
                    (F.coalesce("outdeg", F.lit(0)) + F.coalesce("d_out", F.lit(0))).alias("outdeg"),
                    (F.coalesce("indeg", F.lit(0)) + F.coalesce("d_in", F.lit(0))).alias("indeg"),
                )
            )
        _commit_state(merged, state_dir)

    writer = (
        arcs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_arc_counts(
    arcs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    available_now: bool = False,
):
    """Event-time arc-rate log: per-window arc counts, late data beyond
    the watermark dropped, closed windows appended to parquet."""
    counts = (
        arcs.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("arcs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "arcs",
        )
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
