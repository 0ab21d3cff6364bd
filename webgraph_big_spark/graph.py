"""Core graph data model: an edge DataFrame + CSR adjacency views.

Reference mapping (see SURVEY.md §1.4):

- ``ImmutableGraph`` (reference ``ImmutableGraph.java:201``): node ids are
  dense longs in ``[0, n)``; successor lists sorted ascending, duplicate
  free.  Here a graph is an ``edges(src: long, dst: long)`` DataFrame plus
  a node count; successor lists are a derived CSR DataFrame
  ``adj(src, dsts: array<long>, outdeg)`` built with
  ``sort_array(collect_set(dst))`` — sortedness/dedup enforced exactly as
  the reference enforces it at build time (``Transform.java:848-862``).
- ``outdegrees()`` (``ImmutableGraph.java:453``) → ``groupBy(src).count()``.
- ``splitNodeIterators`` (``ImmutableGraph.java:405``) → Spark partitions.
- ``BVGraph.store`` (``BVGraph.java:1641``) → partitioned parquet write of
  the gap-encoded CSR table + a ``.properties``-style JSON sidecar
  (``meta.json``).  Parquet delta/dict encodings play the role of the
  γ/ζ instantaneous codes; the *semantic* analogue kept from the reference
  is the gap-sorted successor array (``BVGraph.java:141-223``).
- ``ImmutableGraph.equals`` (``ImmutableGraph.java:759``) →
  ``same_graph``: symmetric exceptAll emptiness on canonical arcs.

At 100 TB scale: ``edges`` is bucketed/partitioned by ``src`` so that the
per-source groupBy that builds CSR blocks is shuffle-free after one
repartition, and all iterative algorithms reuse that partitioning.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window

ARC_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


class Graph:
    """An immutable directed graph over an ``edges(src, dst)`` DataFrame.

    Extra columns beyond (src, dst) are arc labels — the analogue of
    ``ArcLabelledImmutableGraph`` (reference
    ``labelling/ArcLabelledImmutableGraph.java:69``).
    """

    def __init__(
        self, edges: DataFrame, num_nodes: int | None = None, dense: bool | None = None
    ):
        """``dense=True`` (reference semantics, ``ImmutableGraph.java:245``):
        the node set is the integer range ``[0, n)`` with n = ``num_nodes``
        or max id + 1.  ``dense=False`` (scattered-id semantics, like
        ``ScatteredArcsASCIIGraph`` *before* its remap): the node set is
        the distinct endpoints actually present.  Defaults to dense when
        ``num_nodes`` is given, else scattered."""
        if "src" not in edges.columns or "dst" not in edges.columns:
            raise ValueError(f"edges must have src/dst columns, got {edges.columns}")
        self.edges = edges
        self._num_nodes = num_nodes
        self.dense = dense if dense is not None else (num_nodes is not None)
        self._touched: DataFrame | None = None

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def from_pairs(
        cls, spark: SparkSession, pairs: Iterable[tuple[int, int]], num_nodes: int | None = None
    ) -> "Graph":
        """Build from an in-memory arc list (tests / tiny fixtures only)."""
        df = spark.createDataFrame(
            [(int(s), int(d)) for s, d in pairs], schema=ARC_SCHEMA
        )
        return cls(df, num_nodes)

    @classmethod
    def from_arc_list_text(
        cls, spark: SparkSession, path: str, sep: str = "\t", shift: int = 0
    ) -> "Graph":
        """Arc-list text source: one ``src<sep>dst`` pair per line.

        Analogue of ``ArcListASCIIGraph`` (``ArcListASCIIGraph.java:102``)
        and, with ``shift=-1``, of ``ShiftedByOneArcListASCIIGraph``
        (``ShiftedByOneArcListASCIIGraph.java:48``).  Unlike the reference,
        input order is irrelevant (Spark shuffles anyway), which also
        covers ``ScatteredArcsASCIIGraph`` (``ScatteredArcsASCIIGraph.java:142``)
        for already-numeric ids; for arbitrary ids use
        :func:`webgraph_big_spark.extract.assign_dense_ids`.
        """
        df = (
            spark.read.schema("src LONG, dst LONG")
            .options(sep=sep, comment="#")
            .csv(path)
        )
        if shift:
            df = df.select(
                (F.col("src") + F.lit(shift)).alias("src"),
                (F.col("dst") + F.lit(shift)).alias("dst"),
            )
        return cls(df, dense=True)

    @classmethod
    def from_adjacency_text(cls, spark: SparkSession, path: str) -> "Graph":
        """ASCII adjacency source: line i = successors of node i, space
        separated (node count header ignored if present on its own line).

        Analogue of ``ASCIIGraph`` (``ASCIIGraph.java:98``), expressed as
        text scan → split → posexplode instead of a sequential parser.
        """
        lines = spark.read.text(path).select(
            (F.monotonically_increasing_id()).alias("_row"), F.col("value")
        )
        # the reference format's first line is the node count; detect a
        # pure single-integer first line and drop it.
        first = lines.orderBy("_row").limit(1).collect()
        skip = 1 if (first and first[0]["value"].strip().isdigit() and " " not in first[0]["value"].strip()) else 0
        # line number = node id: a global window is fine here because this
        # source (like the reference's sequential ASCIIGraph parser,
        # ASCIIGraph.java:98) is inherently order-defined; big inputs
        # should use arc-list/parquet sources instead.
        w_src = F.row_number().over(Window.orderBy("_row")) - 1 - skip
        df = (
            lines.withColumn("src", w_src)
            .filter(F.col("src") >= 0)
            .select(
                "src",
                F.explode(
                    F.filter(F.split(F.trim("value"), r"\s+"), lambda x: x != F.lit(""))
                ).alias("dst_s"),
            )
            .select(F.col("src").cast("long"), F.col("dst_s").cast("long").alias("dst"))
        )
        return cls(df, dense=True)

    # ------------------------------------------------------------------
    # basic accessors (ImmutableGraph surface)
    # ------------------------------------------------------------------
    def num_nodes(self) -> int:
        """n — like ``ImmutableGraph.numNodes`` (``ImmutableGraph.java:245``).

        Dense graphs: declared n or max id + 1.  Scattered graphs:
        count of distinct endpoint ids.
        """
        if self._num_nodes is None:
            if self.dense:
                row = self.edges.agg(
                    F.greatest(F.max("src"), F.max("dst")).alias("mx")
                ).first()
                self._num_nodes = int(row["mx"]) + 1 if row["mx"] is not None else 0
            else:
                self._num_nodes = self.touched_nodes().count()
        return self._num_nodes

    def num_arcs(self) -> int:
        """m — ``ImmutableGraph.numArcs`` (``ImmutableGraph.java:263``)."""
        return self.edges.count()

    def nodes(self) -> DataFrame:
        """The node-id set as a DataFrame: ``[0, n)`` range when dense,
        distinct endpoints when scattered."""
        if not self.dense:
            return self.touched_nodes()
        spark = self.edges.sparkSession
        return spark.range(self.num_nodes()).select(F.col("id").cast("long"))

    def touched_nodes(self) -> DataFrame:
        """Distinct ids that appear as an endpoint (sparse node set)."""
        if self._touched is None:
            self._touched = (
                self.edges.select(F.col("src").alias("id"))
                .union(self.edges.select(F.col("dst").alias("id")))
                .distinct()
                .localCheckpoint(eager=False)
            )
        return self._touched

    def out_degrees(self, include_zero: bool = False) -> DataFrame:
        """(id, outdeg) — the ``outdegrees()`` stream
        (``ImmutableGraph.java:453-480``) as one aggregation."""
        deg = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("outdeg")
        )
        if include_zero:
            deg = (
                self.nodes()
                .join(deg, "id", "left")
                .select("id", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
            )
        return deg

    def in_degrees(self, include_zero: bool = False) -> DataFrame:
        deg = self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("indeg")
        )
        if include_zero:
            deg = (
                self.nodes()
                .join(deg, "id", "left")
                .select("id", F.coalesce("indeg", F.lit(0)).alias("indeg"))
            )
        return deg

    # ------------------------------------------------------------------
    # CSR adjacency (the BVGraph node-record analogue)
    # ------------------------------------------------------------------
    def adjacency(self, direction: str = "out") -> DataFrame:
        """CSR blocks: (src, dsts sorted+deduped array, outdeg).

        The Spark analogue of a BVGraph node record: successor lists are
        sorted ascending and duplicate-free exactly as the reference
        enforces during batch merge (``Transform.java:848-862``).
        """
        src, dst = ("src", "dst") if direction == "out" else ("dst", "src")
        return self.edges.groupBy(F.col(src).alias("src")).agg(
            F.sort_array(F.collect_set(dst)).alias("dsts"),
            F.size(F.collect_set(dst)).alias("outdeg"),
        )

    def successors(self, node: int) -> list[int]:
        """Random access to one successor list — ``successors(x)``
        (``ImmutableGraph.java:310``).  Point lookup; predicate pushes to
        the parquet scan when the graph was loaded from storage."""
        row = (
            self.edges.filter(F.col("src") == int(node))
            .agg(F.sort_array(F.collect_set("dst")).alias("dsts"))
            .first()
        )
        return list(row["dsts"]) if row and row["dsts"] else []

    def out_degree(self, node: int) -> int:
        """``outdegree(x)`` (``ImmutableGraph.java:341``)."""
        return self.edges.filter(F.col("src") == int(node)).count()

    # ------------------------------------------------------------------
    # equality (the reference's correctness predicate)
    # ------------------------------------------------------------------
    def same_graph(self, other: "Graph") -> bool:
        """Arc-set equality — ``ImmutableGraph.equals``
        (``ImmutableGraph.java:759-779``): same n and identical successor
        lists ⇔ identical deduped arc sets here."""
        a = self.edges.select("src", "dst").distinct()
        b = other.edges.select("src", "dst").distinct()
        return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # ------------------------------------------------------------------
    # storage (BVGraph.store / load analogue)
    # ------------------------------------------------------------------
    def store(self, basename: str, buckets: int = 32) -> None:
        """Persist as a compressed CSR parquet table + metadata sidecar.

        Analogue of ``BVGraph.store`` (``BVGraph.java:1641``): the write
        repartitions by ``src`` range (so each file covers a contiguous,
        min/max-prunable node range — the role of ``.offsets`` +
        Elias–Fano, ``BVGraph.java:306-315``), sorts within partitions,
        and stores *gap-encoded* successor arrays (first element absolute,
        rest deltas−1; ``BVGraph.java:141-223``'s residual coding), which
        parquet's delta/dictionary codecs then compress.  Node/arc counts
        and build parameters go to ``meta.json`` — the ``.properties``
        analogue (``ImmutableGraph.java:162-177``).
        """
        adj = self.adjacency()
        gaps = adj.select(
            "src",
            "outdeg",
            F.concat(
                F.slice("dsts", 1, 1),
                F.zip_with(
                    F.slice("dsts", 2, F.size("dsts") - 1),
                    F.slice("dsts", 1, F.size("dsts") - 1),
                    lambda cur, prev: cur - prev - 1,
                ),
            ).alias("dst_gaps"),
        )
        (
            gaps.repartitionByRange(buckets, "src")
            .sortWithinPartitions("src")
            .write.mode("overwrite")
            .parquet(os.path.join(basename, "adj"))
        )
        n, m = self.num_nodes(), self.num_arcs()
        meta = {
            "format": "wbs-csr-gap-v1",
            "nodes": n,
            "arcs": m,
            "buckets": buckets,
            "graphclass": "webgraph_big_spark.Graph",
        }
        with open(os.path.join(basename, "meta.json"), "w") as fh:
            json.dump(meta, fh)

    @classmethod
    def load(cls, spark: SparkSession, basename: str) -> "Graph":
        """Load a stored graph — ``ImmutableGraph.load`` dispatch
        (``ImmutableGraph.java:674-713``), reading ``meta.json`` instead
        of reflecting on ``.properties``."""
        with open(os.path.join(basename, "meta.json")) as fh:
            meta = json.load(fh)
        gaps = spark.read.parquet(os.path.join(basename, "adj"))
        # decode gaps back to absolute sorted successor arrays, then to arcs
        dsts = F.transform(
            F.aggregate(
                F.slice("dst_gaps", 2, F.size("dst_gaps") - 1),
                F.array(F.element_at("dst_gaps", 1)),
                lambda acc, g: F.concat(
                    acc, F.array(F.element_at(acc, -1) + g + 1)
                ),
            ),
            lambda x: x,
        )
        edges = gaps.filter(F.size("dst_gaps") > 0).select(
            "src", F.explode(dsts).alias("dst")
        )
        return cls(edges, num_nodes=meta["nodes"])

    # convenience -------------------------------------------------------
    def cache(self) -> "Graph":
        self.edges = self.edges.cache()
        return self

    def unpersist(self) -> "Graph":
        self.edges = self.edges.unpersist()
        return self
