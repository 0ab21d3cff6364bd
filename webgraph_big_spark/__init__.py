"""webgraph_big_spark — a PySpark-native link-graph analytics engine.

A from-scratch DataFrame-based engine with the query/data-processing
capabilities of WebGraph-big (vigna/webgraph-big, reference at
/root/reference): graph ingestion from source-code repository tables,
graph transforms (transpose/symmetrize/simplify/filter/union/map/compose),
and whole-graph analytics (PageRank, connected components, label
propagation, triangle counting, BFS, stats, HyperBall-style approximate
neighbourhood function), plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

This is NOT a port: the reference is a single-JVM bit-compressed graph
framework (ImmutableGraph / BVGraph); here every operator is expressed as
declarative Spark DataFrame plans so Catalyst/Tungsten/AQE pick the
physical strategy, with vectorized pandas/Arrow UDFs only where built-in
operators cannot express the semantics (media featurization, import
extraction) — the graph algorithms, including the HyperBall register
merge, are pure JVM expressions.
"""

from webgraph_big_spark.graph import Graph  # noqa: F401

__version__ = "0.1.0"
